"""Observation model / likelihood protocol.

Factory pattern mirroring the reference (src/observation_models/
observation_model.jl:28, observation_likelihood.jl:33-230): an
`ObservationModel` is configuration; calling it with data y (+ hyperparams θ)
materializes an `ObservationLikelihood` with the x-only hot-loop API
`loglik / loggrad / loghessian`. Likelihoods are JAX pytrees so they can be
built inside `jit` with traced hyperparameters.

Hessian contract: `hessian_kind` is a static string —
  "diag"   → `loghessian_diag(x)` returns the (n,) diagonal (exponential
             families under any link; conditional independence)
  "sparse" → `loghessian(x)` returns a fixed-pattern SparseMatrix
             (linearly-transformed models: Aᵀ·diag·A)
Both shapes are fixed at trace time, preserving the static-pattern contract
of the Newton loop.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["ObservationModel", "ObservationLikelihood"]


class ObservationModel:
    """Factory: obs_model(y, **theta) -> ObservationLikelihood."""

    def __call__(self, y, **theta):
        raise NotImplementedError


class ObservationLikelihood:
    """Materialized likelihood; x-only API. Subclasses are pytrees."""

    conditionally_independent: bool = True
    hessian_kind: str = "diag"

    def loglik(self, x) -> jnp.ndarray:
        raise NotImplementedError

    def loggrad(self, x) -> jnp.ndarray:
        raise NotImplementedError

    def loghessian_diag(self, x) -> jnp.ndarray:
        raise NotImplementedError

    def loghessian(self, x):
        from ..sparse.matrix import spdiag

        return spdiag(self.loghessian_diag(x))

    def pointwise_loglik(self, x) -> jnp.ndarray:
        """Per-observation log-likelihoods (for WAIC/LOO/CPO). Only defined
        for conditionally independent likelihoods."""
        raise NotImplementedError
