"""Linearly transformed observation models: η = A·x + b.

Reference spec: src/observation_models/linearly_transformed.jl:40-395 —
wraps any base likelihood; grad = Aᵀ g(η), Hessian = Aᵀ·diag(h_η)·A with a
fixed sparsity pattern (the SpGEMM plan AᵀDA is cached per A-pattern, so
the Newton loop stays fully jitted).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..sparse.matrix import SparseMatrix, spdiag
from .base import ObservationLikelihood, ObservationModel

__all__ = ["LinearlyTransformedObservationModel", "LinearlyTransformedLikelihood"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LinearlyTransformedLikelihood(ObservationLikelihood):
    base: Any  # base ObservationLikelihood evaluated at η
    A: Any  # SparseMatrix (m_eta, n) or dense (m_eta, n)
    b: Any  # (m_eta,) offset or None

    conditionally_independent = False  # w.r.t. latent x
    hessian_kind = "sparse"

    @property
    def n(self):
        return self.A.shape[1]

    def _eta(self, x):
        eta = self.A.matvec(x) if isinstance(self.A, SparseMatrix) else self.A @ x
        if self.b is not None:
            eta = eta + self.b
        return eta

    def loglik(self, x):
        return self.base.loglik(self._eta(x))

    def pointwise_loglik(self, x):
        return self.base.pointwise_loglik(self._eta(x))

    def loggrad(self, x):
        g_eta = self.base.loggrad(self._eta(x))
        if isinstance(self.A, SparseMatrix):
            return self.A.rmatvec(g_eta)
        return self.A.T @ g_eta

    def loghessian(self, x) -> SparseMatrix:
        h_eta = self.base.loghessian_diag(self._eta(x))
        if isinstance(self.A, SparseMatrix):
            # Aᵀ D A with cached symbolic plan — fixed output pattern
            return self.A.T @ (spdiag(h_eta) @ self.A)
        H = self.A.T @ (h_eta[:, None] * self.A)
        from ..sparse.matrix import from_dense
        from ..sparse.pattern import SparsePattern
        import numpy as np

        n = H.shape[0]
        rows, cols = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        pat = SparsePattern(rows.ravel(), cols.ravel(), (n, n))
        return SparseMatrix(H.ravel(), pat)

    def loghessian_diag(self, x):
        raise NotImplementedError("LT Hessian is not diagonal; use loghessian")


class LinearlyTransformedObservationModel(ObservationModel):
    """Wrap a base ObservationModel with η = A·x + b."""

    def __init__(self, base_model: ObservationModel, A, b=None):
        self.base_model = base_model
        self.A = A
        self.b = None if b is None else jnp.asarray(b)

    @property
    def hyperparameters(self):
        return getattr(self.base_model, "hyperparameters", ())

    def __call__(self, y, **theta) -> LinearlyTransformedLikelihood:
        base = self.base_model(y, **theta)
        return LinearlyTransformedLikelihood(base=base, A=self.A, b=self.b)
