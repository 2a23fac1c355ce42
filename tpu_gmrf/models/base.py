"""Latent model protocol.

A `LatentModel` is a *static* (host-side) object: its symbolic structure
(patterns, constraint matrices, normalization constants) is fixed at
construction; `precision(**theta)` / `mean(**theta)` are pure jittable maps
from hyperparameter values to fixed-pattern numeric data. Materialization
`model(**theta)` returns a `GMRF` (or `ConstrainedGMRF` when the model has
constraints) — the analogue of the reference's generic `(model)(; θ...)`
(reference: src/latent_models/latent_model.jl:23-133).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constrained import ConstrainedGMRF
from ..gmrf import GMRF
from ..solvers.base import SolverSpec

__all__ = ["LatentModel", "process_constraint"]


class LatentModel:
    """Base class. Subclasses define `n`, `name`, `hyperparameters`,
    `precision`, and optionally `mean` / `constraints`."""

    name: str = "latent"
    solver: SolverSpec = SolverSpec()

    def __len__(self):
        return self.n

    @property
    def n(self) -> int:
        raise NotImplementedError

    @property
    def hyperparameters(self) -> tuple:
        """Hyperparameter names, in canonical order."""
        return ()

    def precision(self, **theta):
        raise NotImplementedError

    def mean(self, **theta):
        return jnp.zeros(self.n)

    def constraints(self):
        """Returns (A (m,n) ndarray, e (m,) ndarray) or None. θ-independent."""
        return None

    def _materialize(self, **theta):
        Q = self.precision(**theta)
        mu = self.mean(**theta)
        base = GMRF.from_precision(mu, Q, self.solver)
        cons = self.constraints()
        if cons is None:
            return base
        A, e = cons
        return ConstrainedGMRF.create(base, jnp.asarray(A), jnp.asarray(e))

    def __call__(self, **theta):
        # One jitted map θ ↦ GMRF per (instance, hyperparameter-name set):
        # eagerly evaluating assembly + factorization op-by-op costs dozens of
        # separate XLA compiles (~0.5 s each); a single traced program compiles
        # once and is cached. Under an outer jit this inlines.
        import jax

        names = tuple(sorted(theta.keys()))
        cache = self.__dict__.setdefault("_call_jit_cache", {})
        fn = cache.get(names)
        if fn is None:
            fn = jax.jit(lambda th: self._materialize(**th))
            cache[names] = fn
        return fn({k: jnp.asarray(v) for k, v in theta.items()})

    def __repr__(self):
        hp = ", ".join(self.hyperparameters)
        return f"{type(self).__name__}(n={self.n}, hyperparameters=[{hp}])"


def process_constraint(constraint, n: int):
    """Normalize a user constraint spec: None | 'sumtozero' | (A, e)
    (reference: src/latent_models/utils.jl `_process_constraint`)."""
    if constraint is None:
        return None
    if constraint == "sumtozero":
        return np.ones((1, n)), np.zeros(1)
    A, e = constraint
    A = np.atleast_2d(np.asarray(A, dtype=np.float64))
    e = np.atleast_1d(np.asarray(e, dtype=np.float64))
    if A.shape != (e.shape[0], n):
        raise ValueError(f"constraint A{A.shape} / e{e.shape} incompatible with n={n}")
    return A, e


def stack_constraints(*specs):
    """Stack optional (A, e) pairs; returns None if all None."""
    present = [s for s in specs if s is not None]
    if not present:
        return None
    A = np.vstack([np.atleast_2d(s[0]) for s in present])
    e = np.concatenate([np.atleast_1d(s[1]) for s in present])
    return A, e
