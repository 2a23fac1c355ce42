"""IID and fixed-effects latent models.

Reference: src/latent_models/iid.jl (Q = τI, optional sum-to-zero),
src/latent_models/fixed_effects.jl (ridge Q = λI, λ = 1e-6 default, no
hyperparameters).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..sparse.matrix import SparseMatrix, spdiag
from .base import LatentModel, process_constraint

__all__ = ["IIDModel", "FixedEffectsModel"]


class IIDModel(LatentModel):
    name = "iid"

    def __init__(self, n: int, constraint=None, levels=None, solver=None):
        if n <= 0:
            raise ValueError("n must be positive")
        self._n = n
        self.levels = levels
        self.constraint = process_constraint(constraint, n)
        if solver is not None:
            self.solver = solver

    @property
    def n(self):
        return self._n

    @property
    def hyperparameters(self):
        return ("tau",)

    def precision(self, tau) -> SparseMatrix:
        return spdiag(jnp.full((self._n,), 1.0) * jnp.asarray(tau))

    def constraints(self):
        return self.constraint


class FixedEffectsModel(LatentModel):
    name = "fixed"

    def __init__(self, n: int, lam: float = 1e-6, constraint=None, solver=None):
        if n < 0:
            raise ValueError("n must be nonnegative")
        if lam <= 0:
            raise ValueError("lam must be positive")
        self._n = n
        self.lam = float(lam)
        self.constraint = process_constraint(constraint, n)
        if solver is not None:
            self.solver = solver

    @property
    def n(self):
        return self._n

    @property
    def hyperparameters(self):
        return ()

    def precision(self, **_) -> SparseMatrix:
        return spdiag(jnp.full((self._n,), self.lam))

    def constraints(self):
        return self.constraint
