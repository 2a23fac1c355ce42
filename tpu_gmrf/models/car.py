"""Conditional autoregressive (CAR) model.

Reference: src/autoregressive/car.jl:31-42 — Q = (D − ρW)/σ from an
adjacency/weight matrix, 0 ≤ ρ < 1.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..gmrf import GMRF
from ..sparse.matrix import SparseMatrix, from_scipy
from ..solvers.base import SolverSpec
from .base import LatentModel

__all__ = ["CARModel", "generate_car_model"]


class CARModel(LatentModel):
    """Proper CAR. Hyperparameters: rho (0 ≤ rho < 1), sigma (scale)."""

    name = "car"

    def __init__(self, W, solver=None):
        W = sp.csr_matrix(W).astype(np.float64)
        n = W.shape[0]
        deg = np.asarray(W.sum(axis=1)).ravel()
        # fixed pattern = union of D and W entries
        D_mat = sp.diags(deg)
        pattern_mat = (D_mat + W).tocoo()
        self._pat_mat = from_scipy(pattern_mat)
        self._D = from_scipy(sp.coo_matrix(D_mat)).pad_to(self._pat_mat.pattern)
        self._W = from_scipy(sp.coo_matrix(W)).pad_to(self._pat_mat.pattern)
        self._n = n
        if solver is not None:
            self.solver = solver

    @property
    def n(self):
        return self._n

    @property
    def hyperparameters(self):
        return ("rho", "sigma")

    def precision(self, rho, sigma=1.0) -> SparseMatrix:
        rho = jnp.asarray(rho)
        sigma = jnp.asarray(sigma)
        data = (self._D.data - rho * self._W.data) / sigma
        return self._D.with_data(data)


def generate_car_model(W, rho, sigma=1.0, mu=None, solver=SolverSpec()) -> GMRF:
    """Materialize a CAR GMRF directly (reference car.jl API)."""
    model = CARModel(W)
    Q = model.precision(rho=rho, sigma=sigma)
    if mu is None:
        mu = jnp.zeros(model.n)
    return GMRF.from_precision(jnp.asarray(mu), Q, solver)
