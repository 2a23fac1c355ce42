"""Random walk (intrinsic) latent models.

Reference spec: src/latent_models/rw.jl:17-223 — Q = τ·DₖᵀDₖ (k-th order
difference operator), rank n−k, polynomial null-space constraints, diagonal
regularization 1e-5, optional Sørbye & Rue (2014) variance scaling so the
geometric-mean constrained marginal variance is 1.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..constrained import ConstrainedGMRF
from ..gmrf import GMRF
from ..sparse.matrix import SparseMatrix, from_scipy
from ..solvers.base import SolverSpec
from .base import LatentModel, process_constraint, stack_constraints

__all__ = ["RWModel", "RW1Model", "RW2Model", "geomean"]

_RW_SCALE_REG = 1.0e-5


def difference_operator(n: int, order: int):
    """k-th order difference operator D_k of shape (n-k, n)."""
    D = sp.diags([-np.ones(n - 1), np.ones(n - 1)], [0, 1], shape=(n - 1, n))
    for _ in range(1, order):
        m = D.shape[0]
        D1 = sp.diags([-np.ones(m - 1), np.ones(m - 1)], [0, 1], shape=(m - 1, m))
        D = D1 @ D
    return D.tocsr()


def geomean(x):
    return jnp.exp(jnp.mean(jnp.log(x)))


def _rw_nullspace(n: int, order: int):
    """Polynomial null space of DₖᵀDₖ: rows jᵈ, d = 0..k-1
    (reference rw.jl `_rw_nullspace_constraints` — 1-based j)."""
    j = np.arange(1, n + 1, dtype=np.float64)
    return np.stack([j**d for d in range(order)])


class RWModel(LatentModel):
    """Random walk of given order. Hyperparameter: tau."""

    def __init__(
        self,
        n: int,
        order: int = 1,
        regularization: float = 1e-5,
        additional_constraints=None,
        scale_model: bool = False,
        solver=None,
    ):
        if n <= order:
            raise ValueError(f"RW{order} requires n > {order}")
        if additional_constraints == "sumtozero":
            raise ValueError(
                "RWModel already includes null-space constraints; "
                "use additional_constraints only for extras"
            )
        self._n = n
        self.order = order
        self.regularization = float(regularization)
        self.name = f"rw{order}"
        if solver is not None:
            self.solver = solver
        self.additional = process_constraint(additional_constraints, n)
        D = difference_operator(n, order)
        Qbase = (D.T @ D).tocoo()
        self._Qbase = from_scipy(Qbase)
        self._diag_pos = self._Qbase.pattern.diag_positions
        self._A_null = _rw_nullspace(n, order)
        if scale_model:
            self.scale_factor = float(self._compute_scale_factor())
        else:
            self.scale_factor = 1.0

    def _compute_scale_factor(self):
        """Sørbye-Rue: geomean of constrained marginal variances of the
        unscaled intrinsic model (reference rw.jl `_rw_scale_factor`)."""
        data = self._Qbase.data.at[self._diag_pos].add(_RW_SCALE_REG)
        g = GMRF.from_precision(
            jnp.zeros(self._n), self._Qbase.with_data(data), SolverSpec(kind="dense")
        )
        cg = ConstrainedGMRF.create(
            g, jnp.asarray(self._A_null), jnp.zeros(self.order)
        )
        return geomean(cg.var())

    @property
    def n(self):
        return self._n

    @property
    def hyperparameters(self):
        return ("tau",)

    def precision(self, tau) -> SparseMatrix:
        data = self.scale_factor * jnp.asarray(tau) * self._Qbase.data
        data = data.at[self._diag_pos].add(self.regularization)
        return self._Qbase.with_data(data)

    def constraints(self):
        null = (self._A_null, np.zeros(self.order))
        return stack_constraints(null, self.additional)


def RW1Model(n: int, **kw) -> RWModel:
    return RWModel(n, order=1, **kw)


def RW2Model(n: int, **kw) -> RWModel:
    return RWModel(n, order=2, **kw)
