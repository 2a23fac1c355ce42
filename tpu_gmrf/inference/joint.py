"""Joint GMRF of x₁ and x₂ = A·x₁ + b + ε.

Reference spec: src/arithmetic/joint.jl:24-40 — 2×2 block precision
[[Q₁ + AᵀQ_εA, −AᵀQ_ε], [−Q_εA, Q_ε]].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..gmrf import GMRF
from ..solvers.base import SolverSpec
from ..sparse.matrix import SparseMatrix
from ..sparse.pattern import SparsePattern
from .linear_condition import _qeps_as_operator

__all__ = ["joint_gmrf", "sp_bmat"]


def _shifted_entries(M: SparseMatrix, r0: int, c0: int):
    return (
        M.pattern.rows.astype(np.int64) + r0,
        M.pattern.cols.astype(np.int64) + c0,
        M.data,
    )


def sp_bmat(blocks) -> SparseMatrix:
    """Assemble a sparse matrix from a grid of optional SparseMatrix blocks
    (entries across blocks must not collide)."""
    row_sizes = [next(b for b in row if b is not None).shape[0] for row in blocks]
    col_sizes = []
    ncols = len(blocks[0])
    for j in range(ncols):
        col_sizes.append(
            next(row[j] for row in blocks if row[j] is not None).shape[1]
        )
    r_off = np.concatenate([[0], np.cumsum(row_sizes)])
    c_off = np.concatenate([[0], np.cumsum(col_sizes)])
    rows, cols, datas = [], [], []
    for i, row in enumerate(blocks):
        for j, b in enumerate(row):
            if b is None:
                continue
            r, c, d = _shifted_entries(b, int(r_off[i]), int(c_off[j]))
            rows.append(r)
            cols.append(c)
            datas.append(d)
    pat = SparsePattern(
        np.concatenate(rows), np.concatenate(cols), (int(r_off[-1]), int(c_off[-1]))
    )
    data = jnp.concatenate(datas, axis=-1)[..., pat.sort_order]
    return SparseMatrix(data, pat)


def joint_gmrf(x1: GMRF, A, Q_eps, b=None, solver: SolverSpec | None = None) -> GMRF:
    if not isinstance(A, SparseMatrix):
        from ..sparse.matrix import from_dense

        A = from_dense(jnp.asarray(A))
    m = A.shape[0]
    Qe = _qeps_as_operator(Q_eps, m)
    QeA = Qe @ A
    Q11 = x1.Q + (A.T @ QeA)
    Q21 = QeA * -1.0
    Q_joint = sp_bmat([[Q11, Q21.T], [Q21, Qe]])
    mu2 = A.matvec(x1.mean)
    if b is not None:
        mu2 = mu2 + b
    mu = jnp.concatenate([x1.mean, mu2])
    return GMRF.from_precision(
        mu, Q_joint.symmetrize(), solver if solver is not None else x1.solver
    )
