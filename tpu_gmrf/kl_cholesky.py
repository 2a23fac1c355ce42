"""KL-minimizing sparse approximate Cholesky of a covariance operator
(Schäfer, Katzfuss & Owhadi 2021).

Reference spec: src/kl_cholesky/ — reverse-maximin ordering + ℓ-ball
sparsity pattern + per-column local dense solves of Θ[S,S] with 1e-6·I
jitter (kl_cholesky.jl:31-58; column = U⁻¹e_last with the neighbor set
ordered diagonal-last).

TPU-native: columns are bucketed by (padded) neighborhood size and each
bucket's local solves run as one batched dense Cholesky + triangular solve
on the MXU (the reference's per-column loop, vmapped). Padding prepends
decoupled identity rows so padded solves are exact.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .gmrf import GMRF
from .solvers.base import SolverSpec
from .sparse.matrix import SparseMatrix
from .sparse.pattern import SparsePattern

__all__ = [
    "reverse_maximin_ordering",
    "sparsity_pattern_from_ordering",
    "sparse_approximate_cholesky",
    "approximate_gmrf_kl",
]


def reverse_maximin_ordering(X: np.ndarray):
    """Fine-to-coarse ordering (Schäfer et al.): the LAST point is coarsest
    (ℓ=∞ at the end); ℓ increases along the ordering. Built by greedy
    maximin selection from the coarse end, then reversed — so each column k
    of the precision factor conditions on the coarser points after it (the
    screening effect that makes L approximately sparse).
    Returns (order, lengthscales ℓ in order position)."""
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    # start from the point farthest from the centroid
    i0 = int(np.argmax(np.linalg.norm(X - X.mean(axis=0), axis=1)))
    order = np.empty(n, dtype=np.int64)
    ell = np.empty(n)
    order[0] = i0
    ell[0] = np.inf
    d = np.linalg.norm(X - X[i0], axis=1)
    d[i0] = -np.inf
    for k in range(1, n):
        i = int(np.argmax(d))
        order[k] = i
        ell[k] = d[i]
        d = np.minimum(d, np.linalg.norm(X - X[i], axis=1))
        d[i] = -np.inf
    return order[::-1].copy(), ell[::-1].copy()


def sparsity_pattern_from_ordering(X, order, ell, rho: float):
    """Lower-triangular pattern in ORDERED indices: column k has rows
    {m ≥ k : dist(x_{order[m]}, x_{order[k]}) ≤ ρ·ℓ_k}."""
    from scipy.spatial import cKDTree

    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    pos = np.empty(n, dtype=np.int64)
    pos[order] = np.arange(n)
    tree = cKDTree(X)
    rows, cols = [], []
    for k in range(n):
        xi = X[order[k]]
        r = rho * ell[k] if np.isfinite(ell[k]) else np.inf
        if np.isinf(r):
            nbrs = np.arange(n)
        else:
            nbrs = np.asarray(tree.query_ball_point(xi, r), dtype=np.int64)
        m = pos[nbrs]
        m = m[m >= k]
        rows.append(m)
        cols.append(np.full(len(m), k, dtype=np.int64))
    return SparsePattern(np.concatenate(rows), np.concatenate(cols), (n, n))


def sparse_approximate_cholesky(points, cov_fn, pattern: SparsePattern, order, jitter: float = 1e-6):
    """Fill L (on `pattern`, ordered indices) with the KL-optimal values:
    per column k, with S = rows(col k) ordered descending (diagonal last),
    L[S, k] = U⁻¹ e_last for Θ[S,S]+jitter·I = UᵀU. Batched by bucket."""
    X = jnp.asarray(np.asarray(points, dtype=np.float64)[np.asarray(order)])
    n = pattern.shape[0]
    colptr, row_in_col, perm_entries = pattern.csc
    # bucket columns by neighborhood size (padded to powers of two-ish)
    sizes = np.diff(colptr)
    buckets: dict = {}
    for k in range(n):
        Ns = int(sizes[k])
        cap = 1 << max(Ns - 1, 0).bit_length()  # next power of 2
        buckets.setdefault(cap, []).append(k)

    data = jnp.zeros(pattern.nnz)
    for cap, cols in buckets.items():
        B = len(cols)
        S_idx = np.zeros((B, cap), dtype=np.int64)  # ordered point indices
        entry_pos = np.full((B, cap), -1, dtype=np.int64)
        valid = np.zeros((B, cap), dtype=bool)
        for b, k in enumerate(cols):
            s, e = int(colptr[k]), int(colptr[k + 1])
            rows_k = row_in_col[s:e]  # ascending; diagonal k first
            entries = perm_entries[s:e]
            # descending rows → diagonal last; pad at FRONT with decoupled ids
            desc = np.argsort(-rows_k)
            Ns = e - s
            S_idx[b, cap - Ns :] = rows_k[desc]
            entry_pos[b, cap - Ns :] = entries[desc]
            valid[b, cap - Ns :] = True
        pts = X[jnp.asarray(S_idx)]  # (B, cap, d)
        theta = cov_fn(pts, pts)  # (B, cap, cap)
        mask = jnp.asarray(valid)
        pairmask = mask[:, :, None] & mask[:, None, :]
        eye = jnp.eye(cap)
        theta = jnp.where(pairmask, theta, 0.0) + (jitter) * eye
        # decoupled identity rows on padding
        theta = theta + jnp.where(~mask, 1.0, 0.0)[:, :, None] * eye
        U = jnp.linalg.cholesky(theta.transpose(0, 2, 1)).transpose(0, 2, 1)  # upper
        e_last = jnp.zeros((B, cap)).at[:, -1].set(1.0)
        x = jax.vmap(
            lambda Ub, eb: jax.scipy.linalg.solve_triangular(Ub, eb, lower=False)
        )(U, e_last)
        flat_pos = jnp.asarray(entry_pos.ravel())
        flat_val = x.ravel()
        keep = flat_pos >= 0
        data = data.at[jnp.where(keep, flat_pos, 0)].add(
            jnp.where(keep, flat_val, 0.0)
        )
    return SparseMatrix(data, pattern)


def approximate_gmrf_kl(
    points,
    cov_fn,
    rho: float = 3.0,
    mean=None,
    solver: SolverSpec = SolverSpec(),
    jitter: float = 1e-6,
):
    """GMRF approximating the Gaussian process with covariance `cov_fn` at
    `points`: Q = P (L Lᵀ) Pᵀ ≈ Θ⁻¹ with KL-optimal sparse L.

    cov_fn(A, B) must broadcast over leading batch dims of point arrays
    ((..., d), (..., d)) → (..., ) pairwise: called as cov_fn(pts[:, :, None, :],
    pts[:, None, :, :]) internally via a Gram convention: here we call it as
    cov_fn(P1, P2) with P1 (B, m, d), P2 (B, m, d) expecting (B, m, m)."""
    X = np.asarray(points, dtype=np.float64)
    n = X.shape[0]
    order, ell = reverse_maximin_ordering(X)
    pattern = sparsity_pattern_from_ordering(X, order, ell, rho)
    L = sparse_approximate_cholesky(points, cov_fn, pattern, order, jitter)
    Q_ord = L @ L.T
    # map back to original point indexing
    rows = np.asarray(order)[Q_ord.pattern.rows]
    cols = np.asarray(order)[Q_ord.pattern.cols]
    pat = SparsePattern(rows, cols, (n, n))
    Q = SparseMatrix(Q_ord.data[pat.sort_order], pat)
    mu = jnp.zeros(n) if mean is None else jnp.asarray(mean)
    return GMRF.from_precision(mu, Q, solver)


def gram(kernel):
    """Lift a pairwise kernel k(x, y) -> scalar into the batched Gram-matrix
    convention cov_fn(P1 (B,m,d), P2 (B,m,d)) -> (B,m,m)."""

    def cov_fn(P1, P2):
        return jax.vmap(
            lambda A, Bm: jax.vmap(
                lambda a: jax.vmap(lambda b: kernel(a, b))(Bm)
            )(A)
        )(P1, P2)

    return cov_fn
