"""Rao-Blackwellized Monte Carlo marginal-variance estimators (Sidén 2018).

Reference spec: src/solvers/rbmc.jl — fallback variance path when selected
inversion is unavailable/too expensive:
  var_i ≈ 1/Q_ii + Var_s[ (Q_ii)⁻¹ · (Q x_s − Q_ii x_s)_i ]
with centered posterior samples x_s. TPU-native: the samples are one batched
backward-solve; the Rao-Blackwellization is a sparse matvec batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rbmc_var", "block_rbmc_var"]


def rbmc_var(gmrf, key, n_samples: int = 1000) -> jnp.ndarray:
    from ..kernels import hot_matvec

    Q = gmrf.Q
    D = Q.diagonal()
    Dinv = 1.0 / D
    xs = gmrf.sample(key, (n_samples,)) - gmrf.mean  # (S, n)
    Qx = hot_matvec(Q)(xs.T).T  # one (n, S) mat-mat — Pallas BSR on TPU
    transformed = Dinv * (Qx - D * xs)
    return Dinv + jnp.var(transformed, axis=0, ddof=1)


_BLOCK_PLAN_CACHE: dict = {}


def _block_rbmc_plan(pattern, enclosure_size: int):
    """Host plan for block RBMC (reference src/solvers/rbmc.jl:52-160):
    greedy disjoint neighborhood subsets, each grown by `enclosure_size`
    rings of neighbors, padded to one uniform width so the device work is a
    single batched dense Cholesky + solve. Returns
    (blk_idx (b,B), interior_mask (b,B), entry_pos (b,B,B) into data+dummy)."""
    key = (pattern, enclosure_size)
    plan = _BLOCK_PLAN_CACHE.get(key)
    if plan is not None:
        return plan
    import scipy.sparse as sp

    n = pattern.shape[0]
    S = pattern.to_scipy_bool().tocsr()
    S = ((S + S.T) > 0).tocsr()
    # position lookup: value = flat index into Q.data + 1 (0 = missing)
    M = sp.csr_matrix(
        (np.arange(1, pattern.nnz + 1, dtype=np.int64), (pattern.rows, pattern.cols)),
        shape=pattern.shape,
    )
    visited = np.zeros(n, bool)
    blocks = []
    for i in range(n):
        if visited[i]:
            continue
        interior = S.indices[S.indptr[i] : S.indptr[i + 1]]
        interior = interior[~visited[interior]]
        if i not in interior:
            interior = np.append(interior, i)
        visited[interior] = True
        explored = set(interior.tolist())
        ring = interior
        enclosure = []
        for _ in range(enclosure_size):
            neigh = np.unique(np.concatenate([S.indices[S.indptr[j] : S.indptr[j + 1]] for j in ring]))
            ring = np.array([j for j in neigh if j not in explored], dtype=np.int64)
            explored |= set(ring.tolist())
            enclosure.append(ring)
        blocks.append((interior.astype(np.int64), np.concatenate(enclosure) if enclosure else np.zeros(0, np.int64)))
    B = max(len(i) + len(e) for i, e in blocks)
    nb = len(blocks)
    blk_idx = np.zeros((nb, B), np.int64)
    interior_mask = np.zeros((nb, B), bool)
    pad_mask = np.zeros((nb, B), bool)
    for bi, (interior, enc) in enumerate(blocks):
        ids = np.concatenate([interior, enc])
        k = len(ids)
        blk_idx[bi, :k] = ids
        interior_mask[bi, : len(interior)] = True
        pad_mask[bi, k:] = True
    # dense block gather positions
    entry_pos = np.zeros((nb, B, B), np.int64)
    for bi in range(nb):
        sub = M[blk_idx[bi]][:, blk_idx[bi]].toarray()
        entry_pos[bi] = sub  # 0 = structurally missing → dummy slot
    plan = (blk_idx, interior_mask, pad_mask, entry_pos)
    _BLOCK_PLAN_CACHE[key] = plan
    return plan


def block_rbmc_var(gmrf, key, n_samples: int = 100, enclosure_size: int = 1) -> jnp.ndarray:
    """Block Rao-Blackwellized MC variances (Sidén 2018 block variant;
    reference src/solvers/rbmc.jl:109-160 `var(gmrf, BlockRBMCStrategy)`):
    exact selected-inverse diagonals of padded dense blocks + the MC
    correction from the block exterior, batched over blocks on the MXU."""
    from .base import mxu_f32

    Q = gmrf.Q
    blk_idx, interior_mask, pad_mask, entry_pos = _block_rbmc_plan(
        Q.pattern, enclosure_size
    )
    nb, B = blk_idx.shape
    data = jnp.concatenate([jnp.zeros((1,), gmrf.Q.data.dtype), Q.data])
    Qb = data[jnp.asarray(entry_pos)]  # (nb, B, B)
    # padded slots alias node 0 (blk_idx zero-fill): zero their rows/cols and
    # give them a unit diagonal so the batched Cholesky stays well-posed
    valid = jnp.asarray(~pad_mask, Qb.dtype)  # (nb, B)
    Qb = Qb * valid[:, :, None] * valid[:, None, :]
    Qb = Qb + jax.vmap(jnp.diag)(jnp.asarray(pad_mask, Qb.dtype))

    @mxu_f32
    def _run(Qb, xs, Qx):
        L = jnp.linalg.cholesky(Qb)  # (nb, B, B)
        eye = jnp.broadcast_to(jnp.eye(B, dtype=Qb.dtype), Qb.shape)
        Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        inv_diag = jnp.einsum("bkj,bkj->bj", Linv, Linv)  # diag of Qb⁻¹
        xb = xs[:, blk_idx] * valid  # (S, nb, B)
        rhs = (Qx[:, blk_idx] - jnp.einsum("bij,sbj->sbi", Qb, xb)) * valid
        kappa = jax.scipy.linalg.cho_solve(
            (L, True), jnp.moveaxis(rhs, 0, -1)  # (nb, B, S)
        )
        return inv_diag + jnp.var(kappa, axis=-1, ddof=1)

    xs = gmrf.sample(key, (n_samples,)) - gmrf.mean  # (S, n)
    Qx = jax.vmap(Q.matvec)(xs)
    est_b = _run(Qb, xs, Qx)  # (nb, B)
    out = jnp.zeros(Q.shape[0], est_b.dtype)
    sel = jnp.asarray(blk_idx[interior_mask])
    return out.at[sel].set(est_b[jnp.asarray(interior_mask)])
