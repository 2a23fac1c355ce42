"""BSR (block-sparse-row) matvec/matmat via blocked XLA einsums.

The hot multiply for CG solves, quadratic forms (`sqmahal`), and linear
predictors on large meshes (reference hot-loop rank #6, SURVEY §3.5;
the reference leans on SparseArrays CSC matvec inside CHOLMOD-adjacent
code paths). TPU-native design:

- the pattern is blocked host-side into bs×bs dense blocks, so every FLOP
  is a dense (bs,bs)@(bs,k) MXU contraction — no scalar gathers on device;
- execution is the batched-einsum + segment-sum XLA formulation
  (`_spmv_reference`), which doubles as the CPU path and the adjoint
  implementation; `bsr_spmv` carries a custom VJP (cotangents:
  dX = Aᵀg via the transposed plan, ddata[b] = g_rowblock ⊗ x_colblock).

A hand-written Pallas DMA kernel for this op was built, measured, and
REMOVED in round 4: it is only legal when bs fills whole (8, 128) f32
memref tiles (Mosaic rejects sub-tile HBM slices — verified on v5e), a
block size the dispatch cost model essentially never picks, and at
bs=128 it streamed 11 GB/s vs ~400 GB/s for the dense block-tridiagonal
einsum path `kernels.hot_matvec` prefers. Carrying a near-unreachable
kernel is maintenance weight without capability; the honest einsum paths
stay. (Pallas remains the right tool for a future fused supernodal panel
kernel, where XLA's per-op scheduling is the bottleneck.)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.matrix import SparseMatrix
from ..sparse.pattern import SparsePattern

__all__ = ["BSRMatrix", "bsr_from_sparse", "bsr_spmv"]


# --------------------------------------------------------------------------
# Host-side blocking (symbolic, once per pattern)
# --------------------------------------------------------------------------

_BSR_PLAN_CACHE: dict = {}


@dataclasses.dataclass(eq=False)  # identity hash: plans are cached & reused
class _BSRPlan:
    n: int  # logical dimension
    bs: int  # block size
    nb: int  # number of block rows/cols (padded)
    block_rows: np.ndarray  # (nblocks,) int32, sorted
    block_cols: np.ndarray  # (nblocks,) int32
    rowptr: np.ndarray  # (nb+1,) int32
    scatter_block: np.ndarray  # (nnz,) block id of each COO entry
    scatter_i: np.ndarray  # (nnz,) in-block row
    scatter_j: np.ndarray  # (nnz,) in-block col
    t_perm: np.ndarray  # (nblocks,) permutation: transpose block order
    transpose: Any = None  # _BSRPlan of Aᵀ (set once at build)

    @property
    def nblocks(self):
        return int(self.block_rows.shape[0])


def _bsr_plan(pattern: SparsePattern, bs: int) -> _BSRPlan:
    key = (pattern, bs)
    hit = _BSR_PLAN_CACHE.get(key)
    if hit is not None:
        return hit
    n = pattern.shape[0]
    nb = -(-n // bs)
    br = pattern.rows // bs
    bc = pattern.cols // bs
    bid_raw = br.astype(np.int64) * nb + bc
    uniq, inv = np.unique(bid_raw, return_inverse=True)
    block_rows = (uniq // nb).astype(np.int32)
    block_cols = (uniq % nb).astype(np.int32)
    rowptr = np.zeros(nb + 1, dtype=np.int32)
    np.add.at(rowptr, block_rows + 1, 1)
    rowptr = np.cumsum(rowptr, dtype=np.int32)
    # transpose plan: blocks sorted by (col, row)
    t_order = np.lexsort((block_rows, block_cols)).astype(np.int32)
    t_rowptr = np.zeros(nb + 1, dtype=np.int32)
    np.add.at(t_rowptr, block_cols + 1, 1)
    t_rowptr = np.cumsum(t_rowptr, dtype=np.int32)
    empty = np.zeros(0, dtype=np.int32)
    plan = _BSRPlan(
        n=n,
        bs=bs,
        nb=nb,
        block_rows=block_rows,
        block_cols=block_cols,
        rowptr=rowptr,
        scatter_block=inv.astype(np.int32),
        scatter_i=(pattern.rows % bs).astype(np.int32),
        scatter_j=(pattern.cols % bs).astype(np.int32),
        t_perm=t_order,
    )
    plan.transpose = _BSRPlan(
        n=n,
        bs=bs,
        nb=nb,
        block_rows=block_cols[t_order],
        block_cols=block_rows[t_order],
        rowptr=t_rowptr,
        scatter_block=empty,
        scatter_i=empty,
        scatter_j=empty,
        t_perm=np.argsort(t_order).astype(np.int32),
        transpose=plan,
    )
    _BSR_PLAN_CACHE[key] = plan
    return plan


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSRMatrix:
    """Blocked view of a fixed-pattern sparse matrix."""

    blocks: Any  # (nblocks, bs, bs)
    plan: _BSRPlan = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return (self.plan.n, self.plan.n)

    def matvec(self, x):
        squeeze = x.ndim == 1
        xk = x[:, None] if squeeze else x
        y = bsr_spmv(self.blocks, xk, self.plan)
        return y[:, 0] if squeeze else y

    def __matmul__(self, x):
        return self.matvec(x)


def bsr_from_sparse(A: SparseMatrix, bs: int | None = None) -> BSRMatrix:
    """Block a SparseMatrix into BSR. Symbolic work cached per (pattern, bs);
    the numeric conversion is one scatter (jittable, differentiable).
    bs=None picks the block size minimizing padded bytes (`best_block_size`)."""
    if bs is None:
        bs = best_block_size(A.pattern)
    plan = _bsr_plan(A.pattern, bs)
    blocks = jnp.zeros((max(plan.nblocks, 1), bs, bs), A.data.dtype)
    blocks = blocks.at[plan.scatter_block, plan.scatter_i, plan.scatter_j].set(A.data)
    return BSRMatrix(blocks, plan)


_BS_CACHE: dict = {}


def best_block_size(pattern: SparsePattern, candidates=(8, 16, 32)) -> int:
    """Smallest padded-footprint block size: spmv is HBM-bandwidth-bound, so
    minimize nblocks·bs² (the bytes the kernel streams). GMRF patterns are
    scattered (≈7 nnz/row), so small blocks win; candidates stay multiples
    of the f32 sublane (8)."""
    hit = _BS_CACHE.get(pattern)
    if hit is not None:
        return hit
    best, best_cost = candidates[0], None
    for bs in candidates:
        br = pattern.rows // bs
        bc = pattern.cols // bs
        nb = -(-pattern.shape[0] // bs)
        nblocks = len(np.unique(br.astype(np.int64) * nb + bc))
        cost = nblocks * bs * bs
        if best_cost is None or cost < best_cost:
            best, best_cost = bs, cost
    _BS_CACHE[pattern] = best
    return best


# --------------------------------------------------------------------------
# Reference XLA path (CPU fallback + adjoint building block)
# --------------------------------------------------------------------------


def _spmv_reference(blocks, x_pad, plan: _BSRPlan):
    """(nblocks,bs,bs) × (nb*bs, k) → (nb*bs, k): batched MXU einsum +
    segment-sum over block rows."""
    bs = plan.bs
    xg = x_pad.reshape(plan.nb, bs, -1)[plan.block_cols]  # (nblocks, bs, k)
    prod = jnp.einsum("bij,bjk->bik", blocks, xg, preferred_element_type=x_pad.dtype)
    y = jax.ops.segment_sum(prod, plan.block_rows, num_segments=plan.nb)
    return y.reshape(plan.nb * bs, -1)


# --------------------------------------------------------------------------
# Entry point with custom VJP
# --------------------------------------------------------------------------


def _spmv_impl(blocks, x, plan: _BSRPlan):
    n, k = x.shape
    n_pad = plan.nb * plan.bs
    x_pad = jnp.pad(x, ((0, n_pad - n), (0, 0))) if n_pad != n else x
    y = _spmv_reference(blocks, x_pad, plan)
    return y[:n]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def bsr_spmv(blocks, x, plan):
    """y = A x for BSR blocks; x (n, k) → y (n, k)."""
    return _spmv_impl(blocks, x, plan)


def _spmv_fwd(blocks, x, plan):
    return _spmv_impl(blocks, x, plan), (blocks, x)


def _spmv_bwd(plan, res, g):
    blocks, x = res
    # dX = Aᵀ g — run the transposed plan over permuted, transposed blocks.
    t_blocks = jnp.swapaxes(blocks[plan.t_perm], -1, -2)
    dx = _spmv_impl(t_blocks, g, plan.transpose)
    # dBlocks[b] = g_rowblock(b) @ x_colblock(b)ᵀ — batched outer products.
    bs = plan.bs
    n, k = x.shape
    n_pad = plan.nb * bs
    g_pad = jnp.pad(g, ((0, n_pad - n), (0, 0))) if n_pad != n else g
    x_pad = jnp.pad(x, ((0, n_pad - n), (0, 0))) if n_pad != n else x
    gb = g_pad.reshape(plan.nb, bs, k)[plan.block_rows]
    xb = x_pad.reshape(plan.nb, bs, k)[plan.block_cols]
    dblocks = jnp.einsum("bik,bjk->bij", gb, xb, preferred_element_type=blocks.dtype)
    return dblocks, dx


bsr_spmv.defvjp(_spmv_fwd, _spmv_bwd)
