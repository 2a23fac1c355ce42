"""Fixed-pattern sparse matrices as JAX pytrees.

`SparseMatrix` carries a traced `data` vector over a static `SparsePattern`.
All structure-dependent logic specializes at trace time; all numeric ops are
gathers / segment-sums / scatters that XLA fuses well on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .pattern import SparsePattern, spgemm_pattern, union_patterns

__all__ = ["SparseMatrix", "from_dense", "from_scipy", "speye", "spdiag", "sp_block_diag", "sp_kron"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseMatrix:
    """COO (canonically sorted) sparse matrix; `pattern` is static."""

    data: Any  # (nnz,) or (*batch, nnz) jnp array
    pattern: SparsePattern = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return self.pattern.shape

    @property
    def nnz(self):
        return self.pattern.nnz

    @property
    def dtype(self):
        return self.data.dtype

    # ---- conversion --------------------------------------------------------

    def todense(self) -> jnp.ndarray:
        out = jnp.zeros(self.shape, dtype=self.data.dtype)
        return out.at[self.pattern.rows, self.pattern.cols].add(self.data)

    def to_scipy(self):
        import scipy.sparse as sp

        return sp.coo_matrix(
            (np.asarray(self.data), (self.pattern.rows, self.pattern.cols)),
            shape=self.shape,
        ).tocsr()

    # ---- linear ops --------------------------------------------------------

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """Sparse mat-vec / mat-mat: supports x of shape (n,) or (n, k).

        Batched `data` is handled by `vmap` at call sites, not here.
        """
        p = self.pattern
        d = self.data[:, None] if x.ndim > 1 else self.data
        return jax.ops.segment_sum(d * x[p.cols], p.rows, num_segments=p.shape[0])

    def __matmul__(self, other):
        if isinstance(other, SparseMatrix):
            return sp_matmul(self, other)
        return self.matvec(other)

    def rmatvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """x ↦ Aᵀx."""
        return self.T.matvec(x)

    @property
    def T(self) -> "SparseMatrix":
        p = self.pattern
        return SparseMatrix(self.data[..., p.transpose_perm], p.transposed)

    def quad(self, x: jnp.ndarray) -> jnp.ndarray:
        """xᵀ A x (the `sqmahal` hot path, reference src/gmrf.jl:94-97)."""
        p = self.pattern
        return jnp.sum(self.data * x[p.rows] * x[p.cols], axis=-1)

    def diagonal(self) -> jnp.ndarray:
        return self.data[..., self.pattern.diag_positions]

    def symmetrize(self) -> "SparseMatrix":
        """(A + Aᵀ)/2 on the (assumed symmetric) pattern."""
        return SparseMatrix(
            0.5 * (self.data + self.data[..., self.pattern.transpose_perm]),
            self.pattern,
        )

    # ---- arithmetic (fixed-pattern aware) ----------------------------------

    def __mul__(self, s):
        return SparseMatrix(self.data * s, self.pattern)

    __rmul__ = __mul__

    def __neg__(self):
        return SparseMatrix(-self.data, self.pattern)

    def __add__(self, other: "SparseMatrix") -> "SparseMatrix":
        if other.pattern == self.pattern:
            return SparseMatrix(self.data + other.data, self.pattern)
        return sp_add(self, other)

    def __sub__(self, other: "SparseMatrix") -> "SparseMatrix":
        return self + (other * -1.0)

    def pad_to(self, pattern: SparsePattern) -> "SparseMatrix":
        """Embed this matrix's values into a super-pattern (fixed scatter)."""
        if pattern == self.pattern:
            return self
        smap = pattern.scatter_map(self.pattern)
        data = jnp.zeros(self.data.shape[:-1] + (pattern.nnz,), self.data.dtype)
        return SparseMatrix(data.at[..., smap].add(self.data), pattern)

    def with_data(self, data) -> "SparseMatrix":
        return SparseMatrix(data, self.pattern)


def from_dense(mat: jnp.ndarray, pattern: SparsePattern | None = None, tol: float = 0.0) -> SparseMatrix:
    if pattern is None:
        m = np.asarray(mat)
        mask = np.abs(m) > tol
        pattern = SparsePattern.from_dense_mask(mask)
    return SparseMatrix(jnp.asarray(mat)[pattern.rows, pattern.cols], pattern)


def from_scipy(mat) -> SparseMatrix:
    coo = mat.tocoo()
    coo.sum_duplicates()
    pat = SparsePattern(coo.row, coo.col, coo.shape)
    return SparseMatrix(jnp.asarray(coo.data)[pat.sort_order], pat)


def speye(n: int, dtype=jnp.float32) -> SparseMatrix:
    idx = np.arange(n, dtype=np.int32)
    return SparseMatrix(jnp.ones(n, dtype), SparsePattern(idx, idx, (n, n)))


def spdiag(d: jnp.ndarray) -> SparseMatrix:
    n = d.shape[-1]
    idx = np.arange(n, dtype=np.int32)
    return SparseMatrix(d, SparsePattern(idx, idx, (n, n)))


# ---- structural binary ops (symbolic plan cached per pattern pair) ---------

_ADD_CACHE: dict = {}
_MUL_CACHE: dict = {}


def sp_add(a: SparseMatrix, b: SparseMatrix) -> SparseMatrix:
    key = (a.pattern, b.pattern)
    plan = _ADD_CACHE.get(key)
    if plan is None:
        pat = union_patterns(a.pattern, b.pattern)
        plan = (pat, pat.scatter_map(a.pattern), pat.scatter_map(b.pattern))
        _ADD_CACHE[key] = plan
    pat, ia, ib = plan
    data = jnp.zeros(jnp.broadcast_shapes(a.data.shape[:-1], b.data.shape[:-1]) + (pat.nnz,),
                     jnp.result_type(a.data, b.data))
    data = data.at[..., ia].add(a.data)
    data = data.at[..., ib].add(b.data)
    return SparseMatrix(data, pat)


def sp_matmul(a: SparseMatrix, b: SparseMatrix) -> SparseMatrix:
    """Numeric SpGEMM over a precomputed (cached) symbolic plan."""
    key = (a.pattern, b.pattern)
    plan = _MUL_CACHE.get(key)
    if plan is None:
        plan = spgemm_pattern(a.pattern, b.pattern)
        _MUL_CACHE[key] = plan
    pat, a_idx, b_idx, out_idx = plan
    prod = a.data[..., a_idx] * b.data[..., b_idx]
    data = jax.ops.segment_sum(prod.T if prod.ndim > 1 else prod, out_idx, num_segments=pat.nnz)
    if prod.ndim > 1:
        data = data.T
    return SparseMatrix(data, pat)


def sp_tridiag(main: jnp.ndarray, off: jnp.ndarray) -> SparseMatrix:
    """Symmetric tridiagonal matrix from main diagonal (n,) and off-diagonal
    (n-1,) values."""
    n = main.shape[-1]
    idx = np.arange(n, dtype=np.int32)
    rows = np.concatenate([idx, idx[1:], idx[:-1]])
    cols = np.concatenate([idx, idx[:-1], idx[1:]])
    pat = SparsePattern(rows, cols, (n, n))
    data = jnp.concatenate([main, off, off], axis=-1)
    return SparseMatrix(data[..., pat.sort_order], pat)


def sp_block_diag(mats: list[SparseMatrix]) -> SparseMatrix:
    """Block-diagonal composition (reference: src/latent_models/combined.jl)."""
    rows, cols = [], []
    r0 = c0 = 0
    for m in mats:
        rows.append(m.pattern.rows.astype(np.int64) + r0)
        cols.append(m.pattern.cols.astype(np.int64) + c0)
        r0 += m.shape[0]
        c0 += m.shape[1]
    pat = SparsePattern(np.concatenate(rows), np.concatenate(cols), (r0, c0))
    data = jnp.concatenate([m.data for m in mats], axis=-1)
    return SparseMatrix(data[..., pat.sort_order], pat)


def sp_kron(a: SparseMatrix, b: SparseMatrix) -> SparseMatrix:
    """Kronecker product A ⊗ B (rightmost factor varies fastest — R-INLA
    convention, reference src/latent_models/separable.jl:13-21)."""
    ar, ac, br, bc = a.pattern.rows, a.pattern.cols, b.pattern.rows, b.pattern.cols
    rows = (ar.astype(np.int64)[:, None] * b.shape[0] + br[None, :]).ravel()
    cols = (ac.astype(np.int64)[:, None] * b.shape[1] + bc[None, :]).ravel()
    pat = SparsePattern(rows, cols, (a.shape[0] * b.shape[0], a.shape[1] * b.shape[1]))
    data = (a.data[..., :, None] * b.data[..., None, :]).reshape(
        *a.data.shape[:-1], a.nnz * b.nnz
    )
    return SparseMatrix(data[..., pat.sort_order], pat)
