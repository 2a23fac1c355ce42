"""Lazy structured linear operators (matvec closures as pytrees).

TPU-native analogue of the reference's `src/linear_maps/` operator zoo
(SymmetricBlockTridiagonalMap, SSMBidiagonalMap, OuterProductMap, ZeroMap,
CholeskySqrt/LinearMapWithSqrt — reference src/linear_maps/*, 9 files).
In JAX an operator is just a pytree with a `matvec`; these never
materialize the full matrix, so CG / sampling on large spatiotemporal
systems stay at O(nnz) per product with batched dense block ops that map
onto the MXU.

Block convention: a block-tridiagonal map over Nt time slices of size ns
stores diag blocks as (Nt, ns, ns) and off-diagonal (sub) blocks as
(Nt-1, ns, ns); vectors are flattened time-major (slice t occupies
x[t*ns:(t+1)*ns]), matching the reference's R-INLA Kronecker layout
(src/latent_maps convention, separable.jl:13-21).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SymmetricBlockTridiagonalMap",
    "SSMBidiagonalMap",
    "OuterProductMap",
    "ZeroMap",
    "CholeskySqrtMap",
    "ADJacobianMap",
    "sparse_jacobian_map",
    "sparse_hessian_map",
    "pattern_column_coloring",
    "block_tridiag_to_sparse",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SymmetricBlockTridiagonalMap:
    """Q = blocktridiag(sub, diag, subᵀ); diag (Nt,ns,ns), sub (Nt-1,ns,ns)
    where sub[t] = Q[t+1, t] (block below the diagonal).

    Reference: src/linear_maps/symmetric_block_tridiagonal.jl:19-71.
    """

    diag: Any
    sub: Any

    @property
    def nt(self):
        return self.diag.shape[0]

    @property
    def ns(self):
        return self.diag.shape[1]

    @property
    def shape(self):
        n = self.nt * self.ns
        return (n, n)

    def matvec(self, x):
        xb = x.reshape(self.nt, self.ns)
        y = jnp.einsum("tij,tj->ti", self.diag, xb)
        lo = jnp.einsum("tij,tj->ti", self.sub, xb[:-1])  # contributes to row t+1
        hi = jnp.einsum("tji,tj->ti", self.sub, xb[1:])  # subᵀ contributes to row t
        y = y.at[1:].add(lo)
        y = y.at[:-1].add(hi)
        return y.reshape(x.shape)

    def __matmul__(self, x):
        return self.matvec(x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SSMBidiagonalMap:
    """Lower block-bidiagonal square root of an SSM joint precision:
    row t has diag block D[t] and subdiag block E[t-1] (so L z stacks
    D[0]z0, E[0]z0+D[1]z1, ...). Q = L Lᵀ. Used to sample joint state-space
    GMRFs without factorizing (reference src/linear_maps/ssm_bidiagonal.jl).
    """

    diag: Any  # (Nt, ns, ns)
    sub: Any  # (Nt-1, ns, ns)

    @property
    def nt(self):
        return self.diag.shape[0]

    @property
    def ns(self):
        return self.diag.shape[1]

    @property
    def shape(self):
        n = self.nt * self.ns
        return (n, n)

    def matvec(self, z):
        zb = z.reshape(self.nt, self.ns)
        y = jnp.einsum("tij,tj->ti", self.diag, zb)
        y = y.at[1:].add(jnp.einsum("tij,tj->ti", self.sub, zb[:-1]))
        return y.reshape(z.shape)

    def __matmul__(self, z):
        return self.matvec(z)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OuterProductMap:
    """A = B M Bᵀ for tall B (n,k) and small symmetric M (k,k)
    (reference src/linear_maps/outer_product.jl)."""

    B: Any
    M: Any

    @property
    def shape(self):
        return (self.B.shape[0], self.B.shape[0])

    def matvec(self, x):
        return self.B @ (self.M @ (self.B.T @ x))

    def __matmul__(self, x):
        return self.matvec(x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ZeroMap:
    """The zero operator (reference src/linear_maps/zero_map.jl)."""

    n: Any = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def shape(self):
        return (self.n, self.n)

    def matvec(self, x):
        return jnp.zeros_like(x)

    def __matmul__(self, x):
        return self.matvec(x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CholeskySqrtMap:
    """Wraps a factorized GMRF backend as the square-root operator
    L (Q = L Lᵀ): `matvec(z)` = L z and `rsolve(z)` = L⁻ᵀ z — the sampling
    primitive x = μ + L⁻ᵀ z (reference src/linear_maps/cholesky_sqrt.jl).
    """

    factor: Any

    def matvec(self, z):
        return self.factor.sqrt_matvec(z)

    def rsolve(self, z):
        return self.factor.backward_solve(z)

    def __matmul__(self, z):
        return self.matvec(z)


@dataclasses.dataclass(frozen=True)
class ADJacobianMap:
    """Lazy Jacobian J = ∂f/∂x at x_ref as a linear operator.

    `matvec` is one `jvp` (forward tangent), `rmatvec` one `vjp` — the
    JAX-native equivalent of the reference's `ADJacobianMap`
    (reference src/linear_maps/ad_jacobian.jl): the Jacobian is never
    materialized, so nonlinear observation operators (`NonlinearLeastSquares`)
    stay matrix-free.
    """

    f: Any
    x_ref: Any

    @property
    def shape(self):
        out = jax.eval_shape(self.f, self.x_ref)
        return (int(np.prod(out.shape)), int(self.x_ref.shape[0]))

    def matvec(self, v):
        return jax.jvp(self.f, (self.x_ref,), (v,))[1]

    def rmatvec(self, w):
        _, pull = jax.vjp(self.f, self.x_ref)
        return pull(w)[0]

    def __matmul__(self, v):
        return self.matvec(v)


_COLOR_CACHE: dict = {}


def pattern_column_coloring(pattern, n: int):
    """Greedy distance-2 column coloring of `pattern` (columns conflict when
    they touch a common row). Cached per pattern. Returns (color, ncolors)."""
    cached = _COLOR_CACHE.get(pattern)
    if cached is not None:
        return cached
    rows_of_col = [[] for _ in range(n)]
    for r, c in zip(pattern.rows, pattern.cols):
        rows_of_col[int(c)].append(int(r))
    color = np.full(n, -1, dtype=np.int64)
    ncolors = 0
    row_color_used: dict = {}
    for c in range(n):
        forbidden = set()
        for r in rows_of_col[c]:
            forbidden |= row_color_used.get(r, set())
        k = 0
        while k in forbidden:
            k += 1
        color[c] = k
        ncolors = max(ncolors, k + 1)
        for r in rows_of_col[c]:
            row_color_used.setdefault(r, set()).add(k)
    _COLOR_CACHE[pattern] = (color, ncolors)
    return color, ncolors


def sparse_jacobian_map(f, x_ref, pattern):
    """Sparse Jacobian of `f` at `x_ref` restricted to a known `pattern`.

    Column-colored forward-mode: structurally independent columns (no shared
    output row) share one jvp, so the number of passes is the pattern's
    chromatic number rather than n — the JAX equivalent of the reference's
    SparseConnectivityTracer + coloring extension
    (reference ext/GaussianMarkovRandomFieldsSparseJacobian.jl).
    Returns a `SparseMatrix` on `pattern`.
    """
    from .sparse.matrix import SparseMatrix

    n = int(x_ref.shape[0])
    color, ncolors = pattern_column_coloring(pattern, n)
    seeds = np.zeros((ncolors, n), dtype=np.float64)
    seeds[color, np.arange(n)] = 1.0
    seeds = jnp.asarray(seeds, dtype=x_ref.dtype)
    _, jv = jax.vmap(lambda s: jax.jvp(f, (x_ref,), (s,)))(seeds)
    if jv.ndim == 1:  # pragma: no cover - scalar outputs
        jv = jv[:, None]
    # entry (r, c) lives in the pass of color[c] at output row r
    data = jv[jnp.asarray(color[pattern.cols]), jnp.asarray(pattern.rows)]
    return SparseMatrix(data, pattern)


def sparse_hessian_map(g, x_ref, pattern):
    """Sparse Hessian of scalar `g` at `x_ref` restricted to symmetric
    `pattern`, via colored forward-over-reverse HVPs: columns of ∇²g sharing
    a color are probed by ONE jvp-of-grad pass, so the cost is
    (chromatic number) HVPs instead of n — never materializing an n×n array.
    The JAX counterpart of the reference's sparse-AD Hessian extension
    (reference ext/GaussianMarkovRandomFieldsSparseADLikelihoods.jl:1-97).
    """
    return sparse_jacobian_map(jax.grad(g), x_ref, pattern)


def block_tridiag_to_sparse(m: SymmetricBlockTridiagonalMap):
    """Materialize a SymmetricBlockTridiagonalMap into a SparseMatrix
    (dense per-block storage scattered into BSR-like COO). Host-side;
    used when a direct factorization of the joint is wanted."""
    import numpy as np

    from .sparse.matrix import SparseMatrix
    from .sparse.pattern import SparsePattern

    nt, ns = m.nt, m.ns
    n = nt * ns
    rows, cols, vals = [], [], []
    ii, jj = np.meshgrid(np.arange(ns), np.arange(ns), indexing="ij")
    for t in range(nt):
        rows.append((t * ns + ii).ravel())
        cols.append((t * ns + jj).ravel())
        vals.append(m.diag[t].reshape(-1))
    for t in range(nt - 1):
        rows.append(((t + 1) * ns + ii).ravel())
        cols.append((t * ns + jj).ravel())
        vals.append(m.sub[t].reshape(-1))
        rows.append((t * ns + ii).ravel())
        cols.append(((t + 1) * ns + jj).ravel())
        vals.append(jnp.swapaxes(m.sub[t], -1, -2).reshape(-1))
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    data = jnp.concatenate(vals)
    order = np.lexsort((cols, rows))
    pattern = SparsePattern(
        rows=rows[order], cols=cols[order], shape=(n, n)
    )
    return SparseMatrix(data[order], pattern)
