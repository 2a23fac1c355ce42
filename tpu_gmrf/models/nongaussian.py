"""Non-Gaussian latent priors: iterated re-linearization (TMB-style).

Reference specs: src/latent_models/local_quadratic.jl:1-130 (natural-form
local quadratic: Q = −∇²log p at x_ref, h = ∇log p + Q·x_ref),
src/latent_models/autodiff_latent_prior.jl:66-161 (prior given as a scalar
log-density, AD grad + Hessian), src/latent_models/structured_latent_prior.jl:48-227
(factor-graph prior: per-group small-factor AD scattered into a precomputed
pattern — O(nnz) per Newton iterate).

TPU-native: factor groups evaluate as `vmap(grad/hessian(factor))` over the
group's index array, scattered by precomputed position maps — one fused
gather/segment-sum workload per group, no per-factor loops.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.matrix import SparseMatrix
from ..sparse.pattern import SparsePattern, diag_pattern, union_patterns

__all__ = [
    "LatentPrior",
    "AutoDiffLatentPrior",
    "StructuredLatentPrior",
    "FactorGroup",
    "detect_hessian_pattern",
]


class LatentPrior:
    """Protocol for non-Gaussian latent priors, materialized at θ.

    Subclasses are pytrees (θ traced) and implement `n`, `log_density(x)`,
    and `local_quadratic(x) -> (Q: SparseMatrix, h)` with
    Q = −∇²log p(x), h = ∇log p(x) + Q·x (natural form).
    """

    def log_density(self, x):
        raise NotImplementedError

    def local_quadratic(self, x):
        raise NotImplementedError


def _dense_pattern(n):
    rows, cols = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return SparsePattern(rows.ravel(), cols.ravel(), (n, n))


def detect_hessian_pattern(fn, n: int, theta=None, nprobe: int = 3) -> SparsePattern:
    """Probe the structural Hessian sparsity of `fn(x, **theta)` by
    evaluating the dense Hessian at `nprobe` random points and keeping
    entries nonzero at any of them (symmetrized, diagonal always kept).

    This is a host-side O(n²) probe — use it once at model-build time on a
    moderate n, or pass a known pattern directly; the reference's
    SparseConnectivityTracer plays this role symbolically
    (reference ext/GaussianMarkovRandomFieldsSparseADLikelihoods.jl:21-52).
    """
    if n > 8192:
        raise ValueError(
            "detect_hessian_pattern materializes an n*n probe; pass an "
            "explicit SparsePattern for n > 8192"
        )
    theta = theta or {}
    rng = np.random.default_rng(0)
    mask = np.zeros((n, n), dtype=bool)
    h = jax.jit(jax.hessian(lambda x: fn(x, **theta)))
    for _ in range(nprobe):
        x = jnp.asarray(rng.standard_normal(n) * 0.7)
        mask |= np.abs(np.asarray(h(x))) > 0
    mask |= mask.T
    mask |= np.eye(n, dtype=bool)
    return SparsePattern.from_dense_mask(mask)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AutoDiffLatentPrior(LatentPrior):
    """Prior defined by a scalar log-density fn(x, **theta). `hessian` is
    'dense' (exact, O(n²) — small n only), 'diag' (valid only for separable
    log-densities), or a symmetric `SparsePattern`: colored HVP extraction
    restricted to the pattern, never materializing an n×n array
    (reference ext/GaussianMarkovRandomFieldsSparseADLikelihoods.jl:1-97)."""

    theta: Any
    fn: Callable = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    hessian: Any = dataclasses.field(default="dense", metadata=dict(static=True))

    def log_density(self, x):
        return self.fn(x, **self.theta)

    def local_quadratic(self, x):
        g = jax.grad(self.log_density)(x)
        if isinstance(self.hessian, SparsePattern):
            from ..linear_maps import sparse_hessian_map

            H = sparse_hessian_map(self.log_density, x, self.hessian)
            Q = -H.symmetrize()
        elif self.hessian == "diag":
            _, hvp = jax.jvp(jax.grad(self.log_density), (x,), (jnp.ones_like(x),))
            Q = SparseMatrix(-hvp, diag_pattern(self.n))
        else:
            H = jax.hessian(self.log_density)(x)
            Q = SparseMatrix(-H.ravel(), _dense_pattern(self.n))
        h = g + Q.matvec(x)
        return Q, h


class FactorGroup:
    """A group of identical small factors: fn(x_k, **theta) over rows of
    `indices` ((G, K) int array). Static configuration."""

    def __init__(self, indices, fn: Callable):
        self.indices = np.asarray(indices, dtype=np.int64)
        if self.indices.ndim != 2:
            raise ValueError("indices must be (G, K)")
        self.fn = fn

    @property
    def K(self):
        return self.indices.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StructuredLatentPrior(LatentPrior):
    """Factor-graph prior: log p(x) = Σ_g Σ_i fn_g(x[vars_{g,i}]; θ)."""

    theta: Any
    groups: tuple = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    pattern: SparsePattern = dataclasses.field(metadata=dict(static=True))
    posmaps: tuple = dataclasses.field(metadata=dict(static=True))  # (G,K,K) int per group

    @staticmethod
    def create(n: int, groups, theta=None) -> "StructuredLatentPrior":
        groups = tuple(groups)
        pats = [diag_pattern(n)]
        for g in groups:
            K = g.K
            rows = np.repeat(g.indices, K, axis=1).ravel()
            cols = np.tile(g.indices, (1, K)).ravel()
            uniq = np.unique(np.stack([rows, cols]), axis=1)
            pats.append(SparsePattern(uniq[0], uniq[1], (n, n)))
        pattern = union_patterns(*pats)
        pos = pattern.position_map()
        posmaps = []
        for g in groups:
            K = g.K
            pm = np.empty((g.indices.shape[0], K, K), dtype=np.int64)
            for a in range(K):
                for b in range(K):
                    for i in range(g.indices.shape[0]):
                        pm[i, a, b] = pos[(int(g.indices[i, a]), int(g.indices[i, b]))]
            posmaps.append(_HashableArray(pm))
        return StructuredLatentPrior(
            theta=theta or {},
            groups=groups,
            n=n,
            pattern=pattern,
            posmaps=tuple(posmaps),
        )

    def log_density(self, x):
        total = jnp.zeros((), x.dtype)
        for g in self.groups:
            xg = x[g.indices]  # (G, K)
            total = total + jnp.sum(jax.vmap(lambda v: g.fn(v, **self.theta))(xg))
        return total

    def local_quadratic(self, x):
        grad_full = jnp.zeros_like(x)
        data = jnp.zeros((self.pattern.nnz,), x.dtype)
        for g, pm in zip(self.groups, self.posmaps):
            xg = x[g.indices]
            f = lambda v: g.fn(v, **self.theta)
            g_vals = jax.vmap(jax.grad(f))(xg)  # (G, K)
            H_vals = jax.vmap(jax.hessian(f))(xg)  # (G, K, K)
            grad_full = grad_full.at[g.indices.ravel()].add(g_vals.ravel())
            data = data.at[pm.arr.ravel()].add(-H_vals.ravel())
        Q = SparseMatrix(data, self.pattern)
        h = grad_full + Q.matvec(x)
        return Q, h


class _HashableArray:
    """Static wrapper for index arrays inside pytree-static fields."""

    __slots__ = ("arr", "_h")

    def __init__(self, arr):
        self.arr = arr
        self.arr.setflags(write=False)
        self._h = hash(arr.tobytes())

    def __hash__(self):
        return self._h

    def __eq__(self, other):
        return isinstance(other, _HashableArray) and np.array_equal(self.arr, other.arr)
