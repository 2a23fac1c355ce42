"""Factor-graph observation model.

Reference spec: src/observation_models/structured_observation_model.jl —
the observation-side mirror of StructuredLatentPrior: groups of identical
small factors fn(x[vars], y_i, **theta), with vmapped per-factor AD
scattered into a fixed Hessian pattern.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.nongaussian import FactorGroup, _HashableArray
from ..sparse.matrix import SparseMatrix
from ..sparse.pattern import SparsePattern, diag_pattern, union_patterns
from .base import ObservationLikelihood, ObservationModel

__all__ = ["StructuredObservationModel", "StructuredLikelihood", "ObsFactorGroup"]


class ObsFactorGroup:
    """Identical small observation factors: fn(x_k (K,), y_i, **theta) over
    rows of `indices` ((G, K)) with per-factor observations y ((G, ...))."""

    def __init__(self, indices, fn):
        self.indices = np.asarray(indices, dtype=np.int64)
        if self.indices.ndim != 2:
            raise ValueError("indices must be (G, K)")
        self.fn = fn

    @property
    def K(self):
        return self.indices.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StructuredLikelihood(ObservationLikelihood):
    ys: Any  # tuple of per-group observation arrays (G_g, ...)
    theta: Any
    groups: tuple = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    pattern: SparsePattern = dataclasses.field(metadata=dict(static=True))
    posmaps: tuple = dataclasses.field(metadata=dict(static=True))

    conditionally_independent = True
    hessian_kind = "sparse"

    def loglik(self, x):
        total = jnp.zeros((), x.dtype)
        for g, y in zip(self.groups, self.ys):
            xg = x[g.indices]
            total = total + jnp.sum(
                jax.vmap(lambda v, yi: g.fn(v, yi, **self.theta))(xg, y)
            )
        return total

    def pointwise_loglik(self, x):
        parts = []
        for g, y in zip(self.groups, self.ys):
            xg = x[g.indices]
            parts.append(jax.vmap(lambda v, yi: g.fn(v, yi, **self.theta))(xg, y))
        return jnp.concatenate(parts)

    def loggrad(self, x):
        out = jnp.zeros_like(x)
        for g, y in zip(self.groups, self.ys):
            xg = x[g.indices]
            gv = jax.vmap(jax.grad(lambda v, yi: g.fn(v, yi, **self.theta)))(xg, y)
            out = out.at[g.indices.ravel()].add(gv.ravel())
        return out

    def loghessian(self, x) -> SparseMatrix:
        data = jnp.zeros((self.pattern.nnz,), x.dtype)
        for g, y, pm in zip(self.groups, self.ys, self.posmaps):
            xg = x[g.indices]
            Hv = jax.vmap(jax.hessian(lambda v, yi: g.fn(v, yi, **self.theta)))(xg, y)
            data = data.at[pm.arr.ravel()].add(Hv.ravel())
        return SparseMatrix(data, self.pattern)

    def loghessian_diag(self, x):
        raise NotImplementedError("structured Hessian is sparse; use loghessian")


class StructuredObservationModel(ObservationModel):
    def __init__(self, n: int, groups):
        self.n = n
        self.groups = tuple(groups)
        pats = [diag_pattern(n)]
        for g in self.groups:
            K = g.K
            rows = np.repeat(g.indices, K, axis=1).ravel()
            cols = np.tile(g.indices, (1, K)).ravel()
            uniq = np.unique(np.stack([rows, cols]), axis=1)
            pats.append(SparsePattern(uniq[0], uniq[1], (n, n)))
        self.pattern = union_patterns(*pats)
        pos = self.pattern.position_map()
        posmaps = []
        for g in self.groups:
            K = g.K
            pm = np.empty((g.indices.shape[0], K, K), dtype=np.int64)
            for a in range(K):
                for b in range(K):
                    for i in range(g.indices.shape[0]):
                        pm[i, a, b] = pos[(int(g.indices[i, a]), int(g.indices[i, b]))]
            posmaps.append(_HashableArray(pm))
        self.posmaps = tuple(posmaps)

    def __call__(self, ys, **theta) -> StructuredLikelihood:
        if not isinstance(ys, (tuple, list)):
            ys = (ys,)
        ys = tuple(jnp.asarray(y) for y in ys)
        if len(ys) != len(self.groups):
            raise ValueError(f"expected {len(self.groups)} observation arrays")
        return StructuredLikelihood(
            ys=ys,
            theta=theta,
            groups=self.groups,
            n=self.n,
            pattern=self.pattern,
            posmaps=self.posmaps,
        )
