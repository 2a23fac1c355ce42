"""Composite observation models: heterogeneous likelihood components with
routed latent slices and summed log-likelihoods.

Reference spec: src/observation_models/composite/ — each component sees the
full latent x (components carry their own `indices`/A routing); the
composite sums logliks, gradients, and Hessians.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..sparse.matrix import SparseMatrix, spdiag
from .base import ObservationLikelihood, ObservationModel

__all__ = ["CompositeObservationModel", "CompositeLikelihood"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CompositeLikelihood(ObservationLikelihood):
    components: Any  # tuple of ObservationLikelihood pytrees

    conditionally_independent = False
    hessian_kind = "sparse"

    def loglik(self, x):
        return sum(c.loglik(x) for c in self.components)

    def loggrad(self, x):
        out = self.components[0].loggrad(x)
        for c in self.components[1:]:
            out = out + c.loggrad(x)
        return out

    def loghessian(self, x) -> SparseMatrix:
        mats = []
        for c in self.components:
            if c.hessian_kind == "diag":
                mats.append(spdiag(c.loghessian_diag(x)))
            else:
                mats.append(c.loghessian(x))
        out = mats[0]
        for m in mats[1:]:
            out = out + m  # union-pattern add with cached plans
        return out

    def pointwise_loglik(self, x):
        return jnp.concatenate([c.pointwise_loglik(x) for c in self.components])


class CompositeObservationModel(ObservationModel):
    """CompositeObservationModel(model1, model2, ...); call with a tuple of
    per-component observation vectors and merged θ kwargs."""

    def __init__(self, *models):
        if len(models) == 1 and isinstance(models[0], (list, tuple)):
            models = tuple(models[0])
        self.models = models

    def __call__(self, ys, **theta) -> CompositeLikelihood:
        if len(ys) != len(self.models):
            raise ValueError(f"expected {len(self.models)} observation sets, got {len(ys)}")
        comps = tuple(m(y, **theta) for m, y in zip(self.models, ys))
        return CompositeLikelihood(components=comps)
