"""Block-diagonal model composition with hyperparameter prefixing.

Reference spec: src/latent_models/combined.jl:54-326 — components stack
block-diagonally; hyperparameters get `_modelname[_k]` suffixes
(`tau_besag`, `tau_iid_2`, ...); constraints embed into the stacked space;
named component access via attributes.
"""

from __future__ import annotations

import numpy as np

from ..sparse.matrix import sp_block_diag
import jax.numpy as jnp

from .base import LatentModel, stack_constraints

__all__ = ["CombinedModel"]


def _component_names(components):
    names = []
    counts: dict = {}
    for comp in components:
        base = comp.name
        counts[base] = counts.get(base, 0) + 1
        names.append(base if counts[base] == 1 else f"{base}_{counts[base]}")
    return names


class CombinedModel(LatentModel):
    name = "combined"

    def __init__(self, *components, solver=None):
        if len(components) == 1 and isinstance(components[0], (list, tuple)):
            components = tuple(components[0])
        if not components:
            raise ValueError("CombinedModel needs at least one component")
        self.components = components
        self.component_names = _component_names(components)
        self.sizes = [c.n for c in components]
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)])
        if solver is not None:
            self.solver = solver

    @property
    def n(self):
        return int(self.offsets[-1])

    @property
    def hyperparameters(self):
        out = []
        for comp, cname in zip(self.components, self.component_names):
            out.extend(f"{p}_{cname}" for p in comp.hyperparameters)
        return tuple(out)

    def _split_theta(self, theta):
        per_comp = []
        for comp, cname in zip(self.components, self.component_names):
            sub = {}
            for p in comp.hyperparameters:
                key = f"{p}_{cname}"
                if key not in theta:
                    raise ValueError(f"missing required hyperparameter: {key}")
                sub[p] = theta[key]
            per_comp.append(sub)
        return per_comp

    def precision(self, **theta):
        per_comp = self._split_theta(theta)
        return sp_block_diag(
            [c.precision(**sub) for c, sub in zip(self.components, per_comp)]
        )

    def mean(self, **theta):
        per_comp = self._split_theta(theta)
        return jnp.concatenate(
            [c.mean(**sub) for c, sub in zip(self.components, per_comp)]
        )

    def constraints(self):
        parts = []
        for i, comp in enumerate(self.components):
            cc = comp.constraints()
            if cc is None:
                continue
            A, e = cc
            A_full = np.zeros((A.shape[0], self.n))
            A_full[:, self.offsets[i] : self.offsets[i + 1]] = A
            parts.append((A_full, e))
        return stack_constraints(*parts)

    def component(self, name: str):
        for comp, cname in zip(self.components, self.component_names):
            if cname == name:
                return comp
        raise KeyError(
            f"no component named {name!r}; available: {self.component_names}"
        )

    def __getattr__(self, name):
        try:
            return self.component(name)
        except KeyError:
            raise AttributeError(name) from None
