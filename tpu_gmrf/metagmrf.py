"""MetaGMRF: metadata-carrying wrapper that forwards all distribution ops.

TPU-native analogue of the reference's `MetaGMRF`/`GMRFMetadata` pattern
(reference src/metagmrf.jl:12-81): domain layers attach semantic metadata
(e.g. spatiotemporal discretization info) to a GMRF without subclassing the
distribution; all statistical operations forward to the inner GMRF. The
wrapper is a pytree whose metadata rides in the static (aux) slot, so
jitted functions specialize on it while the numeric leaves flow through.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

__all__ = ["GMRFMetadata", "MetaGMRF"]


class GMRFMetadata:
    """Base class for metadata attached to a MetaGMRF. Subclass freely;
    instances must be hashable/eq-comparable (they live in the pytree's
    static slot)."""


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MetaGMRF:
    inner: Any
    metadata: Any

    def tree_flatten(self):
        return (self.inner,), self.metadata

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    # --- forwarding (mirrors reference src/metagmrf.jl:52-81) ---
    def __len__(self):
        return len(self.inner)

    def __getattr__(self, name):
        # dataclass fields resolve normally; everything else forwards.
        return getattr(self.inner, name)

    def __repr__(self):
        return f"MetaGMRF({self.metadata!r}, n={len(self.inner)})"
