"""Backend dispatch for Pallas kernels.

TPU → compiled Mosaic kernels; anything else → the XLA reference path.
`TPU_GMRF_FORCE_PALLAS=interpret` forces the Pallas code through the
interpreter (slow, CPU-safe) so CI exercises the kernel logic itself.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax

__all__ = ["pallas_mode", "pallas_enabled"]


@lru_cache(maxsize=1)
def pallas_mode() -> str:
    """'tpu' | 'interpret' | 'off'."""
    forced = os.environ.get("TPU_GMRF_FORCE_PALLAS", "").lower()
    if forced in ("interpret", "tpu", "off"):
        return forced
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        return "off"
    return "tpu" if platform == "tpu" else "off"


def pallas_enabled() -> bool:
    return pallas_mode() in ("tpu", "interpret")
