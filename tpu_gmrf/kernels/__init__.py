"""Pallas TPU kernels for the hot compute paths.

Each kernel has a pure-XLA reference implementation used (a) as the
CPU/interpret fallback and (b) as the oracle in tests. Kernels are selected
at trace time by backend: `pallas_enabled()` is True only on real TPU
devices (set TPU_GMRF_FORCE_PALLAS=interpret to exercise the kernels in
interpreter mode on CPU for testing).
"""

from .dispatch import pallas_enabled, pallas_mode
from .bsr_spmv import BSRMatrix, bsr_from_sparse, bsr_spmv

__all__ = ["pallas_enabled", "pallas_mode", "BSRMatrix", "bsr_from_sparse", "bsr_spmv"]
