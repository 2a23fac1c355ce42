"""Pallas TPU kernels for the hot compute paths.

Each kernel has a pure-XLA reference implementation used (a) as the
CPU/interpret fallback and (b) as the oracle in tests. Kernels are selected
at trace time by backend: `pallas_enabled()` is True only on real TPU
devices (set TPU_GMRF_FORCE_PALLAS=interpret to exercise the kernels in
interpreter mode on CPU for testing).
"""

from .dispatch import pallas_enabled, pallas_mode
from .bsr_spmv import BSRMatrix, best_block_size, bsr_from_sparse, bsr_spmv


def hot_matvec(Q, min_nnz: int = 50_000):
    """Best repeated-multiply path for a fixed sparse matrix: on TPU with
    enough nonzeros, convert once to BSR and run the Pallas double-buffered
    DMA kernel (bsr_spmv); otherwise the COO segment-sum matvec. Use at any
    call site that multiplies by the SAME matrix many times (CG iterations,
    RBMC sample batches)."""
    if pallas_enabled() and Q.nnz >= min_nnz:
        return bsr_from_sparse(Q).matvec
    return Q.matvec

__all__ = ["pallas_enabled", "pallas_mode", "BSRMatrix", "best_block_size", "bsr_from_sparse", "bsr_spmv", "hot_matvec"]
