"""Kernels for the hot compute paths.

Each formulation has a pure-XLA reference implementation used (a) as the
CPU/interpret fallback and (b) as the oracle in tests. Selection happens at
trace time from host-side symbolic plans (pattern-cached), so jitted hot
loops see exactly one formulation.
"""

from .bsr_spmv import BSRMatrix, best_block_size, bsr_from_sparse, bsr_spmv

# Measured on the v5e chip (16k-node Matérn α=2 pattern, k=8 RHS,
# /tmp/spmv_measure.py round 3): dense block-tridiag einsums stream at
# ~400 GB/s; the blocked-gather BSR einsum manages ~11 GB/s effective; the
# COO segment-sum ~5 GB/s. TPU has no hardware gather — regular dense
# storage wins even at 30-100x value inflation.
_DENSE_BYTES_PER_S = 400e9
_GATHER_BYTES_PER_S = 11e9


def hot_matvec(Q, min_nnz: int = 50_000):
    """Best repeated-multiply path for a fixed sparse matrix on the current
    backend. Use at any call site that multiplies by the SAME matrix many
    times (CG iterations, RBMC sample batches, power iterations).

    Dispatch (trace-time, from cached symbolic plans):
    - small nnz → plain COO segment-sum (`Q.matvec`);
    - RCM-banded patterns where streaming the dense block-tridiagonal
      storage beats the gather-bound alternatives → `block_tridiag_matvec`
      (three batched MXU einsums per multiply);
    - otherwise the BSR blocked einsum (dense (bs,bs) blocks, batched MXU
      contractions + segment-sum over block rows).
    """
    if Q.nnz < min_nnz:
        return Q.matvec
    from ..solvers.banded import banded_plan, block_tridiag_matvec

    bs = best_block_size(Q.pattern)
    nb = -(-Q.shape[0] // bs)
    import numpy as np

    nblocks = len(
        np.unique((Q.pattern.rows // bs).astype(np.int64) * nb + Q.pattern.cols // bs)
    )
    bsr_cost = 3.0 * nblocks * bs * bs * 4 / _GATHER_BYTES_PER_S
    # block-tridiag storage keeps only the lower triangle and mirrors it, so
    # it computes the *symmetrized* product: require a symmetric pattern AND
    # (host-checkable) symmetric values; tracers fall back to the exact BSR.
    symmetric_vals = False
    if Q.pattern.is_symmetric:
        try:
            v = np.asarray(Q.data)
            symmetric_vals = bool(
                np.allclose(v, v[Q.pattern.transpose_perm], rtol=1e-6, atol=0.0)
            )
        except Exception:  # tracer / non-concrete data
            symmetric_vals = False
    bt_cost = None
    if symmetric_vals:
        try:
            plan = banded_plan(Q.pattern, None)
            dense_bytes = (2 * plan["K"] - 1) * plan["s"] ** 2 * 4
            # memory ceiling: dense storage can inflate nnz 100x+ on wide-band
            # patterns; cap both absolute footprint and the inflation ratio
            if dense_bytes <= 2e9 and dense_bytes <= 200 * (Q.nnz * 4):
                bt_cost = dense_bytes / _DENSE_BYTES_PER_S
        except Exception:
            bt_cost = None
    if bt_cost is not None and bt_cost < bsr_cost:
        return block_tridiag_matvec(Q)
    return bsr_from_sparse(Q, bs=bs).matvec


__all__ = [
    "BSRMatrix",
    "best_block_size",
    "bsr_from_sparse",
    "bsr_spmv",
    "hot_matvec",
]
