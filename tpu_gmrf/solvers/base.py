"""Solver dispatch: structure-specialized factorization backends.

Replaces the reference's LinearSolve algorithm polymorphism + capability
traits (reference: src/solvers/selinv.jl:16-29, src/solvers/backward_solve.jl:14-27,
src/utils/linsolve_utils.jl) with static trace-time dispatch: the
`SolverSpec` is a hashable static field of the GMRF pytree, so `jit`
specializes per (pattern, solver) pair.

Every factorization backend implements:
  solve(b)          — Q x = b           (b: (n,) or (n, k))
  logdet()          — log det Q
  backward_solve(z) — Lᵀ x = z with Q = L Lᵀ  (whitening⁻¹; sampling path)
  selinv_diag()     — diag(Q⁻¹)         (Takahashi selected inversion)
  selinv(pattern)   — entries of Q⁻¹ on a pattern (for ∂logdet/∂Q)
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..sparse.matrix import SparseMatrix

__all__ = ["SolverSpec", "factorize", "DENSE_AUTO_MAX"]

# Above this dimension "auto" stops materializing dense factors.
DENSE_AUTO_MAX = 4096


@dataclasses.dataclass(frozen=True)
class SolverSpec:
    """Static solver configuration.

    kind: "auto" | "dense" | "tridiag" | "banded" | "supernodal" | "cg"
    """

    kind: str = "auto"
    block: int | None = None  # block-size multiple for the banded backend
    dense_max: int = DENSE_AUTO_MAX
    max_width: int = 32  # supernode width cap (supernodal backend)

    def resolve(self, pattern) -> "SolverSpec":
        if self.kind != "auto":
            return self
        n = pattern.shape[0]
        if _is_tridiagonal(pattern):
            return dataclasses.replace(self, kind="tridiag")
        if n <= self.dense_max:
            return dataclasses.replace(self, kind="dense")
        return dataclasses.replace(self, kind=_large_sparse_kind(pattern))


def _large_sparse_kind(pattern) -> str:
    """Choose banded vs supernodal for a large unstructured pattern.

    Banded (RCM + block-tridiagonal dense scan) is perfectly regular on the
    MXU but does n·b² work; the supernodal backend follows the AMD fill
    (Σ colcount² work) with bucketed batched kernels. Prefer banded unless
    AMD fill-flops undercut banded by a healthy regularity margin.
    """
    from .banded import banded_plan
    from .supernodal import supernodal_symbolic_summary

    try:
        bplan = banded_plan(pattern, None)
        banded_flops = float(bplan["npad"]) * float(bplan["s"]) ** 2
    except Exception:
        return "supernodal"
    try:
        summ = supernodal_symbolic_summary(pattern)
    except Exception:
        return "banded"
    # The supernodal schedule emits one kernel group per (level, size-class)
    # bucket; past ~10² buckets the XLA graph (and eager dispatch) cost
    # swamps the flop savings — stay banded there.
    if summ["nbuckets"] > 128:
        return "banded"
    # MXU-regularity discount: banded runs dense fixed-shape scans, the
    # supernodal path pays gather/scatter overhead — require 8x fewer flops.
    if summ["flops"] * 8.0 < banded_flops:
        return "supernodal"
    return "banded"


def _is_tridiagonal(pattern) -> bool:
    return bool(np.all(np.abs(pattern.rows.astype(np.int64) - pattern.cols) <= 1))


def factorize(Q: SparseMatrix, spec: SolverSpec = SolverSpec()):
    """Factorize a symmetric positive-definite sparse precision matrix."""
    spec = spec.resolve(Q.pattern)
    if spec.kind == "dense":
        from .dense import dense_factorize

        return dense_factorize(Q)
    if spec.kind == "tridiag":
        from .tridiag import tridiag_factorize

        return tridiag_factorize(Q)
    if spec.kind == "banded":
        from .banded import banded_factorize

        return banded_factorize(Q, block=spec.block)
    if spec.kind == "supernodal":
        from .supernodal import supernodal_factorize

        return supernodal_factorize(Q, max_width=spec.max_width)
    raise ValueError(f"unknown solver kind: {spec.kind}")
