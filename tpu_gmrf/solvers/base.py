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

The iterative `cg` kind supports `solve` only (the reference's CG-style
LinearSolve algorithms likewise report supports_selinv/backward_solve =
false and route variances through RBMC).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..sparse.matrix import SparseMatrix

__all__ = ["SolverSpec", "factorize", "CGFactor", "DENSE_AUTO_MAX", "mxu_f32"]


def mxu_f32(fn):
    """Trace `fn` under `jax.default_matmul_precision('highest')`.

    TPU dot/einsum default to bf16 MXU passes (~8 mantissa bits); Cholesky
    Schur updates and triangular solves on the ill-conditioned precisions
    this library factorizes need full f32 accumulation or they go NaN.
    Applied to every factorization-backend numeric method; XLA still fuses
    and the MXU runs the 3/6-pass f32 algorithm at a modest slowdown."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        import jax

        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped

# Above this dimension "auto" stops materializing dense factors.
DENSE_AUTO_MAX = 4096


@dataclasses.dataclass(frozen=True)
class SolverSpec:
    """Static solver configuration.

    kind: "auto" | "dense" | "tridiag" | "banded" | "supernodal" | "cg"
    ordering: fill-reducing ordering for the supernodal backend —
      "auto" (nested dissection above 16k columns, AMD below) | "amd" | "nd"
    """

    kind: str = "auto"
    block: int | None = None  # block-size multiple for the banded backend
    dense_max: int = DENSE_AUTO_MAX
    max_width: int = 2048  # supernode width cap (supernodal backend)
    ordering: str = "auto"  # supernodal fill-reducing ordering
    cg_tol: float = 1e-8
    cg_max_iter: int = 2000

    def resolve(self, pattern) -> "SolverSpec":
        if self.kind != "auto":
            return self
        n = pattern.shape[0]
        if _is_tridiagonal(pattern):
            return dataclasses.replace(self, kind="tridiag")
        if n <= self.dense_max:
            return dataclasses.replace(self, kind="dense")
        return dataclasses.replace(self, kind=_large_sparse_kind(pattern, self))


def _large_sparse_kind(pattern, spec: "SolverSpec") -> str:
    """Choose banded vs supernodal for a large unstructured pattern.

    Banded (RCM + block-tridiagonal dense scan) is perfectly regular on the
    MXU but does n·b² work; the supernodal backend follows the nested-
    dissection/AMD fill (Σ colcount² work) with bucketed batched kernels.
    Cost model: flops with a regularity discount for banded, plus a
    per-dispatched-op overhead charge on the supernodal side (one kernel
    group per (level, size-class) bucket).
    """
    from .banded import banded_plan
    from .supernodal import supernodal_symbolic_summary

    try:
        bplan = banded_plan(pattern, None)
        banded_flops = float(bplan["npad"]) * float(bplan["s"]) ** 2
    except Exception:
        return "supernodal"
    try:
        summ = supernodal_symbolic_summary(
            pattern, spec.max_width, spec.ordering
        )
    except Exception:
        return "banded"
    # Charge each bucket-step ~5 dispatched ops × ~20 µs ≈ the time a dense
    # MXU op does ~2e7 f32 flops; the banded scan gets a 4x MXU-regularity
    # discount over the gather/scatter-glued supernodal schedule.
    supernodal_cost = summ["flops"] * 4.0 + summ["nbuckets"] * 2.0e7
    if supernodal_cost < banded_flops:
        return "supernodal"
    return "banded"


def _is_tridiagonal(pattern) -> bool:
    return bool(np.all(np.abs(pattern.rows.astype(np.int64) - pattern.cols) <= 1))


def _register_cg_factor(cls):
    import jax

    return jax.tree_util.register_dataclass(cls)


@_register_cg_factor
@dataclasses.dataclass(frozen=True)
class CGFactor:
    """Iterative 'factorization': preconditioned CG solves only.

    Mirrors the reference's supports_selinv=false / supports_backward_solve
    =false algorithms (src/solvers/selinv.jl:16-29): statistics that need a
    factor (logdet, sampling, selected inversion) must use a direct backend
    or the RBMC estimators.
    """

    Q: SparseMatrix
    tol: float = dataclasses.field(metadata=dict(static=True))
    max_iter: int = dataclasses.field(metadata=dict(static=True))

    def solve(self, b):
        import jax

        from ..kernels import hot_matvec
        from .cg import cg_solve, jacobi_preconditioner

        if b.ndim > 1:
            return jax.vmap(self.solve, in_axes=1, out_axes=1)(b)
        # CG multiplies by the SAME Q hundreds of times: hot_matvec picks the
        # fastest formulation for the pattern (dense block-tridiagonal MXU
        # einsums on banded-after-RCM patterns — measured 10-12x over the
        # COO segment-sum on TPU; blocked einsum otherwise)
        x, _, _ = cg_solve(
            hot_matvec(self.Q),
            b,
            preconditioner=jacobi_preconditioner(self.Q),
            tol=self.tol,
            max_iter=self.max_iter,
        )
        return x

    def _unsupported(self, what):
        raise NotImplementedError(
            f"CG backend does not support {what}; use SolverSpec(kind="
            f"'supernodal'/'banded'/'dense') or the RBMC variance estimators"
        )

    def logdet(self):
        self._unsupported("logdet")

    def backward_solve(self, z):
        self._unsupported("backward_solve (sampling)")

    def selinv_diag(self):
        self._unsupported("selected inversion")

    def selinv(self, pattern):
        self._unsupported("selected inversion")


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

        return supernodal_factorize(
            Q, max_width=spec.max_width, ordering=spec.ordering
        )
    if spec.kind == "cg":
        return CGFactor(Q=Q, tol=spec.cg_tol, max_iter=spec.cg_max_iter)
    raise ValueError(f"unknown solver kind: {spec.kind}")
