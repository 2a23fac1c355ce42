"""Factorization-reuse workspace layer (parity API).

The reference implements an imperative "symbolic-once / numeric-refactor"
engine: `GMRFWorkspace` owns a CHOLMOD symbolic analysis plus mutable value
buffers, `WorkspaceGMRF` views it, and `WorkspacePool` hands workspaces to
threads (reference src/workspace/gmrf_workspace.jl:31-289,
workspace_gmrf.jl:12-290, workspace_pool.jl:44-62,
latent_model_integration.jl:32-267).

The TPU-native equivalent is *structural*, not imperative: symbolic
analysis (ordering, block partition, index maps) is host-side metadata
keyed by the static `SparsePattern`, and XLA's jit cache replays the
compiled numeric factorization for every new value vector with zero
re-analysis. This module packages that design behind the reference's
workspace vocabulary so hot loops can be written identically:

    ws = make_workspace(model, obs_hessian="diag")     # symbolic once
    for theta in grid:
        prior = ws.evaluate(**theta)                    # pattern-padded GMRF
        post = gaussian_approximation(prior, obs_lik)   # numeric-only work

`WorkspacePool` exists for API parity; on TPU, parallel hyperparameter
evaluation is expressed with `jax.vmap`/`shard_map` over θ batches instead
of thread-checkout (SURVEY §2.K), so the pool simply hands out the shared
workspace — it is stateless and safe by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from .gmrf import GMRF
from .solvers.base import SolverSpec, factorize
from .sparse.matrix import SparseMatrix
from .sparse.pattern import SparsePattern, diag_pattern, union_patterns

__all__ = ["GMRFWorkspace", "WorkspacePool", "make_workspace", "make_workspace_pool"]


def _precision_of(g) -> SparseMatrix:
    pm = g.precision_matrix
    return pm() if callable(pm) else pm


@dataclasses.dataclass
class GMRFWorkspace:
    """Holds the frozen joint pattern (prior ∪ observation-Hessian) and the
    resolved solver spec. All methods are pure; the 'reuse' is the static
    pattern ⇒ XLA compile-cache hit."""

    model: Any
    pattern: SparsePattern
    solver: SolverSpec = dataclasses.field(default_factory=SolverSpec)

    # --- reference parity: update_precision!/ensure_numeric! fuse into one
    # pure call; invalidation flags are unnecessary (no mutable state). ---
    def factorize(self, Q: SparseMatrix):
        """Numeric factorization of Q padded to the workspace pattern.
        Symbolic work is amortized across calls by pattern identity."""
        return factorize(Q.pad_to(self.pattern), self.solver)

    def evaluate(self, **theta) -> GMRF:
        """Materialize the latent model at θ on the workspace pattern
        (reference `(model)(ws; θ...)` fast path,
        latent_model_integration.jl:151-179)."""
        g = self.model(**theta)
        Q = _precision_of(g).pad_to(self.pattern)
        if isinstance(g, GMRF):
            return GMRF.from_precision(g.mean, Q, self.solver)
        # constrained models: rebuild around the padded precision
        inner = GMRF.from_precision(g.mean, Q, self.solver)
        if hasattr(g, "A") and hasattr(g, "e"):
            from .constrained import ConstrainedGMRF

            return ConstrainedGMRF.create(inner, g.A, g.e)
        return inner


class WorkspacePool:
    """API-parity pool (reference src/workspace/workspace_pool.jl:44-62).
    Stateless on TPU: `checkout` returns the shared workspace (it is pure),
    and batched θ evaluation should prefer `jax.vmap` over the pool."""

    def __init__(self, workspace: GMRFWorkspace, size: int = 1):
        self.workspace = workspace
        self.size = size

    def checkout(self) -> GMRFWorkspace:
        return self.workspace

    def checkin(self, ws: GMRFWorkspace) -> None:
        pass

    def with_workspace(self, fn):
        return fn(self.workspace)

    def batch_evaluate(self, fn, batch_size: int | None = None, **theta_arrays):
        """The TPU-native replacement for thread-checkout parallelism: one
        vmapped dispatch over a θ batch. `fn(gmrf) -> pytree` is evaluated at
        every θ (arrays of matching leading dim) in a single compiled call —
        this is the batching the pool docstring recommends instead of the
        reference's per-thread workspaces (workspace_pool.jl:44-62).
        `batch_size` bounds peak memory by scanning vmapped chunks
        (`lax.map(..., batch_size=...)`)."""
        import jax
        import jax.numpy as jnp

        names = sorted(theta_arrays)
        stacked = [jnp.asarray(theta_arrays[k]) for k in names]

        def one(vals):
            g = self.workspace.evaluate(**dict(zip(names, vals)))
            return fn(g)

        if batch_size is None:
            return jax.vmap(one)(stacked)
        return jax.lax.map(one, stacked, batch_size=batch_size)


def make_workspace(
    model,
    obs_hessian: str | SparsePattern | None = "diag",
    solver: SolverSpec | None = None,
    **theta_ref,
) -> GMRFWorkspace:
    """Build a workspace whose pattern is the prior pattern ∪ the
    observation-Hessian pattern, so Newton iterations of
    `gaussian_approximation` never change sparsity (reference
    latent_model_integration.jl:116-134).

    obs_hessian: "diag" (conditionally-independent likelihoods — the
    common case), an explicit SparsePattern (e.g. AᵀA for linearly
    transformed observations), or None.
    """
    if not theta_ref:
        theta_ref = {h: 1.0 for h in getattr(model, "hyperparameters", ())}
    g = model(**theta_ref)
    pat = _precision_of(g).pattern
    n = pat.shape[0]
    if obs_hessian == "diag":
        pat = union_patterns(pat, diag_pattern(n))
    elif isinstance(obs_hessian, SparsePattern):
        pat = union_patterns(pat, obs_hessian)
    spec = solver if solver is not None else SolverSpec()
    return GMRFWorkspace(model=model, pattern=pat, solver=spec.resolve(pat))


def make_workspace_pool(model, size: int = 1, **kw) -> WorkspacePool:
    return WorkspacePool(make_workspace(model, **kw), size=size)
