"""Supernodal sparse Cholesky backend — general unstructured patterns.

This is the TPU-native replacement for CHOLMOD's supernodal factorization +
SelectedInversion.jl's Takahashi recursion (reference:
src/workspace/backend.jl:24-182, src/solvers/selinv.jl:70-138), designed
for XLA rather than translated:

* **Host symbolic, once per pattern** (native C++ core, `tpu_gmrf.native`):
  AMD fill-reducing ordering → elimination tree → postorder → column counts
  → L fill pattern → fundamental supernode partition. The result is a frozen
  plan of static index maps (gather/scatter tables), cached per pattern.

* **Device numeric, per value vector**: a right-looking factorization over
  the supernode DAG, *level-scheduled* — supernodes at the same elimination-
  tree depth are independent, so each level is ONE batch of padded dense
  MXU ops (Cholesky of diagonal blocks, triangular panel solves, Schur
  rank-k updates) glued by fixed-shape gather/scatter into a flat CSC value
  array. Irregular supernode sizes are bucketed into pow-2 size classes so
  XLA compiles a handful of kernels per level.

* **Selected inversion** runs the same schedule backwards: the block
  Takahashi recursion Σ_RJ = −Σ_RR·C, Σ_JJ = L_D⁻ᵀL_D⁻¹ + CᵀΣ_RR·C with
  C = L_B L_D⁻¹, reusing the factorization's Schur gather tables (rows R of
  a supernode form a clique in the filled graph, so every (R_p, R_q) entry
  exists in L's pattern).

f32 robustness: Jacobi equilibration Q' = S·Q·S exactly as the dense
backend; logdet/solves/selinv are corrected analytically. On TPU every
matmul in the factorization/solve/Takahashi schedule runs at
`default_matmul_precision("highest")` — the MXU's default bf16 passes lose
~16 mantissa bits, which breaks Cholesky on the ill-conditioned Matérn
precisions this backend exists for (observed: NaN logdet at n≈16k, α=2).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from ..sparse.matrix import SparseMatrix
from ..sparse.pattern import SparsePattern
from .base import mxu_f32

__all__ = ["SupernodalFactor", "supernodal_factorize", "supernodal_plan"]

_PLAN_CACHE: dict = {}

_SELINV_CACHE: dict = {}


def _pow2_pad(x: int, floor: int = 8) -> int:
    if x <= 0:
        return 0
    p = floor
    while p < x:
        p *= 2
    return p


def _amalgamate(parent, counts, sn_start_f, max_width):
    """Relaxed-supernode amalgamation (CHOLMOD-style).

    Merges a fundamental supernode chain into its parent when the explicit
    zeros introduced stay under a width-tiered fraction (w≤4 always; w≤16 at
    ≤80%; w≤48 at ≤10%; otherwise ≤5%). This is what keeps the level
    schedule shallow and the dense blocks MXU-sized at large n: nested-
    dissection separators collapse into single wide supernodes.

    Returns (sn_start_merged, top_first_col, m_merged) where top_first_col[s]
    is the first column of the parent-most fundamental constituent (whose
    below-supernode row set IS the merged supernode's row set, by the etree
    column-containment property) and m_merged[s] = |R_s|.
    """
    nf = len(sn_start_f) - 1
    first_f = sn_start_f[:-1].astype(np.int64)
    ns_f = (sn_start_f[1:] - sn_start_f[:-1]).astype(np.int64)
    m_f = counts[first_f].astype(np.int64) - ns_f  # |R| per fundamental
    csum = np.concatenate([[0], np.cumsum(counts.astype(np.int64))])

    # stack entries: [start_col, end_col, top_fund_idx, actual_nnz]
    st_s0 = np.empty(nf, np.int64)
    st_e1 = np.empty(nf, np.int64)
    st_top = np.empty(nf, np.int64)
    st_nnz = np.empty(nf, np.int64)
    top = -1
    for f in range(nf):
        s0 = int(first_f[f])
        e1 = s0 + int(ns_f[f])
        tf = f
        nnz = int(csum[e1] - csum[s0])
        while top >= 0:
            pe = int(st_e1[top])
            if pe != s0:
                break
            pcol = int(parent[pe - 1])
            if pcol < 0 or pcol >= e1:
                break  # last col of the stack top escapes this supernode
            w = e1 - int(st_s0[top])
            if w > max_width:
                break
            mR = int(m_f[tf])
            new_nnz = w * (w + 1) // 2 + w * mR
            act = nnz + int(st_nnz[top])
            z = 1.0 - act / new_nnz if new_nnz else 0.0
            ok = (
                w <= 4
                or (w <= 16 and z <= 0.8)
                or (w <= 48 and z <= 0.1)
                or z <= 0.05
            )
            if not ok:
                break
            s0 = int(st_s0[top])
            nnz = act
            top -= 1
        top += 1
        st_s0[top] = s0
        st_e1[top] = e1
        st_top[top] = tf
        st_nnz[top] = nnz
    nm = top + 1
    sn_start = np.empty(nm + 1, np.int64)
    sn_start[:nm] = st_s0[:nm]
    sn_start[nm] = st_e1[nm - 1] if nm else 0
    top_first = first_f[st_top[:nm]]
    m_merged = m_f[st_top[:nm]]
    return sn_start, top_first, m_merged


def _symbolic_core(pattern: SparsePattern, max_width: int, ordering: str):
    """Cheap shared symbolic stage: ordering, etree, counts, supernodes
    (fundamental + amalgamated), levels — everything needed both for the
    solver-choice heuristic and for the full plan. Cached separately from
    the (expensive) index-map build."""
    key = ("core", pattern, max_width, ordering)
    core = _PLAN_CACHE.get(key)
    if core is not None:
        return core

    from .. import native
    import scipy.sparse as sp

    n = pattern.shape[0]
    S = pattern.to_scipy_bool()
    S = ((S + S.T) > 0).tocsr()
    S.sort_indices()
    ap0 = S.indptr.astype(np.int32)
    ai0 = S.indices.astype(np.int32)

    # 1) fill-reducing ordering + postorder composition. Nested dissection
    #    for large mesh-like patterns (bounded-depth etree, wide dense
    #    separator supernodes); AMD for small/irregular ones.
    if ordering == "auto":
        ordering = "nd" if n > 16384 else "amd"
    if ordering == "nd":
        base = native.nd_order(n, ap0, ai0)
    else:
        base = native.amd_order(n, ap0, ai0)
    P = sp.csr_matrix(
        (np.ones(n, np.int8), (np.arange(n), base)), shape=(n, n)
    )
    Sp = (P @ S @ P.T).tocsr()
    Sp.sort_indices()
    parent0 = native.etree(
        n, Sp.indptr.astype(np.int32), Sp.indices.astype(np.int32)
    )
    post = native.postorder(parent0)
    perm = base[post]  # perm[k] = original index of permuted column k
    Pf = sp.csr_matrix(
        (np.ones(n, np.int8), (np.arange(n), perm)), shape=(n, n)
    )
    Sf = (Pf @ S @ Pf.T).tocsr()
    Sf.sort_indices()
    apf = Sf.indptr.astype(np.int32)
    aif = Sf.indices.astype(np.int32)

    # 2) etree / counts / fundamental supernodes on the final ordering
    parent = native.etree(n, apf, aif)
    counts = native.col_counts(n, apf, aif, parent)
    snode_f = native.supernode_partition(parent, counts, max_width)
    nsf = int(snode_f[-1]) + 1 if n else 0
    sn_start_f = np.zeros(nsf + 1, dtype=np.int64)
    np.add.at(sn_start_f, snode_f.astype(np.int64) + 1, 1)
    sn_start_f = np.cumsum(sn_start_f)

    # 3) relaxed amalgamation → merged supernodes with explicit-zero padding
    sn_start, top_first, m_all = _amalgamate(
        parent, counts, sn_start_f, max_width
    )
    nsuper = len(sn_start) - 1
    ns_all = sn_start[1:] - sn_start[:-1]
    snode = np.repeat(np.arange(nsuper, dtype=np.int64), ns_all)

    levels = np.zeros(nsuper, dtype=np.int64)
    sn_parent = np.full(nsuper, -1, dtype=np.int64)
    last_cols = sn_start[1:] - 1
    pcols = parent[last_cols]
    has_p = pcols != -1
    sn_parent[has_p] = snode[pcols[has_p]]
    for s in range(nsuper):
        p = sn_parent[s]
        if p != -1:
            levels[p] = max(levels[p], levels[s] + 1)
    nlevels = int(levels.max()) + 1 if nsuper else 0

    # amalgamated per-column counts and flops
    counts2 = (
        np.arange(n, dtype=np.int64) * -1
        + sn_start[snode + 1]
        + m_all[snode]
    )
    # bucket census (no index maps): (level, ns_pad, m_pad) classes
    bucket_keys = {
        (int(levels[s]), _pow2_pad(int(ns_all[s]), 4), _pow2_pad(int(m_all[s]), 8))
        for s in range(nsuper)
    }

    core = dict(
        perm=perm,
        apf=apf,
        aif=aif,
        parent=parent,
        counts=counts,
        counts2=counts2,
        snode=snode,
        sn_start=sn_start,
        top_first=top_first,
        m_all=m_all,
        levels=levels,
        nlevels=nlevels,
        nsuper=nsuper,
        nbuckets=len(bucket_keys),
        flops=float(np.sum(counts2.astype(np.float64) ** 2)),
    )
    _PLAN_CACHE[key] = core
    return core


def supernodal_symbolic_summary(
    pattern: SparsePattern, max_width: int = 2048, ordering: str = "auto"
):
    """(flops, nbuckets, nlevels, nsuper) — cheap, for solver selection."""
    core = _symbolic_core(pattern, max_width, ordering)
    return dict(
        flops=core["flops"],
        nbuckets=core["nbuckets"],
        nlevels=core["nlevels"],
        nsuper=core["nsuper"],
    )


def supernodal_plan(
    pattern: SparsePattern, max_width: int = 2048, ordering: str = "auto"
):
    """Build (and cache) the full symbolic plan for `pattern`.

    The plan targets the *amalgamated* fill pattern: each merged supernode
    stores a dense (w×w lower + m×w) panel in flat CSC order, including the
    explicit zeros amalgamation introduced. All index tables are built
    vectorized per supernode so the host cost is O(nnzL + Σ m²) — a one-off
    of a few seconds even at 10⁶ columns.
    """
    key = (pattern, max_width, ordering)
    plan = _PLAN_CACHE.get(key)
    if plan is not None:
        return plan

    from .. import native

    core = _symbolic_core(pattern, max_width, ordering)
    n = pattern.shape[0]
    perm = core["perm"]
    apf, aif = core["apf"], core["aif"]
    parent, counts = core["parent"], core["counts"]
    sn_start, levels = core["sn_start"], core["levels"]
    top_first, m_all = core["top_first"], core["m_all"]
    nsuper, nlevels = core["nsuper"], core["nlevels"]
    counts2 = core["counts2"]

    # fundamental fill — only needed to read each merged supernode's row set
    lp_f, li_f = native.symbolic_fill(n, apf, aif, parent, counts)

    # synthesize the amalgamated CSC fill: column j of supernode s holds
    # rows [j .. j1) followed by R_s (sorted, all > j1-1)
    lp = np.zeros(n + 1, dtype=np.int64)
    lp[1:] = np.cumsum(counts2)
    nnzL = int(lp[-1])
    li = np.empty(nnzL, dtype=np.int32)
    sn_rows: list = []
    for s in range(nsuper):
        j0 = int(sn_start[s])
        j1 = int(sn_start[s + 1])
        ns = j1 - j0
        jt = int(top_first[s])
        wt = j1 - jt
        R = li_f[lp_f[jt] + wt : lp_f[jt + 1]]
        m = len(R)
        sn_rows.append(R)
        base = lp[j0 : j0 + ns]  # (ns,) start offsets per column
        rr, cc = np.tril_indices(ns)
        li[base[cc] + (rr - cc)] = j0 + rr
        if m:
            c_arr = np.arange(ns, dtype=np.int64)
            idx = base[None, :] + (ns - c_arr)[None, :] + np.arange(m)[:, None]
            li[idx] = R[:, None]

    inv_perm = np.empty(n, dtype=np.int64)
    inv_perm[perm] = np.arange(n)

    # A(original canonical entries) -> vals scatter map (lower triangle only)
    pr = inv_perm[pattern.rows]
    pc = inv_perm[pattern.cols]
    lower = pr >= pc
    a_src = np.nonzero(lower)[0].astype(np.int32)
    lr = pr[lower]
    lc = pc[lower]
    # vectorized position lookup: key-sort (col, row) of L entries once,
    # then one batched searchsorted for all of A's lower entries
    col_of_entry = np.repeat(
        np.arange(n, dtype=np.int64), np.diff(lp).astype(np.int64)
    )
    entry_key = col_of_entry * n + li.astype(np.int64)  # sorted ascending
    a_dst = np.searchsorted(entry_key, lc.astype(np.int64) * n + lr).astype(
        np.int32
    )

    # bucket supernodes by (level, ns_pad, m_pad)
    buckets: dict = {}
    for s in range(nsuper):
        j0 = int(sn_start[s])
        ns = int(sn_start[s + 1]) - j0
        rows = sn_rows[s]  # R_s (strictly below the snode)
        m = len(rows)
        bk = (int(levels[s]), _pow2_pad(ns, 4), _pow2_pad(m, 8))
        buckets.setdefault(bk, []).append((j0, ns, rows))

    # build padded index tables per bucket
    level_buckets: list = [[] for _ in range(nlevels)]

    DUMMY = nnzL  # one dummy slot appended to vals
    NDUMMY = n  # dummy slot for length-(n+1) vectors

    for (lev, W, M), group in sorted(buckets.items()):
        Bn = len(group)
        panel_idx = np.full((Bn, W + M, W), DUMMY, dtype=np.int32)
        schur_idx = np.full((Bn, M, M), DUMMY, dtype=np.int32)
        cols_idx = np.full((Bn, W), NDUMMY, dtype=np.int32)
        rows_idx = np.full((Bn, M), NDUMMY, dtype=np.int32)
        col_mask = np.zeros((Bn, W), dtype=bool)
        for b, (j0, ns, rows) in enumerate(group):
            m = len(rows)
            cols_idx[b, :ns] = np.arange(j0, j0 + ns)
            col_mask[b, :ns] = True
            rows_idx[b, :m] = rows
            base = lp[j0 : j0 + ns]
            rr, cc = np.tril_indices(ns)
            # diagonal block: rows j0+c .. j0+ns-1 are the first entries
            panel_idx[b, rr, cc] = base[cc] + (rr - cc)
            if m:
                # off-diagonal rows R_s follow contiguously per column
                c_arr = np.arange(ns, dtype=np.int64)
                panel_idx[b, W : W + m, :ns] = (
                    base[None, :]
                    + (ns - c_arr)[None, :]
                    + np.arange(m)[:, None]
                )
                # all lower pairs (p >= q) at once via the global entry key
                pp, qq = np.tril_indices(m)
                keys = rows[qq].astype(np.int64) * n + rows[pp]
                schur_idx[b, pp, qq] = np.searchsorted(entry_key, keys)
        level_buckets[lev].append(
            dict(
                W=W,
                M=M,
                panel_idx=panel_idx,
                schur_idx=schur_idx,
                cols_idx=cols_idx,
                rows_idx=rows_idx,
                col_mask=col_mask,
            )
        )

    # the diagonal entry is emitted first in every column of L
    diag_pos = lp[:-1].astype(np.int32)

    plan = dict(
        n=n,
        nnzL=nnzL,
        perm=perm.astype(np.int32),
        inv_perm=inv_perm.astype(np.int32),
        lp=lp,
        li=li,
        a_src=a_src,
        a_dst=a_dst,
        entry_key=entry_key,
        diag_pos=diag_pos,
        level_buckets=level_buckets,
        nlevels=nlevels,
        nsuper=nsuper,
        flops=core["flops"],
    )
    _PLAN_CACHE[key] = plan
    return plan


def _tril_mask(W, dtype):
    return jnp.tril(jnp.ones((W, W), dtype=dtype))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SupernodalFactor:
    """L values on the fill pattern (flat CSC, + 1 dummy slot) with Jacobi
    scaling s: Q = (S⁻¹L)(S⁻¹L)ᵀ, S = diag(s), L from vals."""

    vals: Any  # (nnzL + 1,)
    s: Any  # (n,) equilibration
    meta: Any = dataclasses.field(metadata=dict(static=True))

    @property
    def plan(self):
        return _PLAN_CACHE[self.meta]

    @property
    def n(self):
        return self.plan["n"]

    # -- helpers ------------------------------------------------------------

    def _perm_vec(self, b):
        plan = self.plan
        bp = (self.s * b)[jnp.asarray(plan["perm"])]
        return jnp.concatenate([bp, jnp.zeros((1,), bp.dtype)])

    def _unperm_vec(self, xp, scale=True):
        plan = self.plan
        x = jnp.zeros(plan["n"], xp.dtype).at[jnp.asarray(plan["perm"])].set(
            xp[: plan["n"]]
        )
        return self.s * x if scale else x

    def _gather_panels(self, vals, bk):
        """Returns (Ld (B,W,W) lower w/ unit padded diag, Lb (B,M,W))."""
        panel = vals[bk["panel_idx"]]
        W = bk["W"]
        D = panel[:, :W, :]
        pad = (~bk["col_mask"]).astype(D.dtype)
        Ld = D + jax.vmap(jnp.diag)(pad)
        Lb = panel[:, W:, :]
        return Ld, Lb

    # -- factorization ------------------------------------------------------

    @staticmethod
    @mxu_f32
    def _factorize(Q: SparseMatrix, meta) -> "SupernodalFactor":
        plan = _PLAN_CACHE[meta]
        # Symmetrize (average both stored triangles) so ∂/∂data matches the
        # dense backend's convention: each stored entry gets Z_ij, not 2Z/0.
        data = 0.5 * (Q.data + Q.data[jnp.asarray(Q.pattern.transpose_perm)])
        d = data[jnp.asarray(Q.pattern.diag_positions)]
        s = jnp.where(d > 0, jax.lax.rsqrt(jnp.where(d > 0, d, 1.0)), 1.0)
        scaled = data * s[Q.pattern.rows] * s[Q.pattern.cols]
        vals = (
            jnp.zeros(plan["nnzL"] + 1, data.dtype)
            .at[jnp.asarray(plan["a_dst"])]
            .set(scaled[jnp.asarray(plan["a_src"])])
        )
        dt = data.dtype
        for lev in range(plan["nlevels"]):
            for bk in plan["level_buckets"][lev]:
                W = bk["W"]
                Dl, Bm = SupernodalFactor._gather_raw(vals, bk)
                # symmetrize lower-gathered diag block; pad cols get unit diag
                Dfull = Dl + jnp.swapaxes(Dl, -1, -2) - jax.vmap(jnp.diag)(
                    jnp.diagonal(Dl, axis1=-2, axis2=-1)
                )
                pad = (~bk["col_mask"]).astype(dt)
                Dfull = Dfull + jax.vmap(jnp.diag)(pad)
                Ld = jnp.linalg.cholesky(Dfull)
                # Lb = B L_D^{-T}  ==  (L_D^{-1} Bᵀ)ᵀ
                Lb = jnp.swapaxes(
                    jsl.solve_triangular(Ld, jnp.swapaxes(Bm, -1, -2), lower=True),
                    -1,
                    -2,
                )
                U = jnp.einsum("bik,bjk->bij", Lb, Lb)
                # zero padded cols of Ld before store (keep dummy slot clean-ish)
                Ld_store = Ld * (1.0 - jax.vmap(jnp.diag)(pad))
                newp = jnp.concatenate([Ld_store, Lb], axis=1)
                vals = vals.at[bk["panel_idx"]].set(newp)
                vals = vals.at[bk["schur_idx"]].add(-U)
                vals = vals.at[plan["nnzL"]].set(0.0)
        return SupernodalFactor(vals=vals, s=s, meta=meta)

    @staticmethod
    def _gather_raw(vals, bk):
        panel = vals[bk["panel_idx"]]
        W = bk["W"]
        return panel[:, :W, :], panel[:, W:, :]

    # -- solves -------------------------------------------------------------

    @mxu_f32
    def _forward(self, xp):
        """L y = b over the level schedule (ascending)."""
        plan = self.plan
        vals = self.vals
        for lev in range(plan["nlevels"]):
            for bk in plan["level_buckets"][lev]:
                Ld, Lb = self._gather_panels(vals, bk)
                bc = xp[bk["cols_idx"]][..., None]  # (B, W, 1)
                yc = jsl.solve_triangular(Ld, bc, lower=True)
                xp = xp.at[bk["cols_idx"]].set(yc[..., 0])
                upd = jnp.einsum("bmk,bko->bmo", Lb, yc)[..., 0]
                xp = xp.at[bk["rows_idx"]].add(-upd)
                xp = xp.at[plan["n"]].set(0.0)
        return xp

    @mxu_f32
    def _backward(self, xp):
        """Lᵀ x = z over the level schedule (descending)."""
        plan = self.plan
        vals = self.vals
        for lev in range(plan["nlevels"] - 1, -1, -1):
            for bk in plan["level_buckets"][lev]:
                Ld, Lb = self._gather_panels(vals, bk)
                zc = xp[bk["cols_idx"]]
                xr = xp[bk["rows_idx"]][..., None]
                rhs = zc - jnp.einsum("bmk,bmo->bko", Lb, xr)[..., 0]
                xc = jsl.solve_triangular(
                    Ld, rhs[..., None], lower=True, trans=1
                )[..., 0]
                xp = xp.at[bk["cols_idx"]].set(xc)
                xp = xp.at[plan["n"]].set(0.0)
        return xp

    def _solve1(self, b):
        xp = self._backward(self._forward(self._perm_vec(b)))
        return self._unperm_vec(xp)

    def solve(self, b: jnp.ndarray) -> jnp.ndarray:
        if b.ndim == 1:
            return self._solve1(b)
        return jax.vmap(self._solve1, in_axes=1, out_axes=1)(b)

    def forward_solve(self, b: jnp.ndarray) -> jnp.ndarray:
        """L x = S·b in the permuted basis (whitening); used via sqmahal-free
        paths. Returns in permuted coordinates un-permuted to original ids."""
        if b.ndim > 1:
            return jax.vmap(self.forward_solve, in_axes=1, out_axes=1)(b)
        xp = self._forward(self._perm_vec(b))
        return self._unperm_vec(xp, scale=False)

    def backward_solve(self, z: jnp.ndarray) -> jnp.ndarray:
        """Lᵀ x = z (isotropic z → sample with covariance Q⁻¹)."""
        if z.ndim > 1:
            return jax.vmap(self.backward_solve, in_axes=1, out_axes=1)(z)
        zp = jnp.concatenate([z[: self.n], jnp.zeros((1,), z.dtype)])
        xp = self._backward(zp)
        return self._unperm_vec(xp)

    @mxu_f32
    def sqrt_matvec(self, z: jnp.ndarray) -> jnp.ndarray:
        """(S⁻¹L) z — maps N(0, I) to N(0, Q)."""
        plan = self.plan
        vals = self.vals
        zp = jnp.concatenate([z, jnp.zeros((1,), z.dtype)])
        out = jnp.zeros(plan["n"] + 1, z.dtype)
        for lev in range(plan["nlevels"]):
            for bk in plan["level_buckets"][lev]:
                Ld, Lb = self._gather_panels(vals, bk)
                pad = (~bk["col_mask"]).astype(z.dtype)
                Ldz = Ld - jax.vmap(jnp.diag)(pad)
                zc = zp[bk["cols_idx"]][..., None]
                out = out.at[bk["cols_idx"]].add(
                    jnp.einsum("bik,bko->bio", Ldz, zc)[..., 0]
                )
                out = out.at[bk["rows_idx"]].add(
                    jnp.einsum("bmk,bko->bmo", Lb, zc)[..., 0]
                )
                out = out.at[plan["n"]].set(0.0)
        x = self._unperm_vec(out, scale=False)
        return x / self.s

    # -- statistics ---------------------------------------------------------

    def logdet(self) -> jnp.ndarray:
        plan = self.plan
        diag = self.vals[jnp.asarray(plan["diag_pos"])]
        return 2.0 * jnp.sum(jnp.log(diag)) - 2.0 * jnp.sum(jnp.log(self.s))

    @mxu_f32
    def _sigma_vals(self) -> jnp.ndarray:
        """Takahashi recursion: Σ entries on L's pattern (scaled basis)."""
        plan = self.plan
        vals = self.vals
        sig = jnp.zeros(plan["nnzL"] + 1, vals.dtype)
        for lev in range(plan["nlevels"] - 1, -1, -1):
            for bk in plan["level_buckets"][lev]:
                Ld, Lb = self._gather_panels(vals, bk)
                W = bk["W"]
                # C = L_B L_D^{-1}:  Cᵀ = L_D^{-T} L_Bᵀ
                Ct = jsl.solve_triangular(
                    Ld, jnp.swapaxes(Lb, -1, -2), lower=True, trans=1
                )
                G = sig[bk["schur_idx"]]
                Srr = G + jnp.swapaxes(G, -1, -2) - jax.vmap(jnp.diag)(
                    jnp.diagonal(G, axis1=-2, axis2=-1)
                )
                Srj = -jnp.einsum("bpq,bkq->bpk", Srr, Ct)  # (B, M, W)
                eye = jnp.broadcast_to(
                    jnp.eye(W, dtype=vals.dtype), Ld.shape
                )
                Ldinv = jsl.solve_triangular(Ld, eye, lower=True)
                Sjj = jnp.einsum("bki,bkj->bij", Ldinv, Ldinv) + jnp.einsum(
                    "bip,bpq,bjq->bij", Ct, Srr, Ct
                )
                tril = _tril_mask(W, vals.dtype)
                newp = jnp.concatenate([Sjj * tril, Srj], axis=1)
                sig = sig.at[bk["panel_idx"]].set(newp)
                sig = sig.at[plan["nnzL"]].set(0.0)
        return sig

    def selinv_diag(self) -> jnp.ndarray:
        sig = self._sigma_vals()
        plan = self.plan
        dp = sig[jnp.asarray(plan["diag_pos"])]  # permuted order
        d = jnp.zeros(plan["n"], dp.dtype).at[jnp.asarray(plan["perm"])].set(dp)
        return self.s**2 * d

    def _selinv_positions(self, pattern: SparsePattern) -> np.ndarray:
        key = (self.meta, pattern)
        posv = _SELINV_CACHE.get(key)
        if posv is None:
            plan = self.plan
            n = plan["n"]
            entry_key = plan["entry_key"]
            pr = plan["inv_perm"][pattern.rows].astype(np.int64)
            pc = plan["inv_perm"][pattern.cols].astype(np.int64)
            lo = np.minimum(pr, pc)
            hi = np.maximum(pr, pc)
            keys = lo * n + hi
            posv = np.searchsorted(entry_key, keys)
            if np.any(posv >= len(entry_key)) or np.any(
                entry_key[np.minimum(posv, len(entry_key) - 1)] != keys
            ):
                raise ValueError(
                    "selinv pattern entry outside the Cholesky fill pattern"
                )
            posv = posv.astype(np.int32)
            _SELINV_CACHE[key] = posv
        return posv

    def selinv(self, pattern: SparsePattern) -> SparseMatrix:
        posv = self._selinv_positions(pattern)
        sig = self._sigma_vals()
        vals = (
            sig[jnp.asarray(posv)]
            * self.s[pattern.rows]
            * self.s[pattern.cols]
        )
        return SparseMatrix(vals, pattern)

    def selinv_dot(self, other: SparseMatrix) -> jnp.ndarray:
        z = self.selinv(other.pattern)
        return jnp.sum(z.data * other.data, axis=-1)


def supernodal_factorize(
    Q: SparseMatrix, max_width: int = 2048, ordering: str = "auto"
) -> SupernodalFactor:
    if not Q.pattern.is_symmetric:
        raise ValueError("supernodal backend requires a symmetric pattern")
    supernodal_plan(Q.pattern, max_width, ordering)  # ensure cached
    return SupernodalFactor._factorize(Q, (Q.pattern, max_width, ordering))
