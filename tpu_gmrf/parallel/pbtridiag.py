"""Distributed block-tridiagonal solves over a device mesh.

The joint precision of a spatiotemporal GMRF is block-tridiagonal over Nt
time slices (reference ext/.../linear_ssm.jl:93-101; lazy operator
src/linear_maps/symmetric_block_tridiagonal.jl). The reference factors it
with CHOLMOD on one host; here the time axis is **sharded**: each device
owns a contiguous chunk of time slices and the system is solved by
substructuring (the SPIKE / partition method, the standard distributed
tridiagonal algorithm):

1. *Local elimination* (per device, no comms): block-Cholesky scan on the
   chunk's interior slices, solving three RHS groups at once — the local
   right-hand side and the two coupling columns to the chunk boundaries —
   batched (T-1)·ns³ MXU work.
2. *Reduced interface system*: one `ppermute` neighbor exchange builds a
   P-block tridiagonal Schur system over the chunk-boundary slices; it is
   `all_gather`-ed (P·ns² floats — tiny) and solved redundantly on every
   device, avoiding a second round-trip.
3. *Back substitution* (local): interiors recovered from the stored
   elimination products.

Collectives used: `ppermute` (neighbor halo), `all_gather` (interface
system), `psum` (logdet reduction) — all ride ICI inside a slice.

Block convention matches `SymmetricBlockTridiagonalMap`: `diag[t]` is
Q[t,t] (ns×ns), `sub[t]` is Q[t+1,t]; `sub` is passed padded to Nt entries
so it shards evenly (the last entry is ignored).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from ..solvers.base import mxu_f32

__all__ = [
    "pbtridiag_solve",
    "pbtridiag_logdet",
    "sharded_block_tridiag_solver",
]


# ---------------------------------------------------------------------------
# Local (single-shard) block-tridiagonal Cholesky: scan of dense MXU ops.
# ---------------------------------------------------------------------------


@mxu_f32
def _bt_chol(Dg, E):
    """Block Cholesky of a block-tridiag SPD matrix.

    Dg: (m, ns, ns) diagonal blocks; E: (m-1, ns, ns) sub blocks
    (E[t] = A[t+1, t]). Returns (Lk (m,ns,ns) lower, Mk (m-1,ns,ns)).
    """

    def step(carry, inp):
        M_prev = carry  # M_{k-1} = E_{k-1} L_{k-1}^{-T}, or zeros for k=0
        D_k, E_k = inp
        L_k = jnp.linalg.cholesky(D_k - M_prev @ M_prev.T)
        # M_k = E_k L_k^{-T}
        M_k = jsl.solve_triangular(L_k, E_k.T, lower=True).T
        return M_k, (L_k, M_k)

    # inits/pads derived from the (possibly axis-varying) inputs so scan
    # carry VMA types match inside shard_map
    E_pad = jnp.concatenate([E, Dg[:1] * 0.0])
    _, (Lk, Mk) = jax.lax.scan(step, Dg[0] * 0.0, (Dg, E_pad))
    return Lk, Mk[:-1]


@mxu_f32
def _bt_solve_factored(Lk, Mk, B):
    """Solve A x = B given the block factorization; B: (m, ns, k)."""
    ns = Lk.shape[1]

    def fwd(y_prev, inp):
        L_k, M_prev, b_k = inp
        y_k = jsl.solve_triangular(L_k, b_k - M_prev @ y_prev, lower=True)
        return y_k, y_k

    M_pad = jnp.concatenate([Lk[:1] * 0.0, Mk])
    _, ys = jax.lax.scan(fwd, B[0] * 0.0, (Lk, M_pad, B))

    def bwd(x_next, inp):
        L_k, M_k, y_k = inp
        x_k = jsl.solve_triangular(
            L_k, y_k - M_k.T @ x_next, lower=True, trans=1
        )
        return x_k, x_k

    M_pad2 = jnp.concatenate([Mk, Lk[:1] * 0.0])
    _, xs = jax.lax.scan(bwd, B[0] * 0.0, (Lk, M_pad2, ys), reverse=True)
    return xs


def _reduced_solve(alpha, beta, gamma, r):
    """Sequential block-tridiag solve of the P-row interface system (runs
    redundantly on every device; P·ns³ work). Returns (s (P,ns), logdet)."""

    def fwd(carry, inp):
        C_prev, y_prev = carry
        a_d, b_d, g_prev, r_d = inp
        # W = a_d C_prev^{-1}; C_prev = Lc Lcᵀ
        Lc = jnp.linalg.cholesky(C_prev)
        Wt = jsl.solve_triangular(
            Lc, jsl.solve_triangular(Lc, a_d.T, lower=True), lower=True, trans=1
        )  # C_prev^{-1} a_dᵀ
        C_d = b_d - Wt.T @ g_prev
        y_d = r_d - Wt.T @ y_prev
        return (C_d, y_d), (C_d, y_d)

    Pn, ns = beta.shape[0], beta.shape[1]
    eye = jnp.eye(ns, dtype=beta.dtype)
    # dummy identity pivot so row 0 passes through unchanged; inits derived
    # from the inputs so VMA types match under shard_map
    init = (eye + beta[0] * 0.0, r[0] * 0.0)
    gamma_prev = jnp.concatenate([gamma[:1] * 0.0, gamma[:-1]])
    alpha0 = alpha.at[0].set(alpha[0] * 0.0)
    _, (C, y) = jax.lax.scan(fwd, init, (alpha0, beta, gamma_prev, r))

    def bwd(s_next, inp):
        C_d, y_d, g_d = inp
        Lc = jnp.linalg.cholesky(C_d)
        rhs = y_d - g_d @ s_next
        s_d = jsl.solve_triangular(
            Lc, jsl.solve_triangular(Lc, rhs, lower=True), lower=True, trans=1
        )
        return s_d, s_d

    gamma_pad = jnp.concatenate([gamma[:-1], gamma[:1] * 0.0])
    _, s = jax.lax.scan(bwd, r[0] * 0.0, (C, y, gamma_pad), reverse=True)
    Lall = jnp.linalg.cholesky(C)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(Lall, axis1=-2, axis2=-1))
    )
    return s, logdet


# ---------------------------------------------------------------------------
# The sharded kernel (runs inside shard_map over axis `ax`).
# ---------------------------------------------------------------------------


@mxu_f32
def _shard_kernel(diag, sub, b, ax):
    """Per-device: diag (T, ns, ns), sub (T, ns, ns), b (T, ns).

    Returns (x_local (T, ns), logdet_contrib (scalar, already psummed)).
    """
    T, ns = diag.shape[0], diag.shape[1]
    nd = jax.lax.axis_size(ax)
    d = jax.lax.axis_index(ax)
    dt = diag.dtype

    # halo: sub-block coupling to the previous chunk = left neighbor's
    # sub[T-1]  (shift right: device i sends to i+1)
    right = [(i, (i + 1) % nd) for i in range(nd)]
    left = [(i, (i - 1) % nd) for i in range(nd)]
    sub_left = jax.lax.ppermute(sub[T - 1], ax, right)  # Q[t0, t0-1]
    sub_left = jnp.where(d == 0, jnp.zeros_like(sub_left), sub_left)

    # ---- local interior elimination (interior = first T-1 slices) --------
    Dg = diag[: T - 1]
    E = sub[: T - 2] if T > 2 else jnp.zeros((0, ns, ns), dt)
    Lk, Mk = _bt_chol(Dg, E)
    # RHS group: [b_u | L-coupling | R-coupling] — one batched solve
    B = jnp.zeros((T - 1, ns, 1 + 2 * ns), dt) + b[:1, :1, None] * 0.0
    B = B.at[:, :, 0].set(b[: T - 1])
    B = B.at[0, :, 1 : 1 + ns].set(sub_left)  # e_first ⊗ Q[t0, t0-1]
    B = B.at[T - 2, :, 1 + ns :].set(sub[T - 2].T)  # e_last ⊗ Q[t1, t1-1]ᵀ
    X = _bt_solve_factored(Lk, Mk, B)
    g = X[:, :, 0]  # (T-1, ns)
    GL = X[:, :, 1 : 1 + ns]  # (T-1, ns, ns)
    GR = X[:, :, 1 + ns :]  # (T-1, ns, ns)

    # ---- neighbor exchange: first-interior products of the RIGHT chunk ---
    g_first_next = jax.lax.ppermute(g[0], ax, left)
    GL_first_next = jax.lax.ppermute(GL[0], ax, left)
    GR_first_next = jax.lax.ppermute(GR[0], ax, left)
    is_last = d == nd - 1
    g_first_next = jnp.where(is_last, jnp.zeros_like(g_first_next), g_first_next)
    GL_first_next = jnp.where(is_last, jnp.zeros_like(GL_first_next), GL_first_next)
    GR_first_next = jnp.where(is_last, jnp.zeros_like(GR_first_next), GR_first_next)

    # ---- reduced interface equation for s_d = x[t1] -----------------------
    Eb = sub[T - 2]  # Q[t1, t1-1]
    En = sub[T - 1]  # Q[t1+1, t1]  (garbage on last device — masked)
    En = jnp.where(is_last, jnp.zeros_like(En), En)
    alpha_d = -Eb @ GL[T - 2]
    beta_d = diag[T - 1] - Eb @ GR[T - 2] - En.T @ GL_first_next
    gamma_d = -En.T @ GR_first_next
    r_d = b[T - 1] - Eb @ g[T - 2] - En.T @ g_first_next

    # ---- gather + redundant reduced solve ---------------------------------
    alpha = jax.lax.all_gather(alpha_d, ax)  # (P, ns, ns)
    beta = jax.lax.all_gather(beta_d, ax)
    gamma = jax.lax.all_gather(gamma_d, ax)
    r = jax.lax.all_gather(r_d, ax)
    s, logdet_S = _reduced_solve(alpha, beta, gamma, r)

    s_prev = jnp.where(d == 0, jnp.zeros((ns,), dt), s[jnp.maximum(d - 1, 0)])
    s_own = s[d]

    # ---- local back substitution ------------------------------------------
    u = g - GL @ s_prev - GR @ s_own
    x_local = jnp.concatenate([u, s_own[None]], axis=0)

    # ---- logdet: local interior factors + reduced system ------------------
    local_ld = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lk, axis1=-2, axis2=-1)))
    logdet = jax.lax.psum(local_ld, ax) + logdet_S
    # every device holds the identical value, but logdet_S is typed as
    # axis-varying (it came through all_gather); emit one copy per device
    # and let the caller read chunk 0.
    return x_local, logdet[None]


def _pbtridiag(diag, sub, b, mesh, axis_name):
    from jax import shard_map

    spec_blocks = P(axis_name, None, None)
    spec_vec = P(axis_name, None)

    fn = shard_map(
        partial(_shard_kernel, ax=axis_name),
        mesh=mesh,
        in_specs=(spec_blocks, spec_blocks, spec_vec),
        out_specs=(spec_vec, P(axis_name)),
    )
    x, ld = fn(diag, sub, b)
    return x, ld[0]


def _prep(diag, sub, b, mesh, axis_name):
    nd = mesh.shape[axis_name]
    Nt, ns = diag.shape[0], diag.shape[1]
    if Nt % nd != 0:
        raise ValueError(f"Nt={Nt} must be divisible by mesh axis size {nd}")
    if Nt // nd < 2:
        raise ValueError("need at least 2 time slices per device")
    if sub.shape[0] == Nt - 1:  # pad so the array shards evenly
        sub = jnp.concatenate([sub, jnp.zeros((1, ns, ns), sub.dtype)])
    elif sub.shape[0] != Nt:
        raise ValueError("sub must have Nt-1 (or padded Nt) blocks")
    return diag, sub, b


def pbtridiag_solve(diag, sub, b, mesh: Mesh, axis_name: str = "time"):
    """Solve the block-tridiagonal SPD system Q x = b with the time axis
    sharded over `mesh`'s `axis_name`.

    diag: (Nt, ns, ns); sub: (Nt-1, ns, ns) with sub[t] = Q[t+1, t];
    b: (Nt, ns). Returns x: (Nt, ns)."""
    diag, sub, b = _prep(diag, sub, b, mesh, axis_name)
    x, _ = _pbtridiag(diag, sub, b, mesh, axis_name)
    return x


def pbtridiag_logdet(diag, sub, mesh: Mesh, axis_name: str = "time"):
    """log det Q of the sharded block-tridiagonal SPD matrix."""
    Nt, ns = diag.shape[0], diag.shape[1]
    b = jnp.zeros((Nt, ns), diag.dtype)
    diag, sub, b = _prep(diag, sub, b, mesh, axis_name)
    _, ld = _pbtridiag(diag, sub, b, mesh, axis_name)
    return ld


def sharded_block_tridiag_solver(mesh: Mesh, axis_name: str = "time"):
    """Returns a `solve(diag, sub, b)` closure bound to a mesh — drop-in for
    CG/preconditioner call sites on spatiotemporal systems."""

    def solve(diag, sub, b):
        return pbtridiag_solve(diag, sub, b, mesh, axis_name)

    return solve
