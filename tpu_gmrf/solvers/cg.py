"""Preconditioned conjugate gradients + preconditioners for large
spatiotemporal systems.

Reference specs: src/preconditioners/ — FullCholeskyPreconditioner,
BlockJacobiPreconditioner, temporal block Gauss-Seidel
(tridiag_block_gauss_seidel.jl) for CG on block-tridiagonal space-time
precisions. TPU-native: CG is a `lax.while_loop` of sparse matvecs
(segment-sums) — bandwidth-bound, vmappable over multiple RHS.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.matrix import SparseMatrix

__all__ = [
    "cg_solve",
    "full_cholesky_preconditioner",
    "jacobi_preconditioner",
    "block_jacobi_preconditioner",
    "temporal_block_gauss_seidel_preconditioner",
]


def cg_solve(
    matvec: Callable,
    b: jnp.ndarray,
    preconditioner: Callable | None = None,
    x0=None,
    tol: float = 1e-6,
    max_iter: int = 1000,
):
    """Solve A x = b (A SPD) by preconditioned CG. Returns (x, iterations,
    relative residual)."""
    M = preconditioner if preconditioner is not None else (lambda r: r)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = M(r)
    p = z
    rz = jnp.vdot(r, z)
    bnorm = jnp.linalg.norm(b)

    def cond(state):
        x, r, p, rz, it = state
        return (jnp.linalg.norm(r) > tol * jnp.maximum(bnorm, 1e-30)) & (it < max_iter)

    def body(state):
        x, r, p, rz, it = state
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    x, r, p, rz, it = jax.lax.while_loop(cond, body, (x, r, p, rz, 0))
    return x, it, jnp.linalg.norm(r) / jnp.maximum(bnorm, 1e-30)


def jacobi_preconditioner(Q: SparseMatrix) -> Callable:
    dinv = 1.0 / Q.diagonal()
    return lambda r: dinv * r


def block_jacobi_preconditioner(Q: SparseMatrix, block_size: int) -> Callable:
    """Dense-inverts contiguous diagonal blocks (pad last block)."""
    n = Q.shape[0]
    nb = -(-n // block_size)
    Qd = Q.todense()
    pad = nb * block_size - n
    Qp = jnp.pad(Qd, ((0, pad), (0, pad))) + jnp.pad(
        jnp.zeros((n, n), Qd.dtype), ((0, pad), (0, pad))
    )
    if pad:
        Qp = Qp.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
    blocks = jnp.stack(
        [
            Qp[i * block_size : (i + 1) * block_size, i * block_size : (i + 1) * block_size]
            for i in range(nb)
        ]
    )
    chols = jnp.linalg.cholesky(blocks)

    def apply(r):
        rp = jnp.pad(r, (0, pad)).reshape(nb, block_size)
        y = jax.vmap(
            lambda L, v: jax.scipy.linalg.cho_solve((L, True), v)
        )(chols, rp)
        return y.reshape(-1)[:n]

    return apply


def temporal_block_gauss_seidel_preconditioner(
    Q: SparseMatrix, Ns: int, Nt: int, sweeps: int = 1
) -> Callable:
    """Symmetric block Gauss-Seidel over the time dimension of a
    block-tridiagonal space-time precision: extracts the Nt diagonal blocks
    (dense-factorized once, batched) and the sub-diagonal blocks, then runs
    forward+backward sweeps (reference tridiag_block_gauss_seidel.jl)."""
    Qd = Q.todense()
    diag_blocks = jnp.stack(
        [Qd[t * Ns : (t + 1) * Ns, t * Ns : (t + 1) * Ns] for t in range(Nt)]
    )
    sub_blocks = jnp.stack(
        [Qd[(t + 1) * Ns : (t + 2) * Ns, t * Ns : (t + 1) * Ns] for t in range(Nt - 1)]
    )
    chols = jnp.linalg.cholesky(diag_blocks)

    def solve_block(t, v):
        return jax.scipy.linalg.cho_solve((chols[t], True), v)

    def apply(r):
        rb = r.reshape(Nt, Ns)
        x = jnp.zeros_like(rb)
        for _ in range(sweeps):
            # forward sweep
            def fwd(t, x):
                rhs = rb[t] - jnp.where(t > 0, sub_blocks[jnp.maximum(t - 1, 0)] @ x[jnp.maximum(t - 1, 0)], 0.0)
                return x.at[t].set(solve_block(t, rhs))

            x = jax.lax.fori_loop(0, Nt, fwd, x)

            # backward sweep
            def bwd(i, x):
                t = Nt - 1 - i
                upper = jnp.where(
                    t < Nt - 1,
                    sub_blocks[jnp.minimum(t, Nt - 2)].T @ x[jnp.minimum(t + 1, Nt - 1)],
                    0.0,
                )
                rhs = rb[t] - jnp.where(t > 0, sub_blocks[jnp.maximum(t - 1, 0)] @ x[jnp.maximum(t - 1, 0)], 0.0) - upper
                return x.at[t].set(solve_block(t, rhs + jnp.where(t < Nt - 1, 0.0, 0.0)))

            # standard symmetric GS backward: x_t = D_t^{-1}(r_t - L x_{t-1} - U x_{t+1})
            x = jax.lax.fori_loop(0, Nt, bwd, x)
        return x.reshape(-1)

    return apply


def full_cholesky_preconditioner(Q: SparseMatrix, spec=None) -> Callable:
    """P = Q itself, applied via a full factorization — one CG iteration
    converges exactly; a building block for hybrid schemes (reference
    src/preconditioners/full_cholesky.jl:15-35). Uses the trace-time solver
    dispatch, so the factorization backend follows the pattern."""
    from .base import SolverSpec, factorize

    factor = factorize(Q, spec if spec is not None else SolverSpec())
    return lambda r: factor.solve(r)
