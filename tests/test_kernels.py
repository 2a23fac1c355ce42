"""Pallas kernel tests: BSR SpMV vs scipy/dense oracles, both the XLA
reference path and the Pallas kernel in interpreter mode (CPU-safe), plus
VJP correctness (cotangent equations dX = Aᵀg, dA_b = g_r x_cᵀ)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_gmrf.kernels import BSRMatrix, bsr_from_sparse
from tpu_gmrf.sparse import from_scipy

from conftest import random_sparse_spd


def _random_case(rng, n=100, k=3, density=0.05):
    A = random_sparse_spd(rng, n, density)
    As = from_scipy(A)
    x = rng.normal(size=(n, k))
    return A, As, jnp.asarray(x)


def test_bsr_reference_matches_scipy(rng):
    A, As, x = _random_case(rng)
    B = bsr_from_sparse(As, bs=16)
    y = np.asarray(B.matvec(x))
    np.testing.assert_allclose(y, A @ np.asarray(x), rtol=1e-10)

    # 1-D vector path
    v = jnp.asarray(rng.normal(size=A.shape[0]))
    np.testing.assert_allclose(np.asarray(B @ v), A @ np.asarray(v), rtol=1e-10)


def test_bsr_vjp(rng):
    A, As, x = _random_case(rng, n=48, k=2)
    B = bsr_from_sparse(As, bs=8)

    def f(blocks, x):
        from tpu_gmrf.kernels.bsr_spmv import bsr_spmv

        return jnp.sum(jnp.sin(bsr_spmv(blocks, x, B.plan)))

    g_b, g_x = jax.grad(f, argnums=(0, 1))(B.blocks, x)

    # numeric oracle via dense matmul
    Ad = jnp.asarray(A.toarray())

    def f_dense(Ad, x):
        return jnp.sum(jnp.sin(Ad @ x))

    gd_A, gd_x = jax.grad(f_dense, argnums=(0, 1))(Ad, x)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(gd_x), rtol=1e-8)

    # scatter dense cotangent into block layout and compare (blocks not on
    # the pattern get cotangent from the dense oracle only where blocked)
    plan = B.plan
    got = np.asarray(g_b)
    for b in range(plan.nblocks):
        r, c = plan.block_rows[b], plan.block_cols[b]
        sl = np.asarray(
            gd_A[r * plan.bs : (r + 1) * plan.bs, c * plan.bs : (c + 1) * plan.bs]
        )
        pad_r = sl.shape[0]
        np.testing.assert_allclose(got[b][:pad_r, : sl.shape[1]], sl, rtol=1e-8)




def test_bsr_nondivisible_n(rng):
    A, As, x = _random_case(rng, n=53, k=1)
    B = bsr_from_sparse(As, bs=16)
    np.testing.assert_allclose(np.asarray(B.matvec(x)), A @ np.asarray(x), rtol=1e-10)


def test_block_tridiag_matvec_matches_scipy(rng):
    from tpu_gmrf.solvers.banded import block_tridiag_matvec

    A, As, x = _random_case(rng, n=200, k=4, density=0.03)
    mv = block_tridiag_matvec(As)
    np.testing.assert_allclose(np.asarray(mv(x)), A @ np.asarray(x), rtol=1e-8)
    v = jnp.asarray(rng.normal(size=200))
    np.testing.assert_allclose(np.asarray(mv(v)), A @ np.asarray(v), rtol=1e-8)


def test_block_tridiag_matvec_as_jit_arg(rng):
    """The matvec is a pytree: D/E ride as jit ARGUMENTS (not baked-in
    constants), and gradients flow to the values."""
    from tpu_gmrf.solvers.banded import block_tridiag_matvec

    A, As, x = _random_case(rng, n=120, k=2)
    mv = block_tridiag_matvec(As)
    f = jax.jit(lambda m, v: jnp.sum(m(v) ** 2))
    val = float(f(mv, x))
    ref = float(jnp.sum(jnp.asarray(A @ np.asarray(x)) ** 2))
    np.testing.assert_allclose(val, ref, rtol=1e-8)
    g = jax.grad(lambda v: f(mv, v))(x)
    gd = jax.grad(lambda v: jnp.sum((jnp.asarray(A.toarray()) @ v) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd), rtol=1e-7)


def test_hot_matvec_dispatch(rng):
    from tpu_gmrf.kernels import hot_matvec
    from tpu_gmrf.solvers.banded import BlockTridiagMV

    A, As, x = _random_case(rng, n=300, k=2, density=0.02)
    # small nnz: plain matvec closure
    mv_small = hot_matvec(As, min_nnz=10**9)
    np.testing.assert_allclose(np.asarray(mv_small(x)), A @ np.asarray(x), rtol=1e-8)
    # force the dispatch path: banded-after-RCM pattern picks block-tridiag
    mv_hot = hot_matvec(As, min_nnz=1)
    np.testing.assert_allclose(np.asarray(mv_hot(x)), A @ np.asarray(x), rtol=1e-8)
