"""Distributed block-tridiagonal solver (time-axis sharding, SPIKE).

Runs on the 8-virtual-device CPU mesh from conftest; oracle is the dense
assembled matrix.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpu_gmrf.parallel import pbtridiag_logdet, pbtridiag_solve


def _random_bt_spd(rng, Nt, ns):
    diag = rng.normal(size=(Nt, ns, ns))
    diag = diag @ np.swapaxes(diag, -1, -2) + 1e-1 * np.eye(ns)
    sub = 0.1 * rng.normal(size=(Nt - 1, ns, ns))
    # diagonal dominance for SPD
    for t in range(Nt):
        bump = 0.0
        if t > 0:
            bump += np.abs(sub[t - 1]).sum()
        if t < Nt - 1:
            bump += np.abs(sub[t]).sum()
        diag[t] += (bump + ns) * np.eye(ns)
    return diag, sub


def _dense(diag, sub):
    Nt, ns = diag.shape[0], diag.shape[1]
    A = np.zeros((Nt * ns, Nt * ns))
    for t in range(Nt):
        A[t * ns : (t + 1) * ns, t * ns : (t + 1) * ns] = diag[t]
    for t in range(Nt - 1):
        A[(t + 1) * ns : (t + 2) * ns, t * ns : (t + 1) * ns] = sub[t]
        A[t * ns : (t + 1) * ns, (t + 1) * ns : (t + 2) * ns] = sub[t].T
    return A


@pytest.fixture
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("time",))


@pytest.mark.parametrize(
    "Nt,ns",
    [
        pytest.param(16, 3, marks=pytest.mark.slow),
        pytest.param(32, 5, marks=pytest.mark.slow),
        (16, 1),
    ],
)
def test_pbtridiag_solve_matches_dense(mesh, rng, Nt, ns):
    diag, sub = _random_bt_spd(rng, Nt, ns)
    A = _dense(diag, sub)
    b = rng.normal(size=(Nt, ns))
    x = pbtridiag_solve(
        jnp.asarray(diag), jnp.asarray(sub), jnp.asarray(b), mesh
    )
    expected = np.linalg.solve(A, b.ravel()).reshape(Nt, ns)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-8)


@pytest.mark.slow
def test_pbtridiag_logdet_matches_dense(mesh, rng):
    Nt, ns = 24, 4
    diag, sub = _random_bt_spd(rng, Nt, ns)
    A = _dense(diag, sub)
    ld = pbtridiag_logdet(jnp.asarray(diag), jnp.asarray(sub), mesh)
    _, expected = np.linalg.slogdet(A)
    np.testing.assert_allclose(float(ld), expected, rtol=1e-10)


def test_pbtridiag_jit_and_grad(mesh, rng):
    """The sharded solve composes with jit and reverse-mode AD."""
    Nt, ns = 16, 2
    diag, sub = _random_bt_spd(rng, Nt, ns)
    b = rng.normal(size=(Nt, ns))

    @jax.jit
    def qform(diag_, b_):
        x = pbtridiag_solve(diag_, jnp.asarray(sub), b_, mesh)
        return jnp.sum(x * b_)  # bᵀ Q⁻¹ b

    v = qform(jnp.asarray(diag), jnp.asarray(b))
    A = _dense(diag, sub)
    expected = b.ravel() @ np.linalg.solve(A, b.ravel())
    np.testing.assert_allclose(float(v), expected, rtol=1e-9)
    g = jax.grad(qform, argnums=1)(jnp.asarray(diag), jnp.asarray(b))
    # d(bᵀQ⁻¹b)/db = 2 Q⁻¹ b
    np.testing.assert_allclose(
        np.asarray(g).ravel(), 2 * np.linalg.solve(A, b.ravel()), atol=1e-8
    )


def test_pbtridiag_validates_shapes(mesh, rng):
    diag, sub = _random_bt_spd(rng, 9, 2)
    with pytest.raises(ValueError):
        pbtridiag_solve(
            jnp.asarray(diag), jnp.asarray(sub), jnp.zeros((9, 2)), mesh
        )


def test_supernodal_tp_factorize_matches_single(rng):
    """TP first step (SURVEY §2.K TP row): class-batch panel work sharded
    over the mesh must reproduce the single-device factorization up to f32
    reduction/partition order (observed ≤1 ulp) with identical logdet, and
    the staged multi-dispatch path must be bitwise identical."""
    import dataclasses

    import scipy.sparse as sp

    from tpu_gmrf.sparse.matrix import SparseMatrix
    from tpu_gmrf.sparse.pattern import SparsePattern
    from tpu_gmrf.solvers.supernodal import (
        supernodal_factorize,
        supernodal_factorize_staged,
        supernodal_selinv_diag_staged,
    )

    m = 28
    n = m * m
    idx = np.arange(n).reshape(m, m)
    pairs = np.concatenate(
        [
            np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], 1),
            np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], 1),
        ]
    )
    W = sp.csr_matrix(
        (np.ones(len(pairs)), (pairs[:, 0], pairs[:, 1])), shape=(n, n)
    )
    L = sp.diags(np.asarray(W.sum(axis=1)).ravel()) - W
    K = (2.0 * sp.eye(n) + L).tocsr()
    Qs = (K.T @ K).tocoo()
    pat = SparsePattern(Qs.row, Qs.col, (n, n))
    Q = SparseMatrix(jnp.asarray(Qs.data[pat.sort_order], jnp.float32), pat)

    f = supernodal_factorize(Q)
    mesh = Mesh(np.array(jax.devices()[:8]), ("snode",))
    ftp = supernodal_factorize(Q, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(ftp.vals), np.asarray(f.vals), rtol=0, atol=2e-6
    )
    assert float(f.logdet()) == pytest.approx(float(ftp.logdet()), rel=1e-7)

    # staged = same ops in separate compilation units; XLA fusion choices
    # may differ by an ulp per op, so "identical" means ≤ f32 noise
    fs = supernodal_factorize_staged(Q)
    np.testing.assert_allclose(
        np.asarray(fs.vals), np.asarray(f.vals), rtol=0, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(supernodal_selinv_diag_staged(fs)),
        np.asarray(f.selinv_diag()),
        rtol=1e-5,
        atol=1e-6,
    )
