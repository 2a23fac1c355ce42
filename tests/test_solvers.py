import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_gmrf.sparse import from_scipy, from_dense
from tpu_gmrf.solvers import SolverSpec, factorize
from tests.conftest import random_sparse_spd


def _dense_oracle(S):
    A = S.toarray()
    L = np.linalg.cholesky(A)
    Ainv = np.linalg.inv(A)
    return A, L, Ainv


@pytest.mark.parametrize("kind", ["dense"])
def test_dense_backend(rng, kind):
    S = random_sparse_spd(rng, 40)
    A, L, Ainv = _dense_oracle(S)
    Q = from_scipy(S)
    f = factorize(Q, SolverSpec(kind=kind))

    b = rng.normal(size=40)
    np.testing.assert_allclose(np.asarray(f.solve(jnp.asarray(b))), Ainv @ b, rtol=1e-8)
    B = rng.normal(size=(40, 3))
    np.testing.assert_allclose(np.asarray(f.solve(jnp.asarray(B))), Ainv @ B, rtol=1e-8)
    np.testing.assert_allclose(float(f.logdet()), np.linalg.slogdet(A)[1], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(f.selinv_diag()), np.diag(Ainv), rtol=1e-8)
    z = rng.normal(size=40)
    np.testing.assert_allclose(
        np.asarray(f.backward_solve(jnp.asarray(z))),
        np.linalg.solve(L.T, z),
        rtol=1e-7,
    )
    Zs = f.selinv(Q.pattern)
    np.testing.assert_allclose(
        np.asarray(Zs.data), Ainv[Q.pattern.rows, Q.pattern.cols], rtol=1e-8
    )
    np.testing.assert_allclose(
        float(f.selinv_dot(Q)), np.sum(Ainv * A), rtol=1e-8
    )


def _tridiag_spd(rng, n):
    import scipy.sparse as sp

    a = rng.uniform(2.5, 4.0, size=n)
    c = rng.uniform(-1.0, 1.0, size=n - 1)
    return sp.diags([c, a, c], [-1, 0, 1]).tocsr()


def test_tridiag_backend(rng):
    n = 50
    S = _tridiag_spd(rng, n)
    A, L, Ainv = _dense_oracle(S)
    Q = from_scipy(S)
    spec = SolverSpec().resolve(Q.pattern)
    assert spec.kind == "tridiag"
    f = factorize(Q)

    b = rng.normal(size=n)
    np.testing.assert_allclose(np.asarray(f.solve(jnp.asarray(b))), Ainv @ b, rtol=1e-8)
    B = rng.normal(size=(n, 3))
    np.testing.assert_allclose(np.asarray(f.solve(jnp.asarray(B))), Ainv @ B, rtol=1e-8)
    np.testing.assert_allclose(float(f.logdet()), np.linalg.slogdet(A)[1], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(f.selinv_diag()), np.diag(Ainv), rtol=1e-8)
    z = rng.normal(size=n)
    np.testing.assert_allclose(
        np.asarray(f.backward_solve(jnp.asarray(z))), np.linalg.solve(L.T, z), rtol=1e-7
    )
    # sqrt_matvec: L z has covariance LLᵀ = Q
    np.testing.assert_allclose(np.asarray(f.sqrt_matvec(jnp.asarray(z))), L @ z, rtol=1e-7)
    Zs = f.selinv(Q.pattern)
    np.testing.assert_allclose(
        np.asarray(Zs.data), Ainv[Q.pattern.rows, Q.pattern.cols], rtol=1e-8
    )


def test_dense_backend_differentiable(rng):
    """Gradients of logdet through factorization match Q⁻¹."""
    S = random_sparse_spd(rng, 12)
    Q = from_scipy(S)
    Ainv = np.linalg.inv(S.toarray())

    def f(data):
        fac = factorize(Q.with_data(data), SolverSpec(kind="dense"))
        return fac.logdet()

    g = jax.grad(f)(Q.data)
    # d logdet / d Q_ij on the pattern = (Q⁻¹)_ij (as independent entries)
    np.testing.assert_allclose(
        np.asarray(g), Ainv[Q.pattern.rows, Q.pattern.cols], rtol=1e-7
    )


def test_tridiag_backend_differentiable(rng):
    S = _tridiag_spd(rng, 20)
    Q = from_scipy(S)
    Ainv = np.linalg.inv(S.toarray())

    def f(data):
        fac = factorize(Q.with_data(data))
        return fac.logdet()

    g = jax.grad(f)(Q.data)
    np.testing.assert_allclose(
        np.asarray(g), Ainv[Q.pattern.rows, Q.pattern.cols], rtol=1e-7
    )


def test_vmapped_factorization(rng):
    """Batched factorize — the NUTS-chains workload shape."""
    S = random_sparse_spd(rng, 16)
    Q = from_scipy(S)
    scales = jnp.asarray([1.0, 2.0, 3.0])

    def logdet_for_scale(s):
        f = factorize(Q.with_data(Q.data * s), SolverSpec(kind="dense"))
        return f.logdet()

    out = jax.vmap(logdet_for_scale)(scales)
    base = np.linalg.slogdet(S.toarray())[1]
    n = 16
    expected = np.array([base + n * np.log(s) for s in [1.0, 2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-10)
