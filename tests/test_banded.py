import numpy as np
import jax
import jax.numpy as jnp

from tpu_gmrf import GMRF, from_scipy
from tpu_gmrf.solvers import SolverSpec, factorize
from tpu_gmrf.solvers.banded import banded_factorize, banded_plan


def _grid_laplacian_spd(nx, ny, reg=0.5):
    """2D grid Laplacian + reg*I — banded after RCM, like a Matern FEM Q."""
    import scipy.sparse as sp

    n = nx * ny
    rows, cols, vals = [], [], []
    for i in range(nx):
        for j in range(ny):
            k = i * ny + j
            deg = 0
            for di, dj in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
                ii, jj = i + di, j + dj
                if 0 <= ii < nx and 0 <= jj < ny:
                    rows.append(k)
                    cols.append(ii * ny + jj)
                    vals.append(-1.0)
                    deg += 1
            rows.append(k)
            cols.append(k)
            vals.append(deg + reg)
    return sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()


def test_banded_vs_dense_oracle(rng):
    S = _grid_laplacian_spd(12, 9)
    n = S.shape[0]
    Q = from_scipy(S)
    f = banded_factorize(Q)
    A = S.toarray()
    Ainv = np.linalg.inv(A)
    b = rng.normal(size=n)
    np.testing.assert_allclose(np.asarray(f.solve(jnp.asarray(b))), Ainv @ b, rtol=1e-8)
    B = rng.normal(size=(n, 3))
    np.testing.assert_allclose(np.asarray(f.solve(jnp.asarray(B))), Ainv @ B, rtol=1e-8)
    np.testing.assert_allclose(float(f.logdet()), np.linalg.slogdet(A)[1], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(f.selinv_diag()), np.diag(Ainv), rtol=1e-8)
    Z = f.selinv(Q.pattern)
    np.testing.assert_allclose(
        np.asarray(Z.data), Ainv[Q.pattern.rows, Q.pattern.cols], rtol=1e-7, atol=1e-12
    )
    np.testing.assert_allclose(float(f.selinv_dot(Q)), np.sum(Ainv * A), rtol=1e-8)


def test_banded_sampling_covariance(rng):
    """backward_solve noise must have covariance Q⁻¹ (statistical check)."""
    S = _grid_laplacian_spd(5, 4, reg=1.0)
    n = S.shape[0]
    Q = from_scipy(S)
    f = banded_factorize(Q)
    keys = jax.random.split(jax.random.PRNGKey(0), 6000)
    zs = jax.vmap(lambda k: f.backward_solve(jax.random.normal(k, (n,))))(keys)
    emp = np.cov(np.asarray(zs).T)
    np.testing.assert_allclose(emp, np.linalg.inv(S.toarray()), atol=0.12)
    # sqrt_matvec: L z has covariance Q
    ws = jax.vmap(lambda k: f.sqrt_matvec(jax.random.normal(k, (n,))))(keys)
    emp2 = np.cov(np.asarray(ws).T)
    np.testing.assert_allclose(emp2, S.toarray(), atol=0.5)


def test_banded_through_gmrf_auto(rng):
    """auto solver picks banded above dense_max."""
    S = _grid_laplacian_spd(12, 9)
    n = S.shape[0]
    Q = from_scipy(S)
    g = GMRF.from_precision(
        jnp.zeros(n), Q, SolverSpec(dense_max=50)
    )  # force banded via low threshold
    from tpu_gmrf.solvers.banded import BandedFactor

    assert isinstance(g.factor, BandedFactor)
    np.testing.assert_allclose(
        np.asarray(g.var()), np.diag(np.linalg.inv(S.toarray())), rtol=1e-7
    )
    x = jnp.asarray(rng.normal(size=n))
    from scipy import stats

    ref = stats.multivariate_normal(
        mean=np.zeros(n), cov=np.linalg.inv(S.toarray())
    ).logpdf(np.asarray(x))
    np.testing.assert_allclose(float(g.logpdf(x)), ref, rtol=1e-8)


def test_banded_jit_and_refactorize(rng):
    """theta -> banded factorize -> logdet is jittable with one trace."""
    S = _grid_laplacian_spd(8, 8)
    Q = from_scipy(S)
    base_ld = np.linalg.slogdet(S.toarray())[1]
    n = S.shape[0]

    @jax.jit
    def logdet_scaled(s):
        f = banded_factorize(Q.with_data(Q.data * s))
        return f.logdet()

    for sc in [1.0, 2.5]:
        np.testing.assert_allclose(
            float(logdet_scaled(sc)), base_ld + n * np.log(sc), rtol=1e-9
        )


def test_banded_gradients(rng):
    """d logdet / d Q_data == selinv entries (autodiff through the scan)."""
    S = _grid_laplacian_spd(6, 5)
    Q = from_scipy(S)
    Ainv = np.linalg.inv(S.toarray())

    def f(data):
        return banded_factorize(Q.with_data(data)).logdet()

    g = jax.grad(f)(Q.data)
    np.testing.assert_allclose(
        np.asarray(g), Ainv[Q.pattern.rows, Q.pattern.cols], rtol=1e-6
    )
