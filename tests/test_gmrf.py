import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats

from tpu_gmrf import GMRF, SolverSpec, from_scipy
from tests.conftest import random_sparse_spd


def test_logpdf_matches_scipy(rng):
    n = 25
    S = random_sparse_spd(rng, n)
    mu = rng.normal(size=n)
    g = GMRF.from_precision(jnp.asarray(mu), from_scipy(S))
    cov = np.linalg.inv(S.toarray())
    ref = stats.multivariate_normal(mean=mu, cov=cov)
    for _ in range(3):
        x = rng.normal(size=n)
        np.testing.assert_allclose(float(g.logpdf(jnp.asarray(x))), ref.logpdf(x), rtol=1e-8)


def test_var_matches_dense_inverse(rng):
    n = 30
    S = random_sparse_spd(rng, n)
    g = GMRF.from_precision(jnp.zeros(n), from_scipy(S))
    np.testing.assert_allclose(
        np.asarray(g.var()), np.diag(np.linalg.inv(S.toarray())), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(g.std()), np.sqrt(np.diag(np.linalg.inv(S.toarray()))), rtol=1e-8
    )


def test_sampling_statistics(rng):
    """Low-noise statistical check (reference test/test_gmrf.jl:39-46)."""
    n = 10
    S = random_sparse_spd(rng, n) * 100.0  # high precision → low variance
    mu = rng.normal(size=n)
    g = GMRF.from_precision(jnp.asarray(mu), from_scipy(S))
    xs = g.sample(jax.random.PRNGKey(0), (4000,))
    emp_mean = np.asarray(xs).mean(axis=0)
    np.testing.assert_allclose(emp_mean, mu, atol=5e-2)
    emp_var = np.asarray(xs).var(axis=0)
    np.testing.assert_allclose(emp_var, np.asarray(g.var()), rtol=0.2)


def test_information_vector_constructor(rng):
    n = 20
    S = random_sparse_spd(rng, n)
    mu = rng.normal(size=n)
    info = S @ mu
    g = GMRF.from_information(jnp.asarray(info), from_scipy(S))
    np.testing.assert_allclose(np.asarray(g.mean), mu, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g.information_vector()), info, rtol=1e-8)


def test_gradlogpdf(rng):
    n = 15
    S = random_sparse_spd(rng, n)
    mu = rng.normal(size=n)
    g = GMRF.from_precision(jnp.asarray(mu), from_scipy(S))
    x = jnp.asarray(rng.normal(size=n))
    auto = jax.grad(lambda x_: g.logpdf(x_))(x)
    np.testing.assert_allclose(np.asarray(g.gradlogpdf(x)), np.asarray(auto), rtol=1e-8)


def test_jit_and_grad_through_construction(rng):
    """θ → Q(θ) → GMRF → logpdf is one differentiable jitted graph."""
    n = 12
    S = random_sparse_spd(rng, n)
    Q0 = from_scipy(S)
    x = jnp.asarray(rng.normal(size=n))

    @jax.jit
    def nll(log_tau):
        g = GMRF.from_precision(jnp.zeros(n), Q0 * jnp.exp(log_tau))
        return -g.logpdf(x)

    g1 = jax.grad(nll)(jnp.asarray(0.3))
    eps = 1e-6
    fd = (nll(jnp.asarray(0.3 + eps)) - nll(jnp.asarray(0.3 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g1), float(fd), rtol=1e-5)


def test_cov_guard(rng):
    g = GMRF.from_precision(jnp.zeros(5), from_scipy(random_sparse_spd(rng, 5)))
    try:
        g.cov()
        assert False, "cov() must raise"
    except NotImplementedError:
        pass
