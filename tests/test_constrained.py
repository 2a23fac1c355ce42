import numpy as np
import jax
import jax.numpy as jnp

from tpu_gmrf import GMRF, ConstrainedGMRF, from_scipy
from tests.conftest import random_sparse_spd


def _constrained_oracle(Qd, mu, A, e):
    """Dense oracle for x | Ax = e via conditioning formulas."""
    Sig = np.linalg.inv(Qd)
    AQA = A @ Sig @ A.T
    K = Sig @ A.T @ np.linalg.inv(AQA)
    mean_c = mu - K @ (A @ mu - e)
    Sig_c = Sig - K @ A @ Sig
    return mean_c, Sig_c


def _setup(rng, n=20, m=2):
    S = random_sparse_spd(rng, n)
    mu = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    e = rng.normal(size=m)
    g = GMRF.from_precision(jnp.asarray(mu), from_scipy(S))
    cg = ConstrainedGMRF.create(g, jnp.asarray(A), jnp.asarray(e))
    return S.toarray(), mu, A, e, cg


def test_constrained_mean_and_var(rng):
    Qd, mu, A, e, cg = _setup(rng)
    mean_c, Sig_c = _constrained_oracle(Qd, mu, A, e)
    np.testing.assert_allclose(np.asarray(cg.mean), mean_c, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(cg.var()), np.diag(Sig_c), atol=1e-8)


def test_constrained_sampling(rng):
    Qd, mu, A, e, cg = _setup(rng, n=10, m=1)
    xs = cg.sample(jax.random.PRNGKey(1), (3000,))
    xs = np.asarray(xs)
    # every sample satisfies the constraint
    np.testing.assert_allclose(xs @ A.T, np.tile(e, (3000, 1)), atol=1e-8)
    mean_c, Sig_c = _constrained_oracle(Qd, mu, A, e)
    np.testing.assert_allclose(xs.mean(axis=0), mean_c, atol=0.15)


def test_rue_held_logpdf_correction(rng):
    """logpdf against the exact degenerate-Gaussian density on the constraint
    manifold (Rue & Held 2005 §2.3.3): p(x|Ax=e) = p(x)·p_N(e; Aμ, AΣAᵀ)⁻¹
    evaluated consistently — verified via the density ratio at two points."""
    Qd, mu, A, e, cg = _setup(rng, n=12, m=2)
    x1 = np.asarray(cg.sample(jax.random.PRNGKey(0)))
    x2 = np.asarray(cg.sample(jax.random.PRNGKey(5)))
    # ratio test: log p(x1) - log p(x2) must equal base quadratic difference
    lp1 = float(cg.logpdf(jnp.asarray(x1)))
    lp2 = float(cg.logpdf(jnp.asarray(x2)))
    q1 = (x1 - mu) @ Qd @ (x1 - mu)
    q2 = (x2 - mu) @ Qd @ (x2 - mu)
    np.testing.assert_allclose(lp1 - lp2, -0.5 * (q1 - q2), rtol=1e-7)
    # absolute value: integrate-out check vs explicit Rue-Held formula
    Sig = np.linalg.inv(Qd)
    AQA = A @ Sig @ A.T
    resid = e - A @ mu
    m = A.shape[0]
    n = len(mu)
    log_corr = 0.5 * (
        m * np.log(2 * np.pi)
        + np.linalg.slogdet(AQA)[1]
        + resid @ np.linalg.solve(AQA, resid)
    ) - 0.5 * np.linalg.slogdet(A @ A.T)[1]
    base_lp = -0.5 * (
        n * np.log(2 * np.pi) - np.linalg.slogdet(Qd)[1] + q1
    )
    np.testing.assert_allclose(lp1, base_lp + log_corr, rtol=1e-8)


def test_constraint_gradients_flow(rng):
    """AD flows through the full constrained construction."""
    n = 10
    S = random_sparse_spd(rng, n)
    Q0 = from_scipy(S)
    A = jnp.asarray(rng.normal(size=(1, n)))
    e = jnp.zeros(1)
    x = np.asarray(
        ConstrainedGMRF.create(
            GMRF.from_precision(jnp.zeros(n), Q0), A, e
        ).sample(jax.random.PRNGKey(0))
    )

    def lp(log_tau):
        g = GMRF.from_precision(jnp.zeros(n), Q0 * jnp.exp(log_tau))
        return ConstrainedGMRF.create(g, A, e).logpdf(jnp.asarray(x))

    g1 = float(jax.grad(lp)(jnp.asarray(0.2)))
    eps = 1e-6
    fd = (float(lp(jnp.asarray(0.2 + eps))) - float(lp(jnp.asarray(0.2 - eps)))) / (2 * eps)
    np.testing.assert_allclose(g1, fd, rtol=1e-5)
