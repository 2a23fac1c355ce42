import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import optimize

from tpu_gmrf import (
    AR1Model,
    ConstrainedGMRF,
    ExponentialFamily,
    GAOptions,
    GMRF,
    IIDModel,
    RW1Model,
    from_scipy,
    gaussian_approximation,
    joint_gmrf,
    laplace_marginal,
    linear_condition,
    marginal_loglikelihood,
)
from tpu_gmrf.observations import LinearlyTransformedObservationModel
from tests.conftest import random_sparse_spd


# ---- linear conditioning ---------------------------------------------------


def test_linear_condition_identity(rng):
    n = 20
    S = random_sparse_spd(rng, n)
    mu = rng.normal(size=n)
    g = GMRF.from_precision(jnp.asarray(mu), from_scipy(S))
    y = rng.normal(size=n)
    sig2 = 0.5
    post = linear_condition(g, jnp.asarray(y), Q_eps=1.0 / sig2)
    Qd = S.toarray()
    Q_post = Qd + np.eye(n) / sig2
    mean_post = np.linalg.solve(Q_post, Qd @ mu + y / sig2)
    np.testing.assert_allclose(np.asarray(post.mean), mean_post, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(post.Q.todense()), Q_post, rtol=1e-10)


def test_linear_condition_dense_A(rng):
    n, m = 15, 6
    S = random_sparse_spd(rng, n)
    mu = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)
    y = rng.normal(size=m)
    Qe = np.diag(rng.uniform(0.5, 2.0, size=m))
    g = GMRF.from_precision(jnp.asarray(mu), from_scipy(S))
    post = linear_condition(g, jnp.asarray(y), Q_eps=jnp.asarray(np.diag(Qe)), A=jnp.asarray(A), b=jnp.asarray(b))
    Qd = S.toarray()
    Q_post = Qd + A.T @ Qe @ A
    mean_post = np.linalg.solve(Q_post, Qd @ mu + A.T @ Qe @ (y - b))
    np.testing.assert_allclose(np.asarray(post.mean), mean_post, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(post.Q.todense()), Q_post, rtol=1e-9)


def test_linear_condition_indices(rng):
    n, m = 12, 4
    S = random_sparse_spd(rng, n)
    idx = np.array([0, 3, 7, 11])
    y = rng.normal(size=m)
    g = GMRF.from_precision(jnp.zeros(n), from_scipy(S))
    post = linear_condition(g, jnp.asarray(y), Q_eps=jnp.full(m, 2.0), indices=idx)
    A = np.zeros((m, n))
    A[np.arange(m), idx] = 1.0
    Q_post = S.toarray() + 2.0 * A.T @ A
    mean_post = np.linalg.solve(Q_post, 2.0 * A.T @ y)
    np.testing.assert_allclose(np.asarray(post.mean), mean_post, rtol=1e-8)


def test_linear_condition_constrained(rng):
    n = 10
    m0 = IIDModel(n, constraint="sumtozero")
    prior = m0(tau=1.0)
    y = rng.normal(size=n)
    post = linear_condition(prior, jnp.asarray(y), Q_eps=4.0)
    assert isinstance(post, ConstrainedGMRF)
    x = np.asarray(post.sample(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(x.sum(), 0.0, atol=1e-8)


# ---- gaussian approximation ------------------------------------------------


def _poisson_map_oracle(Qd, mu, y):
    """Exact MAP via scipy optimization."""

    def f(x):
        return 0.5 * (x - mu) @ Qd @ (x - mu) - np.sum(y * x - np.exp(x))

    def grad(x):
        return Qd @ (x - mu) - (y - np.exp(x))

    res = optimize.minimize(f, mu, jac=grad, method="BFGS", tol=1e-12)
    return res.x


def test_ga_poisson_mode(rng):
    n = 30
    model = RW1Model(n, additional_constraints=None)
    # unconstrained prior for oracle comparison: use AR1 (proper)
    prior = AR1Model(n)(tau=1.0, rho=0.8)
    y = rng.poisson(2.0, size=n).astype(np.float64)
    lik = ExponentialFamily("poisson")(y)
    post = gaussian_approximation(prior, lik)
    Qd = np.asarray(prior.Q.todense())
    x_oracle = _poisson_map_oracle(Qd, np.zeros(n), y)
    np.testing.assert_allclose(np.asarray(post.mean), x_oracle, atol=1e-5)
    # posterior precision = Q + diag(exp(x*))
    np.testing.assert_allclose(
        np.asarray(post.Q.todense()),
        Qd + np.diag(np.exp(x_oracle)),
        rtol=1e-5,
    )


def test_ga_conjugate_shortcircuit(rng):
    n = 15
    prior = AR1Model(n)(tau=2.0, rho=0.5)
    y = rng.normal(size=n)
    lik = ExponentialFamily("normal")(y, sigma=0.7)
    post = gaussian_approximation(prior, lik)
    Qd = np.asarray(prior.Q.todense())
    Q_post = Qd + np.eye(n) / 0.49
    mean_post = np.linalg.solve(Q_post, y / 0.49)
    np.testing.assert_allclose(np.asarray(post.mean), mean_post, rtol=1e-7)


def test_ga_normal_via_newton_matches_conjugate(rng):
    """Force the Newton path on a conjugate problem — must agree."""
    n = 12
    prior = AR1Model(n)(tau=1.0, rho=0.6)
    y = rng.normal(size=n)
    lik_lt = LinearlyTransformedObservationModel(
        ExponentialFamily("normal"), jnp.eye(n) * 1.0
    )(y, sigma=0.9)
    post = gaussian_approximation(prior, lik_lt)  # LT short-circuit
    lik = ExponentialFamily("normal")(y, sigma=0.9)
    post2 = gaussian_approximation(prior, lik)
    np.testing.assert_allclose(
        np.asarray(post.mean), np.asarray(post2.mean), rtol=1e-6
    )


def test_ga_constrained(rng):
    n = 16
    model = RW1Model(n)
    prior = model(tau=1.5)  # ConstrainedGMRF with sum-to-zero
    y = rng.poisson(2.0, size=n).astype(np.float64)
    lik = ExponentialFamily("poisson")(y)
    post = gaussian_approximation(prior, lik)
    assert isinstance(post, ConstrainedGMRF)
    # mode satisfies constraint
    np.testing.assert_allclose(float(jnp.sum(post.mean)), 0.0, atol=1e-6)
    # mode is stationary point of constrained problem: projected gradient ≈ 0
    x = np.asarray(post.mean)
    Qd = np.asarray(prior.base.Q.todense())
    grad = Qd @ x - (y - np.exp(x))
    A = np.ones((1, n))
    P = np.eye(n) - A.T @ A / n
    np.testing.assert_allclose(P @ grad, np.zeros(n), atol=1e-4)


def test_ga_bernoulli(rng):
    n = 25
    prior = AR1Model(n)(tau=0.5, rho=0.9)
    probs = 1 / (1 + np.exp(-rng.normal(size=n)))
    y = (rng.uniform(size=n) < probs).astype(np.float64)
    lik = ExponentialFamily("bernoulli")(y)
    post = gaussian_approximation(prior, lik)
    x = np.asarray(post.mean)
    Qd = np.asarray(prior.Q.todense())
    mu_fit = 1 / (1 + np.exp(-x))
    np.testing.assert_allclose(Qd @ x, y - mu_fit, atol=1e-5)


# ---- marginal likelihood + gradients --------------------------------------


def test_marginal_loglik_gaussian_exact(rng):
    """For conjugate Gaussian obs the Laplace marginal is EXACT — compare to
    the closed-form evidence."""
    n = 10
    prior = AR1Model(n)(tau=1.2, rho=0.4)
    y = rng.normal(size=n)
    sigma = 0.8
    lik = ExponentialFamily("normal")(y, sigma=sigma)
    ml = float(marginal_loglikelihood(prior, lik))
    Qd = np.asarray(prior.Q.todense())
    cov_y = np.linalg.inv(Qd) + sigma**2 * np.eye(n)
    from scipy import stats

    ref = stats.multivariate_normal(mean=np.zeros(n), cov=cov_y).logpdf(y)
    np.testing.assert_allclose(ml, ref, rtol=1e-8)


@pytest.mark.slow
def test_laplace_marginal_gradient_vs_fd(rng):
    """The flagship gradient: d/dθ of the Laplace marginal via IFT custom-vjp
    must match finite differences (reference test strategy §4.3)."""
    n = 20
    model = AR1Model(n)
    y = rng.poisson(2.0, size=n).astype(np.float64)
    obs = ExponentialFamily("poisson")

    def ml(params):
        log_tau, arctanh_rho = params
        return laplace_marginal(
            model,
            obs,
            y,
            {"tau": jnp.exp(log_tau), "rho": jnp.tanh(arctanh_rho)},
        )

    p0 = jnp.asarray([0.3, 0.5])
    g = np.asarray(jax.grad(ml)(p0))
    for i in range(2):
        eps = 1e-6
        pp = np.asarray(p0).copy()
        pm = np.asarray(p0).copy()
        pp[i] += eps
        pm[i] -= eps
        fd = (float(ml(jnp.asarray(pp))) - float(ml(jnp.asarray(pm)))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-4, atol=1e-7)


@pytest.mark.slow
def test_laplace_marginal_gradient_constrained_vs_fd(rng):
    """IFT gradient with KKT-constrained Newton (RW1 prior)."""
    n = 15
    model = RW1Model(n)
    y = rng.poisson(2.0, size=n).astype(np.float64)
    obs = ExponentialFamily("poisson")

    def ml(log_tau):
        return laplace_marginal(model, obs, y, {"tau": jnp.exp(log_tau)})

    g = float(jax.grad(ml)(jnp.asarray(0.4)))
    eps = 1e-6
    fd = (float(ml(jnp.asarray(0.4 + eps))) - float(ml(jnp.asarray(0.4 - eps)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=5e-4, atol=1e-7)


@pytest.mark.slow
def test_laplace_marginal_obs_hyperparam_gradient(rng):
    """Gradient w.r.t. an observation hyperparameter (sigma) via the IFT."""
    n = 12
    model = AR1Model(n)
    y = rng.normal(size=n)
    obs = ExponentialFamily("studentt")

    def ml(log_sigma):
        return laplace_marginal(
            model,
            obs,
            y,
            {"tau": 1.0, "rho": 0.5, "sigma": jnp.exp(log_sigma), "nu": 6.0},
        )

    g = float(jax.grad(ml)(jnp.asarray(0.1)))
    eps = 1e-6
    fd = (float(ml(jnp.asarray(0.1 + eps))) - float(ml(jnp.asarray(0.1 - eps)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=5e-4, atol=1e-7)


def test_laplace_marginal_jit(rng):
    n = 10
    model = AR1Model(n)
    y = rng.poisson(1.5, size=n).astype(np.float64)
    obs = ExponentialFamily("poisson")

    @jax.jit
    def ml(tau):
        return laplace_marginal(model, obs, y, {"tau": tau, "rho": 0.5})

    v1, v2 = float(ml(1.0)), float(ml(2.0))
    assert np.isfinite(v1) and np.isfinite(v2) and v1 != v2


# ---- joint -----------------------------------------------------------------


def test_joint_gmrf(rng):
    n, m = 8, 5
    S = random_sparse_spd(rng, n)
    mu = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    Qe = np.diag(rng.uniform(1.0, 2.0, size=m))
    b = rng.normal(size=m)
    x1 = GMRF.from_precision(jnp.asarray(mu), from_scipy(S))
    joint = joint_gmrf(x1, jnp.asarray(A), jnp.asarray(np.diag(Qe)), b=jnp.asarray(b))
    Qd = S.toarray()
    Q_ref = np.block(
        [[Qd + A.T @ Qe @ A, -(Qe @ A).T], [-(Qe @ A), Qe]]
    )
    np.testing.assert_allclose(np.asarray(joint.Q.todense()), Q_ref, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(joint.mean), np.concatenate([mu, A @ mu + b]), rtol=1e-8
    )
    # marginal covariance of x2 = A Σ Aᵀ + Qe⁻¹
    Sig_joint = np.linalg.inv(Q_ref)
    Sig1 = np.linalg.inv(Qd)
    np.testing.assert_allclose(
        Sig_joint[n:, n:], A @ Sig1 @ A.T + np.linalg.inv(Qe), rtol=1e-7
    )


# ---- forward-mode AD through the inference stack (reference ext/forwarddiff/) ----


@pytest.mark.slow
def test_laplace_marginal_jacfwd_vs_fd(rng):
    """Forward-mode (jacfwd) through laplace_marginal — the custom_jvp IFT
    rule (reference ext/forwarddiff/autodiff_likelihood_ift.jl:1-27) — must
    match finite differences and reverse mode."""
    n = 20
    model = AR1Model(n)
    y = rng.poisson(2.0, size=n).astype(np.float64)
    obs = ExponentialFamily("poisson")

    def ml(params):
        return laplace_marginal(
            model, obs, y, {"tau": jnp.exp(params[0]), "rho": jnp.tanh(params[1])}
        )

    p0 = jnp.asarray([0.3, 0.5])
    g_fwd = np.asarray(jax.jacfwd(ml)(p0))
    g_rev = np.asarray(jax.grad(ml)(p0))
    np.testing.assert_allclose(g_fwd, g_rev, rtol=1e-9)
    for i in range(2):
        eps = 1e-6
        pp = np.asarray(p0).copy()
        pm = np.asarray(p0).copy()
        pp[i] += eps
        pm[i] -= eps
        fd = (float(ml(jnp.asarray(pp))) - float(ml(jnp.asarray(pm)))) / (2 * eps)
        np.testing.assert_allclose(g_fwd[i], fd, rtol=2e-4, atol=1e-7)


@pytest.mark.slow
def test_laplace_marginal_hessian_fwd_over_rev(rng):
    """jax.hessian (forward-over-reverse) of the Laplace marginal — the
    INLA-style θ-posterior curvature — matches FD of the gradient."""
    n = 16
    model = AR1Model(n)
    y = rng.poisson(2.0, size=n).astype(np.float64)
    obs = ExponentialFamily("poisson")

    def ml(params):
        return laplace_marginal(
            model, obs, y, {"tau": jnp.exp(params[0]), "rho": jnp.tanh(params[1])}
        )

    p0 = jnp.asarray([0.2, 0.3])
    H = np.asarray(jax.hessian(ml)(p0))
    np.testing.assert_allclose(H, H.T, rtol=1e-6, atol=1e-9)
    eps = 1e-5
    for j in range(2):
        pp = np.asarray(p0).copy()
        pm = np.asarray(p0).copy()
        pp[j] += eps
        pm[j] -= eps
        fd_col = (
            np.asarray(jax.grad(ml)(jnp.asarray(pp)))
            - np.asarray(jax.grad(ml)(jnp.asarray(pm)))
        ) / (2 * eps)
        np.testing.assert_allclose(H[:, j], fd_col, rtol=5e-4, atol=1e-6)


@pytest.mark.slow
def test_laplace_marginal_jacfwd_constrained(rng):
    """Forward mode through the KKT-constrained Newton (RW1 prior)."""
    n = 15
    model = RW1Model(n)
    y = rng.poisson(2.0, size=n).astype(np.float64)
    obs = ExponentialFamily("poisson")

    def ml(log_tau):
        return laplace_marginal(model, obs, y, {"tau": jnp.exp(log_tau)})

    g = float(jax.jacfwd(ml)(jnp.asarray(0.4)))
    eps = 1e-6
    fd = (float(ml(jnp.asarray(0.4 + eps))) - float(ml(jnp.asarray(0.4 - eps)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=5e-4, atol=1e-7)
