import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_gmrf import (
    AR1Model,
    AutoDiffLatentPrior,
    ExponentialFamily,
    FactorGroup,
    StructuredLatentPrior,
    ZeroLikelihood,
    gaussian_approximation,
    marginal_loglikelihood,
)


def _gaussian_as_autodiff(n, tau, rho):
    """Express the AR1 Gaussian prior as a generic scalar log-density."""
    model = AR1Model(n)
    Qd = jnp.asarray(np.asarray(model.precision(tau=tau, rho=rho).todense()))
    logdet = float(np.linalg.slogdet(np.asarray(Qd))[1])

    def fn(x, scale):
        return 0.5 * logdet * scale - 0.5 * x @ (Qd @ x) - 0.5 * n * jnp.log(2 * jnp.pi)

    return AutoDiffLatentPrior(theta={"scale": jnp.asarray(1.0)}, fn=fn, n=n)


def test_autodiff_prior_matches_gaussian_path(rng):
    """Non-Gaussian machinery on an actually-Gaussian prior must reproduce
    the Gaussian GA exactly."""
    n = 15
    y = rng.poisson(2.0, size=n).astype(np.float64)
    lik = ExponentialFamily("poisson")(y)
    prior_g = AR1Model(n)(tau=1.2, rho=0.6)
    post_g = gaussian_approximation(prior_g, lik)
    prior_ad = _gaussian_as_autodiff(n, 1.2, 0.6)
    post_ad = gaussian_approximation(prior_ad, lik)
    np.testing.assert_allclose(
        np.asarray(post_ad.mean), np.asarray(post_g.mean), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(post_ad.Q.todense()), np.asarray(post_g.Q.todense()), rtol=1e-6
    )
    ml_g = float(marginal_loglikelihood(prior_g, lik, posterior=post_g))
    ml_ad = float(marginal_loglikelihood(prior_ad, lik, posterior=post_ad))
    np.testing.assert_allclose(ml_ad, ml_g, rtol=1e-7)


def test_structured_prior_student_t_rw(rng):
    """Student-t random walk prior (robust trend filter) via factor graph:
    MAP matches scipy optimization."""
    from scipy import optimize

    n = 25
    nu, scale = 4.0, 0.5
    idx = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)

    def rw_factor(v, log_tau):
        d = (v[1] - v[0]) * jnp.exp(log_tau)
        return -0.5 * (nu + 1) * jnp.log1p(d**2 / nu) + log_tau

    def anchor(v, log_tau):
        return -0.5 * v[0] ** 2 / 100.0  # weak anchor for properness

    prior = StructuredLatentPrior.create(
        n,
        [
            FactorGroup(idx, rw_factor),
            FactorGroup(np.arange(n)[:, None], anchor),
        ],
        theta={"log_tau": jnp.asarray(np.log(1 / scale))},
    )
    y = rng.normal(size=n) + np.linspace(0, 3, n)
    lik = ExponentialFamily("normal")(y, sigma=0.7)
    post = gaussian_approximation(prior, lik)

    lt = np.log(1 / scale)

    def neg_post(x):
        d = np.diff(x) * np.exp(lt)
        lp = np.sum(-0.5 * (nu + 1) * np.log1p(d**2 / nu) + lt)
        lp += np.sum(-0.5 * x**2 / 100.0)
        lp += np.sum(-0.5 * ((y - x) / 0.7) ** 2)
        return -lp

    res = optimize.minimize(neg_post, y, method="BFGS", tol=1e-12)
    np.testing.assert_allclose(np.asarray(post.mean), res.x, atol=1e-4)


def test_structured_prior_log_density_and_quadratic(rng):
    n = 10
    idx = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)

    def factor(v, a):
        return -a * (v[1] - v[0]) ** 4  # quartic coupling

    prior = StructuredLatentPrior.create(
        n, [FactorGroup(idx, factor)], theta={"a": jnp.asarray(0.3)}
    )
    x = jnp.asarray(rng.normal(size=n))
    # log_density vs direct
    ref = float(jnp.sum(-0.3 * jnp.diff(x) ** 4))
    np.testing.assert_allclose(float(prior.log_density(x)), ref, rtol=1e-8)
    # local quadratic vs AD oracle
    Q, h = prior.local_quadratic(x)
    H_ad = np.asarray(jax.hessian(prior.log_density)(x))
    g_ad = np.asarray(jax.grad(prior.log_density)(x))
    np.testing.assert_allclose(np.asarray(Q.todense()), -H_ad, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(h), g_ad + (-H_ad) @ np.asarray(x), atol=1e-7
    )


def test_tmb_style_monolithic_joint(rng):
    """AutoDiffLatentPrior + ZeroLikelihood = TMB: the joint log-density
    contains both prior and data terms."""
    n = 12
    y = rng.poisson(2.0, size=n).astype(np.float64)
    Qd = jnp.asarray(np.asarray(AR1Model(n).precision(tau=1.0, rho=0.5).todense()))

    def joint(x, dummy):
        lp = -0.5 * x @ (Qd @ x)
        lp += jnp.sum(y * x - jnp.exp(x))
        return lp

    prior = AutoDiffLatentPrior(theta={"dummy": jnp.asarray(0.0)}, fn=joint, n=n)
    post = gaussian_approximation(prior, ZeroLikelihood())
    # compare with two-part formulation
    prior_g = AR1Model(n)(tau=1.0, rho=0.5)
    lik = ExponentialFamily("poisson")(y)
    post_ref = gaussian_approximation(prior_g, lik)
    np.testing.assert_allclose(
        np.asarray(post.mean), np.asarray(post_ref.mean), atol=1e-6
    )


@pytest.mark.slow
def test_nongaussian_hyperparam_gradient_vs_fd(rng):
    """IFT gradient through the non-Gaussian Newton loop."""
    n = 12
    y = rng.poisson(2.0, size=n).astype(np.float64)
    lik = ExponentialFamily("poisson")(y)
    idx = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)

    def rw_factor(v, log_tau):
        d = (v[1] - v[0]) * jnp.exp(log_tau)
        return -0.5 * 5.0 * jnp.log1p(d**2 / 4.0) + log_tau

    def anchor(v, log_tau):
        return -0.5 * v[0] ** 2 / 25.0

    def ml(log_tau):
        prior = StructuredLatentPrior.create(
            n,
            [FactorGroup(idx, rw_factor), FactorGroup(np.arange(n)[:, None], anchor)],
            theta={"log_tau": log_tau},
        )
        return marginal_loglikelihood(prior, lik)

    g = float(jax.grad(ml)(jnp.asarray(0.2)))
    eps = 1e-6
    fd = (float(ml(jnp.asarray(0.2 + eps))) - float(ml(jnp.asarray(0.2 - eps)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-4)
