import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import stats

from tpu_gmrf.observations import (
    AutoDiffObservationModel,
    BinomialObservations,
    CompositeObservationModel,
    ExponentialFamily,
    LinearlyTransformedObservationModel,
    NegativeBinomialObservations,
    NonlinearLeastSquaresModel,
    PoissonObservations,
    ZeroLikelihood,
)

M = 12


def _check_grad_hess(lik, x):
    """loggrad/loghessian_diag must equal AD of loglik."""
    g_ad = jax.grad(lik.loglik)(x)
    np.testing.assert_allclose(np.asarray(lik.loggrad(x)), np.asarray(g_ad), rtol=1e-7, atol=1e-10)
    if lik.hessian_kind == "diag":
        H_ad = jax.hessian(lik.loglik)(x)
        np.testing.assert_allclose(
            np.asarray(lik.loghessian_diag(x)), np.diag(np.asarray(H_ad)), rtol=1e-7, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(H_ad), np.diag(np.diag(np.asarray(H_ad))), atol=1e-10
        )
    else:
        H_ad = jax.hessian(lik.loglik)(x)
        np.testing.assert_allclose(
            np.asarray(lik.loghessian(x).todense()), np.asarray(H_ad), rtol=1e-6, atol=1e-9
        )


def test_normal(rng):
    y = rng.normal(size=M)
    lik = ExponentialFamily("normal")(y, sigma=1.3)
    x = jnp.asarray(rng.normal(size=M))
    ref = stats.norm.logpdf(y, loc=np.asarray(x), scale=1.3).sum()
    np.testing.assert_allclose(float(lik.loglik(x)), ref, rtol=1e-10)
    _check_grad_hess(lik, x)
    np.testing.assert_allclose(
        float(jnp.sum(lik.pointwise_loglik(x))), float(lik.loglik(x)), rtol=1e-12
    )


def test_poisson_with_exposure(rng):
    y = rng.poisson(3.0, size=M).astype(np.float64)
    expo = rng.uniform(0.5, 2.0, size=M)
    obs = PoissonObservations.create(y, exposure=expo)
    lik = ExponentialFamily("poisson")(obs)
    x = jnp.asarray(rng.normal(size=M) * 0.3)
    mu = expo * np.exp(np.asarray(x))
    ref = stats.poisson.logpmf(y.astype(int), mu).sum()
    np.testing.assert_allclose(float(lik.loglik(x)), ref, rtol=1e-10)
    _check_grad_hess(lik, x)


def test_bernoulli(rng):
    y = rng.integers(0, 2, size=M).astype(np.float64)
    lik = ExponentialFamily("bernoulli")(y)
    x = jnp.asarray(rng.normal(size=M))
    p = 1 / (1 + np.exp(-np.asarray(x)))
    ref = stats.bernoulli.logpmf(y.astype(int), p).sum()
    np.testing.assert_allclose(float(lik.loglik(x)), ref, rtol=1e-9)
    _check_grad_hess(lik, x)


def test_binomial(rng):
    trials = rng.integers(1, 10, size=M).astype(np.float64)
    y = np.array([rng.integers(0, t + 1) for t in trials]).astype(np.float64)
    obs = BinomialObservations(jnp.asarray(y), jnp.asarray(trials))
    lik = ExponentialFamily("binomial")(obs)
    x = jnp.asarray(rng.normal(size=M))
    p = 1 / (1 + np.exp(-np.asarray(x)))
    ref = stats.binom.logpmf(y.astype(int), trials.astype(int), p).sum()
    np.testing.assert_allclose(float(lik.loglik(x)), ref, rtol=1e-9)
    _check_grad_hess(lik, x)


def test_negbin(rng):
    y = rng.poisson(4.0, size=M).astype(np.float64)
    r = 3.5
    lik = ExponentialFamily("negativebinomial")(
        NegativeBinomialObservations.create(y), r=r
    )
    x = jnp.asarray(rng.normal(size=M) * 0.3)
    mu = np.exp(np.asarray(x))
    # scipy nbinom: n=r, p = r/(r+mu)
    ref = stats.nbinom.logpmf(y.astype(int), r, r / (r + mu)).sum()
    np.testing.assert_allclose(float(lik.loglik(x)), ref, rtol=1e-9)
    _check_grad_hess(lik, x)


def test_gamma(rng):
    y = rng.gamma(2.0, 1.0, size=M)
    phi = 2.2
    lik = ExponentialFamily("gamma")(y, phi=phi)
    x = jnp.asarray(rng.normal(size=M) * 0.2)
    mu = np.exp(np.asarray(x))
    # shape phi, scale mu/phi
    ref = stats.gamma.logpdf(y, phi, scale=mu / phi).sum()
    np.testing.assert_allclose(float(lik.loglik(x)), ref, rtol=1e-9)
    _check_grad_hess(lik, x)


def test_studentt(rng):
    y = rng.normal(size=M)
    sigma, nu = 1.4, 5.0
    lik = ExponentialFamily("studentt")(y, sigma=sigma, nu=nu)
    x = jnp.asarray(rng.normal(size=M))
    # unit-variance parameterization: scale = sigma*sqrt((nu-2)/nu)
    scale = sigma * np.sqrt((nu - 2) / nu)
    ref = stats.t.logpdf(y, nu, loc=np.asarray(x), scale=scale).sum()
    np.testing.assert_allclose(float(lik.loglik(x)), ref, rtol=1e-9)
    _check_grad_hess(lik, x)


def test_noncanonical_link(rng):
    """Poisson with identity link — AD fallback path."""
    y = rng.poisson(3.0, size=M).astype(np.float64)
    lik = ExponentialFamily("poisson", link="identity")(y)
    x = jnp.asarray(rng.uniform(2.0, 4.0, size=M))
    ref = stats.poisson.logpmf(y.astype(int), np.asarray(x)).sum()
    np.testing.assert_allclose(float(lik.loglik(x)), ref, rtol=1e-9)
    _check_grad_hess(lik, x)


def test_indices_subset(rng):
    n, m = 10, 4
    idx = np.array([1, 3, 5, 7])
    y = rng.normal(size=m)
    lik = ExponentialFamily("normal", indices=idx)(y, sigma=1.0)
    x = jnp.asarray(rng.normal(size=n))
    ref = stats.norm.logpdf(y, loc=np.asarray(x)[idx], scale=1.0).sum()
    np.testing.assert_allclose(float(lik.loglik(x)), ref, rtol=1e-10)
    g = np.asarray(lik.loggrad(x))
    assert g.shape == (n,)
    mask = np.zeros(n, dtype=bool)
    mask[idx] = True
    assert not g[~mask].any()
    _check_grad_hess(lik, x)


def test_linearly_transformed(rng):
    import scipy.sparse as sp
    from tpu_gmrf.sparse import from_scipy

    n, m = 8, 5
    A = sp.random(m, n, density=0.4, random_state=np.random.RandomState(0))
    A = A + sp.random(m, n, density=0.1, random_state=np.random.RandomState(1))
    Asp = from_scipy(A.tocsr())
    b = rng.normal(size=m)
    y = rng.normal(size=m)
    base = ExponentialFamily("normal")
    lt = LinearlyTransformedObservationModel(base, Asp, b)
    lik = lt(y, sigma=0.8)
    x = jnp.asarray(rng.normal(size=n))
    eta = A.toarray() @ np.asarray(x) + b
    ref = stats.norm.logpdf(y, loc=eta, scale=0.8).sum()
    np.testing.assert_allclose(float(lik.loglik(x)), ref, rtol=1e-9)
    _check_grad_hess(lik, x)


def test_autodiff_likelihood(rng):
    y = rng.normal(size=M)

    def fn(x, y, sigma):
        return jnp.sum(stats_norm_logpdf(y, x, sigma))

    def stats_norm_logpdf(y, mu, sigma):
        return -0.5 * jnp.log(2 * jnp.pi) - jnp.log(sigma) - 0.5 * ((y - mu) / sigma) ** 2

    model = AutoDiffObservationModel(fn, hessian="diag")
    lik = model(jnp.asarray(y), sigma=jnp.asarray(1.1))
    x = jnp.asarray(rng.normal(size=M))
    ref_lik = ExponentialFamily("normal")(y, sigma=1.1)
    np.testing.assert_allclose(float(lik.loglik(x)), float(ref_lik.loglik(x)), rtol=1e-10)
    _check_grad_hess(lik, x)


def test_nlsq(rng):
    n, m = 6, 9
    W = jnp.asarray(rng.normal(size=(m, n)))

    def f(x):
        return jnp.tanh(W @ x)

    y = rng.normal(size=m)
    lik = NonlinearLeastSquaresModel(f)(y, sigma=0.5)
    x = jnp.asarray(rng.normal(size=n) * 0.1)
    ref = stats.norm.logpdf(y, loc=np.asarray(f(x)), scale=0.5).sum()
    np.testing.assert_allclose(float(lik.loglik(x)), ref, rtol=1e-9)
    g_ad = jax.grad(lik.loglik)(x)
    np.testing.assert_allclose(np.asarray(lik.loggrad(x)), np.asarray(g_ad), rtol=1e-7)
    # Gauss-Newton Hessian is NSD approximation: check against -J'WJ oracle
    J = np.asarray(jax.jacfwd(f)(x))
    np.testing.assert_allclose(
        np.asarray(lik.loghessian(x).todense()), -(J.T @ J) / 0.25, rtol=1e-8
    )


def test_composite_and_zero(rng):
    n = 10
    y1 = rng.normal(size=n)
    idx = np.arange(5)
    y2 = rng.poisson(2.0, size=5).astype(np.float64)
    comp = CompositeObservationModel(
        ExponentialFamily("normal"),
        ExponentialFamily("poisson", indices=idx),
    )
    lik = comp((y1, y2), sigma=1.0)
    x = jnp.asarray(rng.normal(size=n))
    l1 = ExponentialFamily("normal")(y1, sigma=1.0)
    l2 = ExponentialFamily("poisson", indices=idx)(y2)
    np.testing.assert_allclose(
        float(lik.loglik(x)), float(l1.loglik(x)) + float(l2.loglik(x)), rtol=1e-10
    )
    _check_grad_hess(lik, x)
    z = ZeroLikelihood()
    assert float(z.loglik(x)) == 0.0
    assert not np.asarray(z.loggrad(x)).any()


def test_jit_with_traced_theta(rng):
    """Likelihood construction inside jit with traced hyperparameters."""
    y = jnp.asarray(rng.normal(size=M))
    x = jnp.asarray(rng.normal(size=M))
    model = ExponentialFamily("normal")

    @jax.jit
    def ll(sigma):
        return model(y, sigma=sigma).loglik(x)

    v1 = float(ll(jnp.asarray(1.0)))
    v2 = float(ll(jnp.asarray(2.0)))
    assert v1 != v2
    g = float(jax.grad(ll)(jnp.asarray(1.5)))
    assert np.isfinite(g)


def test_kwarg_alias(rng):
    y = rng.normal(size=M)
    model = ExponentialFamily("normal", sigma="obs_std")
    assert model.hyperparameters == ("obs_std",)
    lik = model(y, obs_std=1.3)
    x = jnp.zeros(M)
    ref = ExponentialFamily("normal")(y, sigma=1.3)
    np.testing.assert_allclose(float(lik.loglik(x)), float(ref.loglik(x)), rtol=1e-12)


# ---- conditional_distribution (predictive) ---------------------------------
# Reference: src/observation_models/observation_model.jl:119-154,
# exponential_family.jl:214-274, linearly_transformed.jl:372-377.


class TestConditionalDistribution:
    def test_poisson_moments_and_logpdf(self, rng):
        import scipy.stats as st
        from tpu_gmrf import conditional_distribution

        x = jnp.asarray(rng.normal(size=12))
        model = ExponentialFamily("poisson")
        d = conditional_distribution(model, x)
        mu = np.exp(np.asarray(x))
        np.testing.assert_allclose(np.asarray(d.mean()), mu, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(d.var()), mu, rtol=1e-6)
        y = rng.poisson(mu).astype(float)
        np.testing.assert_allclose(
            np.asarray(d.logpdf(y)), st.poisson.logpmf(y, mu), rtol=1e-6
        )

    def test_poisson_offset(self, rng):
        from tpu_gmrf import conditional_distribution

        x = jnp.asarray(rng.normal(size=5))
        off = jnp.asarray(np.log(rng.uniform(1, 4, size=5)))
        d = conditional_distribution(ExponentialFamily("poisson"), x, offset=off)
        np.testing.assert_allclose(
            np.asarray(d.mean()), np.exp(np.asarray(x) + np.asarray(off)), rtol=1e-6
        )

    def test_bernoulli_binomial_negbin_gamma(self, rng):
        import scipy.stats as st
        from tpu_gmrf import conditional_distribution

        x = jnp.asarray(rng.normal(size=8))
        p = 1 / (1 + np.exp(-np.asarray(x)))

        d = conditional_distribution(ExponentialFamily("bernoulli"), x)
        np.testing.assert_allclose(np.asarray(d.mean()), p, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(d.var()), p * (1 - p), rtol=1e-6)

        d = conditional_distribution(ExponentialFamily("binomial"), x, trials=7.0)
        np.testing.assert_allclose(np.asarray(d.mean()), 7 * p, rtol=1e-6)
        y = rng.binomial(7, p).astype(float)
        np.testing.assert_allclose(
            np.asarray(d.logpdf(y)), st.binom.logpmf(y, 7, p), rtol=1e-5
        )

        mu = np.exp(np.asarray(x))
        d = conditional_distribution(ExponentialFamily("negbin"), x, r=3.0)
        np.testing.assert_allclose(np.asarray(d.mean()), mu, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(d.var()), mu + mu**2 / 3.0, rtol=1e-6)

        d = conditional_distribution(ExponentialFamily("gamma"), x, phi=2.5)
        np.testing.assert_allclose(np.asarray(d.mean()), mu, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(d.var()), mu**2 / 2.5, rtol=1e-6)

    def test_sampling_matches_moments(self):
        from tpu_gmrf import conditional_distribution

        x = jnp.full((4,), 1.2)
        d = conditional_distribution(ExponentialFamily("poisson"), x)
        keys = jax.random.split(jax.random.PRNGKey(0), 4000)
        samp = jax.vmap(d.sample)(keys)
        np.testing.assert_allclose(
            float(jnp.mean(samp)), float(np.exp(1.2)), rtol=0.05
        )

    def test_linearly_transformed_forwarding(self, rng):
        from tpu_gmrf import (
            LinearlyTransformedObservationModel,
            conditional_distribution,
        )

        A = jnp.asarray(rng.normal(size=(6, 4)))
        b = jnp.asarray(rng.normal(size=6))
        model = LinearlyTransformedObservationModel(
            ExponentialFamily("bernoulli"), A, b=b
        )
        x = jnp.asarray(rng.normal(size=4))
        d = conditional_distribution(model, x)
        eta = np.asarray(A @ x + b)
        np.testing.assert_allclose(
            np.asarray(d.mean()), 1 / (1 + np.exp(-eta)), rtol=1e-6
        )

    def test_nlsq_normal_predictive(self, rng):
        from tpu_gmrf import NonlinearLeastSquaresModel, conditional_distribution

        f = lambda x: jnp.tanh(x) ** 2
        model = NonlinearLeastSquaresModel(f)
        x = jnp.asarray(rng.normal(size=5))
        d = conditional_distribution(model, x, sigma=0.3)
        np.testing.assert_allclose(
            np.asarray(d.mean()), np.tanh(np.asarray(x)) ** 2, rtol=1e-6
        )
        np.testing.assert_allclose(np.asarray(d.var()), 0.09, rtol=1e-6)

    def test_jittable(self, rng):
        from tpu_gmrf import conditional_distribution

        model = ExponentialFamily("poisson")

        @jax.jit
        def predict(x):
            d = conditional_distribution(model, x)
            return d.mean(), d.var()

        x = jnp.asarray(rng.normal(size=9))
        m, v = predict(x)
        np.testing.assert_allclose(np.asarray(m), np.exp(np.asarray(x)), rtol=1e-6)


class TestParameterizedDesign:
    """θ-dependent design matrices / offsets with fixed patterns
    (reference linearly_transformed.jl:40-104)."""

    def test_parameterized_offset_routing(self, rng):
        from tpu_gmrf import (
            LinearlyTransformedObservationModel,
            ParameterizedOffset,
        )

        A = jnp.asarray(rng.normal(size=(6, 4)))
        y = rng.normal(size=6)
        base = ExponentialFamily("normal")
        off = ParameterizedOffset(
            lambda s: s * jnp.arange(6.0), hyperparameters=("s",)
        )
        model = LinearlyTransformedObservationModel(base, A, b=off)
        assert model.hyperparameters == ("sigma", "s")
        lik = model(y, sigma=1.0, s=0.5)
        x = jnp.asarray(rng.normal(size=4))
        ref = LinearlyTransformedObservationModel(
            base, A, b=0.5 * np.arange(6.0)
        )(y, sigma=1.0)
        np.testing.assert_allclose(float(lik.loglik(x)), float(ref.loglik(x)), rtol=1e-12)

    def test_parameterized_matrix_grad(self, rng):
        from tpu_gmrf import (
            LinearlyTransformedObservationModel,
            ParameterizedMatrix,
        )

        A0 = jnp.asarray(rng.normal(size=(5, 3)))
        y = rng.normal(size=5)
        pm = ParameterizedMatrix(lambda c: c * A0, hyperparameters=("c",), n_latent=3)
        model = LinearlyTransformedObservationModel(ExponentialFamily("normal"), pm)
        x = jnp.asarray(rng.normal(size=3))

        @jax.jit
        def ll(c):
            return model(y, sigma=1.0, c=c).loglik(x)

        g = float(jax.grad(ll)(jnp.asarray(0.7)))
        eps = 1e-5
        fd = (float(ll(jnp.asarray(0.7 + eps))) - float(ll(jnp.asarray(0.7 - eps)))) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-4)
