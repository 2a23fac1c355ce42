"""Sparse-AD Hessian/Jacobian extraction wired into the AutoDiff models.

Reference parity: ext/GaussianMarkovRandomFieldsSparseADLikelihoods.jl:1-97
(pattern-restricted Hessians for AutoDiff priors/likelihoods) and
src/observation_models/nonlinear_least_squares.jl:16-316 (sparse Jacobian
Gauss-Newton). Here the machinery is colored jvp/HVP passes restricted to a
static pattern — number of passes = chromatic number, no n×n arrays.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_gmrf import (
    AutoDiffLatentPrior,
    AutoDiffObservationModel,
    ExponentialFamily,
    detect_hessian_pattern,
    gaussian_approximation,
    sparse_hessian_map,
)
from tpu_gmrf.observations.autodiff import NonlinearLeastSquaresModel
from tpu_gmrf.sparse.pattern import SparsePattern


def banded_pattern(n, b):
    rows, cols = [], []
    for k in range(-b, b + 1):
        i = np.arange(max(0, -k), min(n, n - k))
        rows.append(i)
        cols.append(i + k)
    return SparsePattern(np.concatenate(rows), np.concatenate(cols), (n, n))


def _chain_logdensity(x, kappa):
    # tridiagonal Hessian: pairwise quartic coupling + pointwise term
    return -0.5 * kappa * jnp.sum((x[1:] - x[:-1]) ** 4) - jnp.sum(jnp.cosh(x))


def test_sparse_hessian_matches_dense():
    n = 24
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    pat = banded_pattern(n, 1)
    f = lambda v: _chain_logdensity(v, 2.0)
    Hs = sparse_hessian_map(f, x, pat)
    Hd = jax.hessian(f)(x)
    np.testing.assert_allclose(np.asarray(Hs.todense()), np.asarray(Hd), atol=1e-10)


def test_detect_hessian_pattern_banded():
    n = 12
    pat = detect_hessian_pattern(lambda x, kappa: _chain_logdensity(x, kappa), n,
                                 theta={"kappa": jnp.asarray(1.5)})
    want = banded_pattern(n, 1)
    assert pat == want


def test_autodiff_prior_pattern_mode_matches_dense_small():
    n = 18
    pat = banded_pattern(n, 1)
    theta = {"kappa": jnp.asarray(3.0)}
    p_sparse = AutoDiffLatentPrior(theta=theta, fn=_chain_logdensity, n=n, hessian=pat)
    p_dense = AutoDiffLatentPrior(theta=theta, fn=_chain_logdensity, n=n)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(n) * 0.3)
    Qs, hs = p_sparse.local_quadratic(x)
    Qd, hd = p_dense.local_quadratic(x)
    np.testing.assert_allclose(np.asarray(Qs.todense()), np.asarray(Qd.todense()), atol=1e-9)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hd), atol=1e-9)


@pytest.mark.slow
def test_autodiff_prior_pattern_mode_scales():
    """n=4096 banded prior: one Newton mode via the sparse path — would be
    a 4096² dense Hessian (134 MB f64) per iteration in 'dense' mode."""
    n = 4096
    pat = banded_pattern(n, 1)
    prior = AutoDiffLatentPrior(
        theta={"kappa": jnp.asarray(1.0)}, fn=_chain_logdensity, n=n, hessian=pat
    )
    y = np.random.default_rng(2).poisson(1.0, size=n).astype(np.float64)
    lik = ExponentialFamily("poisson")(y)
    post = gaussian_approximation(prior, lik)
    m = np.asarray(post.mean)
    assert m.shape == (n,) and np.all(np.isfinite(m))


def test_autodiff_likelihood_pattern_mode():
    n = 16
    # s_i couples x_{i-2..i+2}; the squared-error Hessian is JᵀJ-shaped → band 4
    pat = banded_pattern(n, 4)

    def ll(x, y, w):
        s = x + 0.3 * jnp.tanh(jnp.convolve(x, jnp.ones(5) / 5.0, mode="same"))
        return -0.5 * w * jnp.sum((y - s) ** 2)

    y = jnp.asarray(np.random.default_rng(3).standard_normal(n))
    lik_s = AutoDiffObservationModel(ll, hessian=pat)(y, w=jnp.asarray(1.3))
    lik_d = AutoDiffObservationModel(ll)(y, w=jnp.asarray(1.3))
    x = jnp.asarray(np.random.default_rng(4).standard_normal(n))
    np.testing.assert_allclose(
        np.asarray(lik_s.loghessian(x).todense()),
        np.asarray(lik_d.loghessian(x).todense()),
        atol=1e-10,
    )


def test_nlsq_sparse_jacobian_matches_dense():
    n, m = 20, 20

    def f(x):
        return jnp.sin(x) + 0.5 * jnp.roll(x, 1) ** 2

    rows = np.concatenate([np.arange(m), np.arange(m)])
    cols = np.concatenate([np.arange(n), (np.arange(n) - 1) % n])
    jp = SparsePattern(rows, cols, (m, n))
    y = jnp.asarray(np.random.default_rng(5).standard_normal(m))
    lik_s = NonlinearLeastSquaresModel(f, jac_pattern=jp)(y, sigma=0.7)
    lik_d = NonlinearLeastSquaresModel(f)(y, sigma=0.7)
    x = jnp.asarray(np.random.default_rng(6).standard_normal(n))
    np.testing.assert_allclose(
        np.asarray(lik_s.loghessian(x).todense()),
        np.asarray(lik_d.loghessian(x).todense()),
        atol=1e-10,
    )
    np.testing.assert_allclose(np.asarray(lik_s.loglik(x)), np.asarray(lik_d.loglik(x)))
    np.testing.assert_allclose(
        np.asarray(lik_s.loggrad(x)), np.asarray(lik_d.loggrad(x)), atol=1e-12
    )
