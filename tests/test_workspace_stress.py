"""Workspace stress suite + statistical sampling validation.

Closes part of the reference test-depth gap (VERDICT r4 item 9): the
reference dedicates test/workspace/ (9 files) to workspace semantics and
test/test_constrained_gmrf.jl to statistical validation of constrained
sampling. The TPU workspace is pure/structural, so the stress axes here
are: evaluate-vs-rebuild equivalence, explicit obs-Hessian union patterns,
pool semantics, chunked batch evaluation, constrained models through the
workspace, and sampling moments against dense oracles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tpu_gmrf as tg
from tpu_gmrf import (
    AR1Model,
    ConstrainedGMRF,
    ExponentialFamily,
    GMRF,
    RWModel,
    from_scipy,
    gaussian_approximation,
)
from tpu_gmrf.sparse.pattern import SparsePattern, union_patterns
from tests.conftest import random_sparse_spd


# ------------------------------------------------------------- workspace ---


def test_workspace_evaluate_matches_rebuild(rng):
    """ws.evaluate(**θ) must equal model(**θ) exactly for every θ — the
    pattern padding adds explicit zeros only (reference
    latent_model_integration.jl:151-179 fast path vs slow path)."""
    model = AR1Model(40)
    ws = tg.make_workspace(model, tau=1.0, rho=0.5)
    z = jnp.asarray(rng.normal(size=40))
    for tau, rho in [(0.5, -0.8), (2.0, 0.0), (3.7, 0.95)]:
        a = ws.evaluate(tau=tau, rho=rho)
        b = model(tau=tau, rho=rho)
        np.testing.assert_allclose(
            float(a.logpdf(z)), float(b.logpdf(z)), rtol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(a.var()), np.asarray(b.var()), rtol=1e-7
        )


def test_workspace_default_theta_ref(rng):
    """make_workspace with no θ_ref uses 1.0 for every hyperparameter
    (reference make_workspace(model; θ_ref...) default)."""
    model = AR1Model(12)
    ws = tg.make_workspace(model)
    g = ws.evaluate(tau=2.0, rho=0.3)
    assert g.n == 12


def test_workspace_explicit_obs_pattern(rng):
    """A LinearlyTransformed observation Hessian AᵀH A is NOT diagonal; the
    workspace must take an explicit pattern and GA through it must match
    direct GA (reference latent_model_integration.jl:116-134 joint
    pattern construction)."""
    n, m = 18, 6
    model = RWModel(n, order=1)
    A = np.zeros((m, n))
    for i in range(m):
        A[i, 2 * i] = 1.0
        A[i, 2 * i + 1] = -0.5
    AtA = (A.T @ A) != 0
    r, c = np.nonzero(AtA)
    pat = SparsePattern(r, c, (n, n))
    ws = tg.make_workspace(model, obs_hessian=pat, tau=1.0)
    y = rng.normal(size=m)
    from tpu_gmrf.observations import LinearlyTransformedObservationModel

    base = ExponentialFamily("normal")
    lt = LinearlyTransformedObservationModel(base, jnp.asarray(A))
    lik = lt(jnp.asarray(y), sigma=0.5)

    prior_ws = ws.evaluate(tau=1.3)
    prior_direct = model(tau=1.3)
    post_ws = gaussian_approximation(prior_ws, lik)
    post_direct = gaussian_approximation(prior_direct, lik)
    np.testing.assert_allclose(
        np.asarray(post_ws.mean), np.asarray(post_direct.mean), atol=1e-6
    )


def test_workspace_pool_semantics():
    """checkout/checkin/with_workspace (reference workspace_pool.jl:44-62);
    the TPU pool is stateless so checkout always returns the workspace."""
    model = AR1Model(10)
    pool = tg.make_workspace_pool(model, size=3, tau=1.0, rho=0.2)
    ws = pool.checkout()
    assert ws is pool.workspace
    pool.checkin(ws)
    out = pool.with_workspace(lambda w: w.evaluate(tau=1.0, rho=0.2).n)
    assert out == 10


def test_workspace_batch_evaluate_chunked_matches_unchunked(rng):
    """batch_evaluate with batch_size must equal the single-dispatch vmap
    AND the per-θ python loop (the thread-pool replacement contract)."""
    model = AR1Model(16)
    pool = tg.make_workspace_pool(model, tau=1.0, rho=0.1)
    taus = np.linspace(0.5, 2.5, 6)
    rhos = np.linspace(-0.5, 0.5, 6)

    def f(g):
        return g.logdet_precision()

    full = np.asarray(pool.batch_evaluate(f, tau=taus, rho=rhos))
    chunked = np.asarray(pool.batch_evaluate(f, batch_size=2, tau=taus, rho=rhos))
    loop = np.array(
        [float(f(model(tau=t, rho=r))) for t, r in zip(taus, rhos)]
    )
    np.testing.assert_allclose(full, chunked, rtol=1e-7)
    np.testing.assert_allclose(full, loop, rtol=1e-6)


def test_workspace_constrained_model(rng):
    """A sum-to-zero-constrained model through the workspace keeps its
    constraint and matches the directly-built ConstrainedGMRF
    (reference test/workspace/test_workspace_constrained.jl)."""
    model = RWModel(14, order=1)  # intrinsic: sum-to-zero constraint
    ws = tg.make_workspace(model, tau=1.0)
    g = ws.evaluate(tau=2.0)
    assert isinstance(g, ConstrainedGMRF)
    x = g.sample(jax.random.PRNGKey(0), (64,))
    np.testing.assert_allclose(np.asarray(x).sum(axis=1), 0.0, atol=1e-3)
    d = model(tau=2.0)
    np.testing.assert_allclose(
        np.asarray(g.mean), np.asarray(d.mean), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(g.var()), np.asarray(d.var()), rtol=1e-5, atol=1e-7
    )


def test_workspace_ga_hot_loop_consistency(rng):
    """The INLA hot loop through one workspace: several θ values, Poisson
    GA each time; every posterior must match a from-scratch build
    (the version-tag/staleness axis of the reference suite — pure
    functions make staleness impossible, equality is the check)."""
    n = 24
    model = AR1Model(n)
    rng_np = np.random.default_rng(7)
    y = rng_np.poisson(1.5, size=n).astype(np.float64)
    lik = ExponentialFamily("poisson")(jnp.asarray(y))
    ws = tg.make_workspace(model, obs_hessian="diag", tau=1.0, rho=0.5)
    for tau, rho in [(1.0, 0.6), (0.4, -0.3), (2.5, 0.9)]:
        p_ws = gaussian_approximation(ws.evaluate(tau=tau, rho=rho), lik)
        p_direct = gaussian_approximation(model(tau=tau, rho=rho), lik)
        np.testing.assert_allclose(
            np.asarray(p_ws.mean), np.asarray(p_direct.mean), atol=1e-6
        )


# ------------------------------------------- statistical sampling checks ---


def test_constrained_sampling_moments(rng):
    """Statistical validation (reference test_constrained_gmrf.jl):
    constrained samples must reproduce the dense-oracle constrained mean
    AND marginal variances within MC error, and var() must match the
    oracle's diagonal exactly."""
    n, m, K = 12, 2, 4000
    S = random_sparse_spd(rng, n)
    mu = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    e = rng.normal(size=m)
    g = GMRF.from_precision(jnp.asarray(mu), from_scipy(S))
    cg = ConstrainedGMRF.create(g, jnp.asarray(A), jnp.asarray(e))

    Sig = np.linalg.inv(S.toarray())
    AQA = A @ Sig @ A.T
    Kmat = Sig @ A.T @ np.linalg.inv(AQA)
    mean_c = mu - Kmat @ (A @ mu - e)
    Sig_c = Sig - Kmat @ A @ Sig

    np.testing.assert_allclose(np.asarray(cg.var()), np.diag(Sig_c), rtol=1e-5, atol=1e-8)

    xs = np.asarray(cg.sample(jax.random.PRNGKey(3), (K,)))
    np.testing.assert_allclose(xs @ A.T, np.tile(e, (K, 1)), atol=1e-6)
    se_mean = np.sqrt(np.diag(Sig_c) / K)
    assert np.all(np.abs(xs.mean(axis=0) - mean_c) < 6 * se_mean + 1e-6)
    # empirical marginal variances within MC error (chi² tail, ~6σ)
    emp_var = xs.var(axis=0)
    se_var = np.diag(Sig_c) * np.sqrt(2.0 / (K - 1))
    assert np.all(np.abs(emp_var - np.diag(Sig_c)) < 6 * se_var + 1e-8)
    # empirical covariance structure: a few off-diagonal entries
    emp_cov = np.cov(xs.T)
    for i, j in [(0, 1), (2, 7), (4, 11)]:
        tol = 6 * np.sqrt(
            (Sig_c[i, i] * Sig_c[j, j] + Sig_c[i, j] ** 2) / K
        )
        assert abs(emp_cov[i, j] - Sig_c[i, j]) < tol + 1e-8


def test_spatiotemporal_sampling_moments():
    """ST sampling statistics: time_rands draws must reproduce time_vars
    within MC error (reference spatiotemporal test suite +
    test/test_gmrf.jl:39-46 statistical pattern)."""
    from tpu_gmrf.fem import (
        AdvectionDiffusionSPDE,
        FEMDiscretization,
        interval_mesh,
    )
    from tpu_gmrf.solvers.base import SolverSpec

    d = FEMDiscretization(interval_mesh(0, 1, 15))
    spde = AdvectionDiffusionSPDE(d, gamma=[0.2], kappa=1.5, c=1.0, tau=1.0)
    X = spde.discretize(np.linspace(0, 1, 4), solver=SolverSpec(kind="dense"))
    K = 3000
    xs = np.asarray(X.time_rands(jax.random.PRNGKey(1), (K,)))
    assert xs.shape == (K, 4, 15)
    v = np.asarray(X.time_vars())
    emp = xs.var(axis=0)
    se = v * np.sqrt(2.0 / (K - 1))
    assert np.all(np.abs(emp - v) < 8 * se + 1e-8)
    mu = np.asarray(X.time_means())
    se_m = np.sqrt(v / K)
    assert np.all(np.abs(xs.mean(axis=0) - mu) < 6 * se_m + 1e-8)
