import numpy as np
import jax
import jax.numpy as jnp

from tpu_gmrf import (
    AR1Model,
    ExponentialFamily,
    GMRF,
    IIDModel,
    from_scipy,
    gaussian_approximation,
)
from tpu_gmrf.inference.marginals import (
    conditional_predictive_ordinates,
    linear_predictor_marginals,
    waic,
)
from tpu_gmrf.observations import (
    CompositeObservationModel,
    LinearlyTransformedObservationModel,
)
from tpu_gmrf.solvers.rbmc import rbmc_var
from tpu_gmrf.solvers.cg import (
    block_jacobi_preconditioner,
    cg_solve,
    jacobi_preconditioner,
    temporal_block_gauss_seidel_preconditioner,
)
from tests.conftest import random_sparse_spd


def test_lpm_ef_subset(rng):
    n = 12
    prior = AR1Model(n)(tau=1.0, rho=0.5)
    idx = np.array([2, 5, 9])
    y = rng.poisson(2.0, size=3).astype(np.float64)
    lik = ExponentialFamily("poisson", indices=idx)(y)
    post = gaussian_approximation(prior, lik)
    mu, v, eta_lik = linear_predictor_marginals(post, lik)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(post.mean)[idx], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(v), np.asarray(post.var())[idx], rtol=1e-10)
    # eta_lik consumes mu directly
    np.testing.assert_allclose(
        float(eta_lik.loglik(mu)), float(lik.loglik(post.mean)), rtol=1e-10
    )


def test_lpm_linearly_transformed(rng):
    import scipy.sparse as sp
    from tpu_gmrf.sparse import from_scipy as fs

    n, m = 10, 6
    prior = AR1Model(n)(tau=1.0, rho=0.3)
    A = sp.random(m, n, density=0.5, random_state=np.random.RandomState(0)) + sp.eye(m, n)
    Asp = fs(A.tocsr())
    b = rng.normal(size=m)
    y = rng.normal(size=m)
    model = LinearlyTransformedObservationModel(ExponentialFamily("normal"), Asp, b)
    lik = model(y, sigma=0.5)
    post = gaussian_approximation(prior, lik)
    mu, v, eta_lik = linear_predictor_marginals(post, lik)
    Ad = A.toarray()
    Sig = np.linalg.inv(np.asarray(post.Q.todense()))
    np.testing.assert_allclose(np.asarray(mu), Ad @ np.asarray(post.mean) + b, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.diag(Ad @ Sig @ Ad.T), rtol=1e-6)


def test_lpm_constrained(rng):
    n = 10
    prior = IIDModel(n, constraint="sumtozero")(tau=1.0)
    y = rng.normal(size=n)
    lik = ExponentialFamily("normal")(y, sigma=0.5)
    post = gaussian_approximation(prior, lik)
    mu, v, _ = linear_predictor_marginals(post, lik)
    np.testing.assert_allclose(np.asarray(v), np.asarray(post.var()), rtol=1e-8)


def test_lpm_composite(rng):
    n = 8
    prior = AR1Model(n)(tau=1.0, rho=0.4)
    y1 = rng.normal(size=n)
    idx = np.arange(4)
    y2 = rng.poisson(2.0, size=4).astype(np.float64)
    comp = CompositeObservationModel(
        ExponentialFamily("normal"),
        ExponentialFamily("poisson", indices=idx),
    )
    lik = comp((y1, y2), sigma=1.0)
    post = gaussian_approximation(prior, lik)
    mu, v, eta_lik = linear_predictor_marginals(post, lik)
    assert mu.shape == (12,)
    np.testing.assert_allclose(np.asarray(mu[:8]), np.asarray(post.mean), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(mu[8:]), np.asarray(post.mean)[idx], rtol=1e-8)
    # re-indexed composite evaluates against mu
    total = float(eta_lik.loglik(mu))
    ref = float(lik.loglik(post.mean))
    np.testing.assert_allclose(total, ref, rtol=1e-8)


def test_waic_cpo(rng):
    n = 15
    prior = AR1Model(n)(tau=1.0, rho=0.5)
    y = rng.poisson(2.0, size=n).astype(np.float64)
    lik = ExponentialFamily("poisson")(y)
    post = gaussian_approximation(prior, lik)
    w, elpd, p_eff = waic(post, lik, jax.random.PRNGKey(0), num_samples=300)
    assert np.isfinite(float(w)) and float(p_eff) > 0
    log_cpo = conditional_predictive_ordinates(post, lik, jax.random.PRNGKey(1), 300)
    assert log_cpo.shape == (n,)
    assert np.all(np.isfinite(np.asarray(log_cpo)))


def test_rbmc_var(rng):
    n = 20
    g = GMRF.from_precision(jnp.zeros(n), from_scipy(random_sparse_spd(rng, n)))
    v_exact = np.asarray(g.var())
    v_rbmc = np.asarray(rbmc_var(g, jax.random.PRNGKey(0), n_samples=4000))
    np.testing.assert_allclose(v_rbmc, v_exact, rtol=0.15)


def test_cg_with_preconditioners(rng):
    n = 60
    S = random_sparse_spd(rng, n)
    Q = from_scipy(S)
    b = jnp.asarray(rng.normal(size=n))
    x_ref = np.linalg.solve(S.toarray(), np.asarray(b))
    for precond in [
        None,
        jacobi_preconditioner(Q),
        block_jacobi_preconditioner(Q, 16),
    ]:
        x, it, res = cg_solve(Q.matvec, b, preconditioner=precond, tol=1e-10)
        np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-6)


def test_cg_temporal_gs_preconditioner():
    """Block GS preconditioner on a true space-time block-tridiagonal system."""
    from tpu_gmrf.fem import FEMDiscretization, interval_mesh, AdvectionDiffusionSPDE

    d = FEMDiscretization(interval_mesh(0, 1, 15))
    spde = AdvectionDiffusionSPDE(d, gamma=[5.0], kappa=1.0, c=20.0, tau=1.0)
    X = spde.discretize(np.linspace(0, 1, 6))
    Q = X.Q
    n = Q.shape[0]
    b = jnp.asarray(np.random.default_rng(0).normal(size=n))
    x_ref = np.linalg.solve(np.asarray(Q.todense()), np.asarray(b))
    M = temporal_block_gauss_seidel_preconditioner(Q, 15, 6)
    x, it_pre, _ = cg_solve(Q.matvec, b, preconditioner=M, tol=1e-10, max_iter=4000)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-5, atol=1e-8)
    _, it_plain, _ = cg_solve(Q.matvec, b, tol=1e-10, max_iter=4000)
    assert int(it_pre) < int(it_plain)


def test_lt_marginals_selinv_path_supernodal(monkeypatch):
    """The SparseMatrix-A variance path must go through ONE factor.selinv
    pass (reference selinv_extract_at, src/workspace/backend.jl:112-177) —
    the identity-column fallback is forbidden here — and match dense."""
    import tpu_gmrf.inference.marginals as marg
    from tpu_gmrf import MaternModel, linear_condition
    from tpu_gmrf.solvers import SolverSpec

    rng = np.random.default_rng(3)
    gx, gy = np.meshgrid(np.linspace(0, 1, 12), np.linspace(0, 1, 12))
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    model = MaternModel(pts, smoothness=1, solver=SolverSpec(kind="supernodal"))
    prior = model(tau=1.0, range=0.4)
    obs_pts = rng.uniform(0.05, 0.95, size=(40, 2))
    A = model.evaluation_matrix(obs_pts)
    y = rng.normal(size=40)
    post = linear_condition(prior, jnp.asarray(y), Q_eps=4.0, A=A)

    def boom(*a, **k):
        raise AssertionError("fell back to identity-column solves")

    monkeypatch.setattr(marg, "_inverse_entries", boom)
    from tpu_gmrf.observations import LinearlyTransformedObservationModel

    lt = LinearlyTransformedObservationModel(ExponentialFamily("normal"), A)
    lik = lt(jnp.asarray(y), sigma=0.5)
    mu, v, _ = linear_predictor_marginals(post, lik)
    # dense oracle
    Sig = np.linalg.inv(np.asarray(post.Q.todense()))
    Ad = np.asarray(A.todense())
    np.testing.assert_allclose(np.asarray(v), np.diag(Ad @ Sig @ Ad.T), rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(mu), Ad @ np.asarray(post.mean), rtol=1e-6, atol=1e-10)


def test_block_rbmc_var_converges():
    """BlockRBMC (reference src/solvers/rbmc.jl:109-160): with enough samples
    the block estimator matches exact variances, and it beats plain RBMC at
    equal sample count on a correlated field."""
    from tpu_gmrf import AR1Model
    from tpu_gmrf.solvers.rbmc import block_rbmc_var, rbmc_var

    model = AR1Model(120)
    g = model(tau=1.0, rho=0.9)
    exact = np.asarray(g.var())
    key = jax.random.PRNGKey(0)
    est_b = np.asarray(block_rbmc_var(g, key, n_samples=400, enclosure_size=2))
    est_p = np.asarray(rbmc_var(g, key, n_samples=400))
    err_b = np.abs(est_b - exact).max() / exact.max()
    err_p = np.abs(est_p - exact).max() / exact.max()
    assert err_b < 0.15, err_b
    assert err_b < err_p, (err_b, err_p)


def test_full_cholesky_preconditioner_one_step():
    """P = Q ⇒ CG converges in one iteration (reference
    src/preconditioners/full_cholesky.jl:15-35)."""
    from tpu_gmrf import from_scipy
    from tpu_gmrf.solvers.cg import cg_solve, full_cholesky_preconditioner

    rng = np.random.default_rng(1)
    Q = from_scipy(random_sparse_spd(rng, 80))
    b = jnp.asarray(rng.normal(size=80))
    M = full_cholesky_preconditioner(Q)
    x, iters, res = cg_solve(Q.matvec, b, preconditioner=M, tol=1e-10)
    assert int(iters) <= 2
    np.testing.assert_allclose(
        np.asarray(Q.matvec(x)), np.asarray(b), rtol=1e-7, atol=1e-8
    )
