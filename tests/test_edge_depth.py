"""Edge-case depth tests (VERDICT r3 LoC diagnostic): workspace coherence
under stress, composite observation routing corners, and cross-AD-mode
gradient agreement through the Laplace approximation — the axes where the
reference's 17.8 kLoC test suite goes deeper than ours
(reference test/workspace/ 9 files, test/observation_models/composite/*,
test/autodiff/ cross-backend agreement)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tpu_gmrf as tg
from tpu_gmrf import (
    CompositeObservationModel,
    ExponentialFamily,
    GAOptions,
    LinearlyTransformedObservationModel,
    ZeroLikelihood,
    gaussian_approximation,
    laplace_marginal,
)


# ----------------------------------------------------------- cross-AD mode --


@pytest.mark.parametrize("case", ["ar1", "rw2_constrained", "matern_supernodal"])
def test_laplace_marginal_fwd_rev_agree(case, rng):
    """jacfwd (custom_jvp IFT) and grad (transposed tangent) must agree to
    near machine precision on the same Laplace marginal — the analogue of
    the reference's ForwardDiff-vs-Zygote agreement tests."""
    if case == "ar1":
        n = 60
        model = tg.AR1Model(n)
        y = rng.poisson(2.0, n).astype(np.float64)
        obs = ExponentialFamily("poisson")
        theta0 = np.array([0.3, 0.2])

        def ml(z):
            return laplace_marginal(
                model, obs, y, dict(tau=jnp.exp(z[0]), rho=jnp.tanh(z[1])),
                options=GAOptions(max_iter=25),
            )

    elif case == "rw2_constrained":
        n = 50
        model = tg.RWModel(n, order=2)  # rank-deficient, polynomial constraints
        y = (rng.uniform(size=n) < 0.6).astype(np.float64)
        obs = ExponentialFamily("bernoulli")
        theta0 = np.array([0.1])

        def ml(z):
            return laplace_marginal(
                model, obs, y, dict(tau=jnp.exp(z[0])),
                options=GAOptions(max_iter=25),
            )

    else:
        pts = rng.uniform(0, 1, size=(40, 2))
        model = tg.MaternModel(
            pts, smoothness=1, solver=tg.SolverSpec(kind="supernodal")
        )
        y = rng.poisson(1.5, model.n).astype(np.float64)
        obs = ExponentialFamily("poisson")
        theta0 = np.array([0.2, np.log(0.4)])

        def ml(z):
            return laplace_marginal(
                model, obs, y, dict(tau=jnp.exp(z[0]), range=jnp.exp(z[1])),
                options=GAOptions(max_iter=25),
            )

    z0 = jnp.asarray(theta0)
    g_fwd = np.asarray(jax.jacfwd(ml)(z0))
    g_rev = np.asarray(jax.grad(ml)(z0))
    np.testing.assert_allclose(g_fwd, g_rev, rtol=5e-5, atol=1e-7)


# ------------------------------------------------------ workspace coherence --


def test_workspace_shared_across_posteriors(rng):
    """One workspace, several θ evaluations interleaved with posterior use:
    later evaluations must not corrupt earlier GMRFs (immutability contract
    replacing the reference's version tags, workspace_gmrf.jl ensure_loaded!)."""
    model = tg.RW1Model(30)
    ws = tg.make_workspace(model, obs_hessian="diag")
    y = rng.poisson(2.0, 30).astype(np.float64)
    lik = ExponentialFamily("poisson")(jnp.asarray(y))

    g1 = ws.evaluate(tau=0.5)
    g2 = ws.evaluate(tau=3.0)
    # using g2 first must not affect g1's values
    post2 = gaussian_approximation(g2, lik)
    post1 = gaussian_approximation(g1, lik)
    ref1 = gaussian_approximation(model(tau=0.5), lik)
    ref2 = gaussian_approximation(model(tau=3.0), lik)
    np.testing.assert_allclose(np.asarray(post1.mean), np.asarray(ref1.mean), atol=1e-6)
    np.testing.assert_allclose(np.asarray(post2.mean), np.asarray(ref2.mean), atol=1e-6)


def test_workspace_pattern_mismatch_raises(rng):
    """A precision with entries OUTSIDE the workspace pattern must raise,
    not silently mis-scatter (reference pattern-mismatch errors,
    latent_model_integration.jl:208-244)."""
    from tpu_gmrf.sparse.matrix import SparseMatrix
    from tpu_gmrf.sparse.pattern import SparsePattern

    model = tg.AR1Model(20)
    ws = tg.make_workspace(model, tau=1.0, rho=0.3)
    # entry (0, 19) lies outside the AR1 tridiagonal ∪ diagonal pattern
    rows = np.concatenate([np.arange(20), [0, 19]])
    cols = np.concatenate([np.arange(20), [19, 0]])
    pat = SparsePattern(rows, cols, (20, 20))
    wrong = SparseMatrix(jnp.ones(len(rows), jnp.float32), pat)
    with pytest.raises((ValueError, KeyError)):
        ws.factorize(wrong)


def test_workspace_pool_batch_evaluate_matches_loop(rng):
    model = tg.AR1Model(25)
    pool = tg.make_workspace_pool(model, size=2)
    taus = np.array([0.5, 1.0, 2.0, 4.0])
    rhos = np.array([0.1, 0.3, 0.5, 0.7])

    out = pool.batch_evaluate(
        lambda g: g.logpdf(jnp.zeros(25)), batch_size=2, tau=taus, rho=rhos
    )
    for i in range(4):
        direct = float(model(tau=float(taus[i]), rho=float(rhos[i])).logpdf(jnp.zeros(25)))
        np.testing.assert_allclose(float(out[i]), direct, rtol=1e-5)


# ---------------------------------------------------- composite routing -----


def test_composite_three_way_routing(rng):
    """Composite of (indices-subset Poisson, linearly-transformed Normal
    with offset, Zero): loglik/grad/hess must equal the dense manual sum."""
    n = 12
    idx = np.array([1, 4, 7])
    y_p = rng.poisson(2.0, size=3).astype(np.float64)
    A = rng.normal(size=(5, n))
    b = rng.normal(size=5)
    y_n = rng.normal(size=5)

    lt = LinearlyTransformedObservationModel(
        ExponentialFamily("normal"), jnp.asarray(A), b=jnp.asarray(b)
    )
    comp = CompositeObservationModel(
        ExponentialFamily("poisson", indices=idx), lt
    )
    lik = comp((jnp.asarray(y_p), jnp.asarray(y_n)), sigma=0.7)
    x = jnp.asarray(rng.normal(size=n))
    eta_p = np.asarray(x)[idx]
    eta_n = A @ np.asarray(x) + b

    # routing: composite loglik == sum of standalone component likelihoods
    l_p = ExponentialFamily("poisson", indices=idx)(jnp.asarray(y_p))
    l_n = lt(jnp.asarray(y_n), sigma=0.7)
    np.testing.assert_allclose(
        float(lik.loglik(x)), float(l_p.loglik(x)) + float(l_n.loglik(x)), rtol=1e-6
    )

    g_manual = np.zeros(n)
    g_manual[idx] += y_p - np.exp(eta_p)
    g_manual += A.T @ ((y_n - eta_n) / 0.7**2)
    np.testing.assert_allclose(np.asarray(lik.loggrad(x)), g_manual, rtol=1e-5, atol=1e-10)

    H = np.asarray(lik.loghessian(x).todense())
    H_manual = np.zeros((n, n))
    H_manual[idx, idx] += -np.exp(eta_p)
    H_manual += A.T @ (-np.eye(5) / 0.7**2) @ A
    np.testing.assert_allclose(H, H_manual, rtol=1e-5, atol=1e-8)


def test_composite_with_zero_component_matches_without(rng):
    n = 8
    y = rng.poisson(1.0, size=n).astype(np.float64)
    with_zero = CompositeObservationModel(
        ExponentialFamily("poisson"), lambda y_, **k: ZeroLikelihood()
    )
    lik_z = with_zero((jnp.asarray(y), None))
    lik = ExponentialFamily("poisson")(jnp.asarray(y))
    x = jnp.asarray(rng.normal(size=n))
    np.testing.assert_allclose(float(lik_z.loglik(x)), float(lik.loglik(x)), rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(lik_z.loggrad(x)), np.asarray(lik.loggrad(x)), rtol=1e-6
    )


# -------------------------------------------- conjugate short-circuit -------


def test_ga_conjugate_matches_linear_condition(rng):
    """gaussian_approximation with a Normal/Identity likelihood must equal
    the conjugate linear_condition path exactly (reference short-circuit,
    gaussian_approximation.jl:323-415)."""
    n = 30
    model = tg.AR1Model(n)
    prior = model(tau=1.2, rho=0.6)
    y = rng.normal(size=n)
    lik = ExponentialFamily("normal")(jnp.asarray(y), sigma=0.5)
    post_ga = gaussian_approximation(prior, lik)
    post_lc = tg.linear_condition(prior, jnp.asarray(y), Q_eps=1.0 / 0.25)
    np.testing.assert_allclose(
        np.asarray(post_ga.mean), np.asarray(post_lc.mean), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(post_ga.std()), np.asarray(post_lc.std()), atol=1e-5
    )


def test_reverse_mode_through_banded_inner_solver(rng):
    """Regression (r5): reverse mode through laplace_marginal with the
    BANDED inner solver used to die in scan transposition (ValAccum leak);
    the IFT tangent solve now rides lax.custom_linear_solve. Gradients
    must agree across banded/dense inner backends."""
    import jax.numpy as jnp

    from tpu_gmrf import ExponentialFamily, GAOptions, MaternModel, laplace_marginal
    from tpu_gmrf.solvers.base import SolverSpec

    gx, gy = np.meshgrid(np.linspace(0, 1, 7), np.linspace(0, 1, 7))
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    model = MaternModel(pts, smoothness=1)
    y = rng.poisson(1.0, size=model.n).astype(np.float64)
    obs = ExponentialFamily("poisson")

    def grad_with(kind):
        opts = GAOptions(max_iter=8, inner_solver=SolverSpec(kind=kind))

        def f(t):
            return laplace_marginal(
                model, obs, jnp.asarray(y),
                {"tau": jnp.exp(t[0]), "range": jnp.exp(t[1])}, options=opts,
            )

        return np.asarray(jax.grad(f)(jnp.asarray([0.0, -1.2])))

    gb = grad_with("banded")
    gd = grad_with("dense")
    np.testing.assert_allclose(gb, gd, rtol=1e-4, atol=1e-6)
