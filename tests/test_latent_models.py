import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_gmrf import (
    AR1Model,
    ARModel,
    BYM2Model,
    BesagModel,
    CARModel,
    CombinedModel,
    ConstrainedGMRF,
    FixedEffectsModel,
    IIDModel,
    RW1Model,
    RW2Model,
    RWModel,
    SeparableModel,
    generate_car_model,
)


def _grid_adjacency(nx, ny):
    import scipy.sparse as sp

    n = nx * ny
    rows, cols = [], []
    for i in range(nx):
        for j in range(ny):
            k = i * ny + j
            if i + 1 < nx:
                rows += [k, k + ny]
                cols += [k + ny, k]
            if j + 1 < ny:
                rows += [k, k + 1]
                cols += [k + 1, k]
    return sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n)).tocsr()


# ---- AR -------------------------------------------------------------------


def test_ar1_precision_structure():
    m = AR1Model(6)
    Q = np.asarray(m.precision(tau=2.0, rho=0.5).todense())
    assert Q[0, 0] == pytest.approx(2.0)
    assert Q[5, 5] == pytest.approx(2.0)
    assert Q[2, 2] == pytest.approx(2.0 * 1.25)
    assert Q[1, 0] == pytest.approx(-1.0)
    np.testing.assert_allclose(Q, Q.T)


def test_ar1_stationary_marginal_variance():
    tau, rho = 1.7, 0.6
    g = AR1Model(200)(tau=tau, rho=rho)
    v = np.asarray(g.var())
    # interior marginal variance of stationary AR1: 1/(tau*(1-rho^2))
    np.testing.assert_allclose(v[100], 1 / (tau * (1 - rho**2)), rtol=1e-6)


def test_arp_matches_ar1_for_p1_pacf():
    """AR(2) with pacf2=0 must equal AR(1) with rho=pacf1."""
    n = 30
    q1 = np.asarray(AR1Model(n).precision(tau=1.3, rho=0.4).todense())
    q2 = np.asarray(
        ARModel(n, order=2).precision(tau=1.3, pacf1=0.4, pacf2=0.0).todense()
    )
    np.testing.assert_allclose(q2, q1, atol=1e-10)


def test_arp_is_stationary_covariance():
    """AR(2): autocovariance from Q⁻¹ must match Yule-Walker solution."""
    n = 400
    pacf1, pacf2 = 0.5, -0.3
    m = ARModel(n, order=2)
    g = m(tau=1.0, pacf1=pacf1, pacf2=pacf2)
    # Durbin-Levinson: phi2 = pacf2, phi1 = pacf1*(1-pacf2)
    phi1 = pacf1 * (1 - pacf2)
    phi2 = pacf2
    Sig_center = np.linalg.inv(np.asarray(g.Q.todense()))[n // 2]
    rho1 = phi1 / (1 - phi2)
    np.testing.assert_allclose(
        Sig_center[n // 2 + 1] / Sig_center[n // 2], rho1, rtol=1e-5
    )
    # interior variance = innovation var / (stationarity normalization):
    # var = 1/((1+phi2)((1-phi2)^2-phi1^2)) * (1-phi2)  for unit innovations
    var_th = (1 - phi2) / ((1 + phi2) * ((1 - phi2) ** 2 - phi1**2))
    np.testing.assert_allclose(Sig_center[n // 2], var_th, rtol=1e-5)


# ---- RW -------------------------------------------------------------------


def test_rw1_precision_and_constraints():
    m = RW1Model(8)
    Q = np.asarray(m.precision(tau=1.0).todense())
    D = np.diff(np.eye(8), axis=0)
    np.testing.assert_allclose(Q, D.T @ D + 1e-5 * np.eye(8), atol=1e-12)
    A, e = m.constraints()
    assert A.shape == (1, 8)
    np.testing.assert_allclose(A, np.ones((1, 8)))


def test_rw2_nullspace_constraints():
    m = RW2Model(10)
    A, e = m.constraints()
    assert A.shape == (2, 10)
    np.testing.assert_allclose(A[0], np.ones(10))
    np.testing.assert_allclose(A[1], np.arange(1, 11))
    g = m(tau=1.5)
    assert isinstance(g, ConstrainedGMRF)
    x = np.asarray(g.sample(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(A @ x, np.zeros(2), atol=1e-7)


def test_rw_scale_model():
    """Sørbye-Rue scaling: geomean of constrained marginal variances ≈ 1 at τ=1."""
    m = RW1Model(50, scale_model=True)
    g = m(tau=1.0)
    v = np.asarray(g.var())
    gm = np.exp(np.mean(np.log(v)))
    np.testing.assert_allclose(gm, 1.0, rtol=2e-3)


# ---- IID / FixedEffects ---------------------------------------------------


def test_iid_and_fixed_effects():
    g = IIDModel(5)(tau=4.0)
    np.testing.assert_allclose(np.asarray(g.var()), np.full(5, 0.25), rtol=1e-10)
    gc = IIDModel(5, constraint="sumtozero")(tau=4.0)
    assert isinstance(gc, ConstrainedGMRF)
    x = np.asarray(gc.sample(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(x.sum(), 0.0, atol=1e-8)
    fe = FixedEffectsModel(3)
    assert fe.hyperparameters == ()
    Q = np.asarray(fe.precision().todense())
    np.testing.assert_allclose(Q, 1e-6 * np.eye(3))


# ---- Besag / BYM2 ---------------------------------------------------------


def test_besag_structure_and_constraint():
    W = _grid_adjacency(4, 4)
    m = BesagModel(W, normalize_var=False)
    Q = np.asarray(m.precision(tau=2.0).todense())
    L = np.diag(np.asarray(W.sum(axis=1)).ravel()) - W.toarray()
    np.testing.assert_allclose(Q, 2.0 * L + 1e-5 * np.eye(16), atol=1e-12)
    A, e = m.constraints()
    np.testing.assert_allclose(A, np.ones((1, 16)))
    g = m(tau=2.0)
    x = np.asarray(g.sample(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(x.sum(), 0.0, atol=1e-7)


def test_besag_normalization():
    """normalize_var=True → geomean constrained variance ≈ 1 at τ=1."""
    W = _grid_adjacency(5, 5)
    m = BesagModel(W)
    g = m(tau=1.0)
    v = np.asarray(g.var())
    np.testing.assert_allclose(np.exp(np.mean(np.log(v))), 1.0, rtol=2e-3)


def test_besag_disconnected_and_singleton():
    import scipy.sparse as sp

    # two components: a 3-cycle and an isolated node
    W = np.zeros((4, 4))
    W[0, 1] = W[1, 0] = W[1, 2] = W[2, 1] = W[0, 2] = W[2, 0] = 1.0
    m = BesagModel(sp.csr_matrix(W), normalize_var=False, singleton_policy="gaussian")
    Q = np.asarray(m.precision(tau=1.0).todense())
    assert Q[3, 3] == pytest.approx(1.0 + 1e-5)  # proper gaussian singleton
    A, _ = m.constraints()
    assert A.shape == (1, 4)  # only the non-singleton component constrained
    np.testing.assert_allclose(A[0], [1, 1, 1, 0])

    md = BesagModel(sp.csr_matrix(W), normalize_var=False, singleton_policy="degenerate")
    Ad, _ = md.constraints()
    assert Ad.shape == (2, 4)


def test_bym2():
    W = _grid_adjacency(3, 3)
    m = BYM2Model(W)
    assert m.n == 18
    assert m.hyperparameters == ("tau", "phi")
    tau, phi = 1.5, 0.4
    Q = np.asarray(m.precision(tau=tau, phi=phi).todense())
    Qb = np.asarray(m.besag.precision(tau=1.0).todense())
    np.testing.assert_allclose(Q[:9, :9], (tau / (1 - phi)) * Qb, atol=1e-12)
    np.testing.assert_allclose(Q[9:, 9:], (tau / phi) * np.eye(9), atol=1e-12)
    assert not Q[:9, 9:].any()
    A, e = m.constraints()
    np.testing.assert_allclose(A, np.concatenate([np.ones(9), np.zeros(9)])[None, :])


# ---- Combined / Separable / CAR ------------------------------------------


def test_combined_model():
    m = CombinedModel(RW1Model(5), IIDModel(3), IIDModel(4))
    assert m.n == 12
    assert m.hyperparameters == ("tau_rw1", "tau_iid", "tau_iid_2")
    Q = np.asarray(
        m.precision(tau_rw1=1.0, tau_iid=2.0, tau_iid_2=3.0).todense()
    )
    np.testing.assert_allclose(Q[5:8, 5:8], 2.0 * np.eye(3))
    np.testing.assert_allclose(Q[8:, 8:], 3.0 * np.eye(4))
    assert not Q[:5, 5:].any()
    A, e = m.constraints()
    assert A.shape == (1, 12)  # only RW1's sum-to-zero
    assert m.component("iid_2").n == 4
    assert m.iid_2.n == 4
    with pytest.raises(ValueError):
        m.precision(tau_rw1=1.0, tau_iid=2.0)  # missing tau_iid_2


def test_separable_kronecker():
    mt = AR1Model(4)
    ms = IIDModel(3)
    m = SeparableModel(mt, ms)
    assert m.n == 12
    assert m.hyperparameters == ("tau_ar1", "rho_ar1", "tau_iid")
    Qt = np.asarray(mt.precision(tau=1.0, rho=0.5).todense())
    Qs = np.asarray(ms.precision(tau=2.0).todense())
    Q = np.asarray(m.precision(tau_ar1=1.0, rho_ar1=0.5, tau_iid=2.0).todense())
    np.testing.assert_allclose(Q, np.kron(Qt, Qs), atol=1e-12)


def test_separable_constraints_redundancy():
    """Two intrinsic factors → kron-expanded constraints, redundancy removed."""
    m = SeparableModel(RW1Model(4), RW1Model(3))
    A, e = m.constraints()
    # rank must equal number of independent constraints
    assert np.linalg.matrix_rank(A) == A.shape[0]
    Q = np.asarray(m.precision(tau_rw1=1.0, tau_rw1_2=1.0).todense())
    # constrained model is proper: can sample + all constraints hold
    g = m(tau_rw1=1.0, tau_rw1_2=1.0)
    x = np.asarray(g.sample(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(A @ x, e, atol=1e-6)


def test_car_model():
    W = _grid_adjacency(3, 3)
    g = generate_car_model(W, rho=0.7, sigma=2.0)
    D = np.diag(np.asarray(W.sum(axis=1)).ravel())
    np.testing.assert_allclose(
        np.asarray(g.Q.todense()), (D - 0.7 * W.toarray()) / 2.0, atol=1e-12
    )


# ---- jit/grad through models ---------------------------------------------


def test_model_jit_grad(rng):
    m = RW1Model(30)
    y = jnp.asarray(rng.normal(size=30))

    @jax.jit
    def nll(log_tau):
        g = m(tau=jnp.exp(log_tau))
        return -g.logpdf(y)

    g1 = float(jax.grad(nll)(jnp.asarray(0.5)))
    eps = 1e-6
    fd = (float(nll(jnp.asarray(0.5 + eps))) - float(nll(jnp.asarray(0.5 - eps)))) / (2 * eps)
    np.testing.assert_allclose(g1, fd, rtol=1e-5)


def test_ar_model_vmap_over_hyperparams():
    m = AR1Model(50)
    taus = jnp.linspace(0.5, 2.0, 8)

    def logdet(tau):
        return m(tau=tau, rho=0.5).logdet_precision()

    out = jax.vmap(logdet)(taus)
    ref = np.array([float(logdet(t)) for t in taus])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-10)
