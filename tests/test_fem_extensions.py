import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_gmrf.fem import (
    BarrierModel,
    FEMDiscretization,
    MaternModel,
    MaternSPDE,
    create_inflated_rectangle,
    interval_mesh,
)
from tpu_gmrf.observations import ObsFactorGroup, StructuredObservationModel
from tpu_gmrf import AR1Model, gaussian_approximation


def test_boundary_nodes():
    mesh = create_inflated_rectangle(0, 0, 1, 1, h=0.25)
    d = FEMDiscretization(mesh)
    b = d.boundary_nodes()
    verts = mesh.vertices[b]
    on_edge = (
        np.isclose(verts[:, 0], 0)
        | np.isclose(verts[:, 0], 1)
        | np.isclose(verts[:, 1], 0)
        | np.isclose(verts[:, 1], 1)
    )
    assert on_edge.all()
    # all 16 perimeter nodes of the 5x5 grid
    assert len(b) == 16
    d1 = FEMDiscretization(interval_mesh(0, 1, 10))
    np.testing.assert_array_equal(d1.boundary_nodes(), [0, 9])


def test_derivative_matrix():
    mesh = create_inflated_rectangle(0, 0, 1, 1, h=0.25)
    d = FEMDiscretization(mesh)
    pts = np.array([[0.4, 0.6], [0.7, 0.3]])
    Dx = d.derivative_matrix(pts, dim=0)
    Dy = d.derivative_matrix(pts, dim=1)
    # derivative of u = 2x - 3y
    u = jnp.asarray(2 * mesh.vertices[:, 0] - 3 * mesh.vertices[:, 1])
    np.testing.assert_allclose(np.asarray(Dx.matvec(u)), [2.0, 2.0], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(Dy.matvec(u)), [-3.0, -3.0], rtol=1e-10)
    # 1D
    d1 = FEMDiscretization(interval_mesh(0, 1, 21))
    D1 = d1.derivative_matrix([0.33])
    u1 = jnp.asarray(4 * d1.mesh.nodes)
    np.testing.assert_allclose(np.asarray(D1.matvec(u1)), [4.0], rtol=1e-9)


def test_dirichlet_boundary_conditions():
    """Soft Dirichlet: boundary variance = boundary_noise², interior
    unaffected far from the boundary, and field → 0 at the boundary."""
    mesh = create_inflated_rectangle(0, 0, 1, 1, h=0.1)
    d = FEMDiscretization(mesh)
    noise = 1e-3
    m = MaternModel(d, smoothness=1, bc="dirichlet", boundary_noise=noise)
    g = m(tau=1.0, range=0.3)
    v = np.asarray(g.var())
    b = d.boundary_nodes()
    np.testing.assert_allclose(v[b], noise**2, rtol=1e-3)
    interior_mask = np.ones(d.ndofs, bool)
    interior_mask[b] = False
    assert v[interior_mask].max() > 0.3  # interior keeps real variance
    # samples vanish at the boundary
    x = np.asarray(g.sample(jax.random.PRNGKey(0)))
    assert np.abs(x[b]).max() < 5 * noise


def test_barrier_model_reduces_to_matern():
    """No barrier elements + uniform range == stationary ν=1 Matérn
    (smoothness=0), per the reference's reduction property."""
    mesh = create_inflated_rectangle(0, 0, 1, 1, h=0.2)
    d = FEMDiscretization(mesh)
    bm = BarrierModel(d, barrier_elements=[])
    Qb = np.asarray(bm.precision(tau=1.0, range=0.4).todense())
    Qm = np.asarray(MaternModel(d, smoothness=0).precision(tau=1.0, range=0.4).todense())
    np.testing.assert_allclose(Qb, Qm, rtol=1e-6, atol=1e-8)


def test_barrier_model_blocks_correlation():
    """A vertical barrier strip decorrelates points on opposite sides."""
    mesh = create_inflated_rectangle(0, 0, 2, 1, h=0.1)
    d = FEMDiscretization(mesh)
    centroids = mesh.element_coords().mean(axis=1)
    barrier = np.nonzero(np.abs(centroids[:, 0] - 1.0) < 0.08)[0]
    assert len(barrier) > 0
    bm = BarrierModel(d, barrier_elements=barrier, range_fraction=0.02)
    g = bm(tau=1.0, range=0.8)
    Sig = np.linalg.inv(np.asarray(g.Q.todense()))
    verts = mesh.vertices

    def node_at(x, y):
        return int(np.argmin(np.linalg.norm(verts - [x, y], axis=1)))

    a = node_at(0.8, 0.5)
    c = node_at(1.2, 0.5)  # across the barrier, distance 0.4
    e = node_at(0.4, 0.5)  # same side, distance 0.4
    corr_across = Sig[a, c] / np.sqrt(Sig[a, a] * Sig[c, c])
    corr_same = Sig[a, e] / np.sqrt(Sig[a, a] * Sig[e, e])
    assert corr_same > 2 * corr_across
    assert corr_across < 0.35


@pytest.mark.slow
def test_structured_observation_model(rng):
    """Pairwise difference observations y_ij ~ N(x_i - x_j, σ) as a factor
    graph; gradients/Hessian match AD; GA runs."""
    n = 12
    pairs = np.stack([rng.integers(0, n, 8), rng.integers(0, n, 8)], axis=1)
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]

    def factor(v, yi, sigma):
        return -0.5 * ((yi - (v[0] - v[1])) / sigma) ** 2 - jnp.log(sigma)

    model = StructuredObservationModel(n, [ObsFactorGroup(pairs, factor)])
    y = rng.normal(size=len(pairs))
    lik = model(y, sigma=jnp.asarray(0.5))
    x = jnp.asarray(rng.normal(size=n))
    g_ad = jax.grad(lik.loglik)(x)
    np.testing.assert_allclose(np.asarray(lik.loggrad(x)), np.asarray(g_ad), rtol=1e-8)
    H_ad = np.asarray(jax.hessian(lik.loglik)(x))
    np.testing.assert_allclose(
        np.asarray(lik.loghessian(x).todense()), H_ad, atol=1e-8
    )
    prior = AR1Model(n)(tau=1.0, rho=0.5)
    post = gaussian_approximation(prior, lik)
    assert np.all(np.isfinite(np.asarray(post.mean)))


def test_manifold_matern_on_sphere():
    """Matérn SPDE on an embedded sphere mesh: evaluation via closest-point
    projection (reference modelling_on_manifolds.jl + fem_discretization.jl
    embedded-surface paths), intrinsic dimension 2 in the ν conversion."""
    import jax
    import jax.numpy as jnp
    from tpu_gmrf.fem import FEMDiscretization, MaternSPDE, icosphere
    from tpu_gmrf import linear_condition
    from tpu_gmrf.solvers import SolverSpec

    mesh = icosphere(2)  # 162 vertices
    d = FEMDiscretization(mesh)
    assert d.intrinsic_dim == 2 and mesh.embedding_dim == 3
    spde = MaternSPDE(d, smoothness=1)
    prior = spde.discretize(kappa=3.0, solver=SolverSpec(kind="dense"))
    # variance normalization should hold approximately on the closed surface
    v = np.asarray(prior.var())
    assert 0.3 < np.median(v) < 3.0
    # condition on observations at off-vertex points via closest-point eval
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(20, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    A = d.evaluation_matrix(pts)
    Ad = np.asarray(A.todense())
    np.testing.assert_allclose(Ad.sum(axis=1), 1.0, atol=1e-9)
    assert ((Ad >= -1e-12).all()) and (Ad.max() <= 1.0 + 1e-12)
    y = np.sin(2.0 * pts[:, 2])
    post = linear_condition(prior, jnp.asarray(y), Q_eps=100.0, A=A)
    resid = Ad @ np.asarray(post.mean) - y
    assert np.abs(resid).max() < 0.25
    # posterior variance shrinks at observed locations
    vpost = np.asarray(post.var())
    assert np.median(vpost) < np.median(v)


def test_second_derivative_matrix_quadratic():
    """Recovered-gradient second derivative: exact-ish for u = x² away from
    the boundary (reference fem_derivatives.jl:212-253 role)."""
    from tpu_gmrf.fem import FEMDiscretization, interval_mesh

    n = 41
    d = FEMDiscretization(interval_mesh(0.0, 1.0, n))
    u = d.mesh.nodes**2
    pts = np.linspace(0.2, 0.8, 7)
    D2 = d.second_derivative_matrix(pts, dims=(0, 0))
    vals = np.asarray(D2.todense()) @ u
    np.testing.assert_allclose(vals, 2.0, rtol=0.05)
    # 2D: u = x·y, mixed derivative ≈ 1 in the interior
    gx, gy = np.meshgrid(np.linspace(0, 1, 15), np.linspace(0, 1, 15))
    pts2 = np.stack([gx.ravel(), gy.ravel()], axis=1)
    from tpu_gmrf.fem import generate_mesh

    d2 = FEMDiscretization(generate_mesh(pts2))
    u2 = d2.mesh.vertices[:, 0] * d2.mesh.vertices[:, 1]
    q = np.array([[0.4, 0.5], [0.55, 0.45], [0.5, 0.6]])
    Dxy = d2.second_derivative_matrix(q, dims=(0, 1))
    vals2 = np.asarray(Dxy.todense()) @ u2
    np.testing.assert_allclose(vals2, 1.0, atol=0.35)


def test_point_second_derivative_obs_model():
    from tpu_gmrf import ExponentialFamily
    from tpu_gmrf.fem import (
        FEMDiscretization,
        PointSecondDerivativeObsModel,
        interval_mesh,
    )

    d = FEMDiscretization(interval_mesh(0.0, 1.0, 21))
    pts = np.array([0.3, 0.6])
    m = PointSecondDerivativeObsModel(d, pts, ExponentialFamily("normal"))
    lik = m(jnp.asarray([2.0, 2.0]), sigma=0.1)
    u = jnp.asarray(d.mesh.nodes**2)
    assert np.isfinite(float(lik.loglik(u)))
