import numpy as np
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
