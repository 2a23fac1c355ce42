"""Tests for the parity layers: MetaGMRF, lazy linear maps, workspace API,
geo I/O, plotting recipes, FEM observation helpers, and the parallel-prefix
recurrence primitives (solvers/prefix.py).

Strategy mirrors the reference's dense-baseline oracles (SURVEY §4):
small systems compared against explicit dense linear algebra.
"""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import tpu_gmrf as tg
from tpu_gmrf.solvers.prefix import linear_recurrence, mobius_recurrence


# ---------------------------------------------------------------- prefix ---
def test_linear_recurrence_matches_sequential(rng):
    n = 137
    alpha = jnp.asarray(rng.uniform(-0.9, 0.9, n))
    beta = jnp.asarray(rng.normal(size=n))
    y = np.zeros(n)
    acc = 0.0
    for k in range(n):
        acc = float(alpha[k]) * acc + float(beta[k])
        y[k] = acc
    np.testing.assert_allclose(np.asarray(linear_recurrence(alpha, beta)), y, atol=1e-10)

    # reverse
    yr = np.zeros(n)
    acc = 0.0
    for k in reversed(range(n)):
        acc = float(alpha[k]) * acc + float(beta[k])
        yr[k] = acc
    np.testing.assert_allclose(
        np.asarray(linear_recurrence(alpha, beta, reverse=True)), yr, atol=1e-10
    )


def test_linear_recurrence_multirhs(rng):
    n, k = 64, 3
    alpha = jnp.asarray(rng.uniform(-0.9, 0.9, n))
    beta = jnp.asarray(rng.normal(size=(n, k)))
    out = np.asarray(linear_recurrence(alpha, beta))
    for j in range(k):
        ref = np.asarray(linear_recurrence(alpha, beta[:, j]))
        np.testing.assert_allclose(out[:, j], ref, atol=1e-12)


def test_mobius_recurrence_continued_fraction(rng):
    # delta_k = a_k - c_{k-1}^2 / delta_{k-1} — the tridiag LDL pivots
    n = 211
    a = 2.0 + rng.random(n)
    c = -0.8 * rng.random(n - 1)
    seq = np.zeros(n)
    seq[0] = a[0]
    for k in range(1, n):
        seq[k] = a[k] - c[k - 1] ** 2 / seq[k - 1]
    got = mobius_recurrence(
        jnp.asarray(a[1:]),
        jnp.asarray(-(c**2)),
        jnp.ones(n - 1),
        jnp.zeros(n - 1),
        a[0],
        1.0,
    )
    np.testing.assert_allclose(np.asarray(got), seq[1:], rtol=1e-10)


# -------------------------------------------------------------- MetaGMRF ---
def test_metagmrf_forwards_and_jits(rng):
    model = tg.AR1Model(50)
    g = model(tau=1.2, rho=0.5)
    meta = tg.MetaGMRF(g, metadata="my-tag")
    assert len(meta) == 50
    np.testing.assert_allclose(np.asarray(meta.mean), np.asarray(g.mean))
    # pytree: jit through the wrapper, metadata static
    @jax.jit
    def f(m):
        return m.inner.logpdf(jnp.zeros(50))

    np.testing.assert_allclose(float(f(meta)), float(g.logpdf(jnp.zeros(50))), rtol=1e-6)
    assert meta.metadata == "my-tag"


# ----------------------------------------------------------- linear maps ---
def test_block_tridiag_map_matvec(rng):
    nt, ns = 5, 4
    diag = rng.normal(size=(nt, ns, ns))
    diag = diag + np.swapaxes(diag, -1, -2) + 6 * np.eye(ns)
    sub = rng.normal(size=(nt - 1, ns, ns))
    m = tg.SymmetricBlockTridiagonalMap(jnp.asarray(diag), jnp.asarray(sub))
    # dense oracle
    n = nt * ns
    D = np.zeros((n, n))
    for t in range(nt):
        D[t * ns : (t + 1) * ns, t * ns : (t + 1) * ns] = diag[t]
    for t in range(nt - 1):
        D[(t + 1) * ns : (t + 2) * ns, t * ns : (t + 1) * ns] = sub[t]
        D[t * ns : (t + 1) * ns, (t + 1) * ns : (t + 2) * ns] = sub[t].T
    x = rng.normal(size=n)
    np.testing.assert_allclose(np.asarray(m.matvec(jnp.asarray(x))), D @ x, atol=1e-10)

    # materialization agrees
    S = tg.block_tridiag_to_sparse(m)
    np.testing.assert_allclose(np.asarray(S.todense()), D, atol=1e-12)


def test_ssm_bidiagonal_sqrt(rng):
    nt, ns = 4, 3
    diag = rng.normal(size=(nt, ns, ns)) + 4 * np.eye(ns)
    sub = rng.normal(size=(nt - 1, ns, ns))
    L = np.zeros((nt * ns, nt * ns))
    for t in range(nt):
        L[t * ns : (t + 1) * ns, t * ns : (t + 1) * ns] = diag[t]
    for t in range(nt - 1):
        L[(t + 1) * ns : (t + 2) * ns, t * ns : (t + 1) * ns] = sub[t]
    m = tg.SSMBidiagonalMap(jnp.asarray(diag), jnp.asarray(sub))
    z = rng.normal(size=nt * ns)
    np.testing.assert_allclose(np.asarray(m.matvec(jnp.asarray(z))), L @ z, atol=1e-10)


def test_outer_product_and_zero_maps(rng):
    B = rng.normal(size=(10, 3))
    M = rng.normal(size=(3, 3))
    M = M @ M.T
    m = tg.OuterProductMap(jnp.asarray(B), jnp.asarray(M))
    x = rng.normal(size=10)
    np.testing.assert_allclose(np.asarray(m @ jnp.asarray(x)), B @ M @ B.T @ x, atol=1e-10)
    z = tg.ZeroMap(7)
    assert np.all(np.asarray(z @ jnp.ones(7)) == 0)


# -------------------------------------------------------------- workspace ---
def test_workspace_theta_loop_matches_direct(rng):
    model = tg.RW1Model(40)
    ws = tg.make_workspace(model, obs_hessian="diag")
    y = rng.poisson(2.0, 40).astype(np.float64)
    obs = tg.ExponentialFamily("poisson")
    lik = obs(jnp.asarray(y))
    for tau in (0.5, 2.0):
        prior_ws = ws.evaluate(tau=tau)
        prior_direct = model(tau=tau)
        post_ws = tg.gaussian_approximation(prior_ws, lik)
        post_direct = tg.gaussian_approximation(prior_direct, lik)
        np.testing.assert_allclose(
            np.asarray(post_ws.mean), np.asarray(post_direct.mean), atol=1e-6
        )


def test_workspace_pool_parity():
    model = tg.AR1Model(20)
    pool = tg.make_workspace_pool(model, size=4)
    ws = pool.checkout()
    g = ws.evaluate(tau=1.0, rho=0.4)
    assert len(g) == 20
    pool.checkin(ws)
    assert pool.with_workspace(lambda w: len(w.evaluate(tau=1.0, rho=0.4))) == 20


# --------------------------------------------------------------------- geo ---
def _write_square_shapefile(path, offsets):
    """Write a minimal .shp with one square polygon per offset."""
    records = []
    for i, (ox, oy) in enumerate(offsets):
        ring = [
            (ox, oy),
            (ox, oy + 1.0),
            (ox + 1.0, oy + 1.0),
            (ox + 1.0, oy),
            (ox, oy),
        ]
        content = struct.pack("<i", 5)  # polygon
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        content += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
        content += struct.pack("<ii", 1, len(ring))  # numparts, numpoints
        content += struct.pack("<i", 0)  # part offset
        for x, y in ring:
            content += struct.pack("<2d", x, y)
        records.append((i + 1, content))
    body = b""
    for rec_no, content in records:
        body += struct.pack(">ii", rec_no, len(content) // 2) + content
    total_words = (100 + len(body)) // 2
    header = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
    header += struct.pack("<ii", 1000, 5)
    header += struct.pack("<8d", 0, 0, 10, 10, 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(header + body)


def test_shapefile_contiguity(tmp_path):
    # three squares in a row: 0-1 share an edge, 1-2 share an edge,
    # 0-2 share nothing. A fourth square touches square 0 only at a corner.
    shp = tmp_path / "grid.shp"
    _write_square_shapefile(shp, [(0, 0), (1, 0), (2, 0), (1, 1)])
    polys = tg.read_shapefile_polygons(str(shp))
    assert len(polys) == 4

    Wq = tg.contiguity_adjacency(polys, "queen").toarray()
    Wr = tg.contiguity_adjacency(polys, "rook").toarray()
    assert Wq[0, 1] == 1 and Wq[1, 2] == 1 and Wq[0, 2] == 0
    assert Wq[0, 3] == 1  # corner touch counts for queen
    assert Wr[0, 3] == 0  # but not rook
    assert Wr[1, 3] == 1  # edge shared
    np.testing.assert_allclose(Wq, Wq.T)

    # feeds BesagModel directly
    model = tg.BesagModel(tg.adjacency_from_shapefile(str(shp)))
    g = model(tau=1.0)
    assert len(g) == 4


# ---------------------------------------------------------------- plotting ---
def test_plotting_recipes(rng, tmp_path):
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    from tpu_gmrf import plotting

    g = tg.AR1Model(30)(tau=1.0, rho=0.5)
    ax = plotting.plot_1d(g, key=jax.random.PRNGKey(0))
    assert ax is not None

    pts = rng.random((30, 2))
    mesh = tg.generate_mesh(pts)
    vals = rng.random(mesh.vertices.shape[0])
    ax = plotting.plot_field(vals, mesh=mesh)
    assert ax is not None


# --------------------------------------------------------- FEM obs models ---
def test_point_evaluation_obs_model(rng):
    from tpu_gmrf.fem import PointEvaluationObsModel

    pts = rng.random((40, 2)) * 2
    model = tg.MaternModel(pts, smoothness=1)
    obs_pts = rng.random((15, 2)) * 0.5 + 0.5
    obs_model = PointEvaluationObsModel(model.disc, obs_pts, tg.ExponentialFamily("normal"))
    prior = model(tau=1.0, range=0.8)
    x_true = prior.sample(jax.random.PRNGKey(1))
    A = model.disc.evaluation_matrix(obs_pts)
    y = np.asarray(A @ x_true) + 0.1 * rng.normal(size=15)
    lik = obs_model(jnp.asarray(y), sigma=0.1)
    post = tg.gaussian_approximation(prior, lik)
    # posterior predictions at observed points should be close to y
    pred = np.asarray(A @ post.mean)
    assert np.mean((pred - y) ** 2) < np.mean((np.asarray(A @ prior.mean) - y) ** 2)


# ------------------------------------------------------- AD Jacobian maps ---
def test_ad_jacobian_map_and_sparse_jacobian(rng):
    from tpu_gmrf.linear_maps import ADJacobianMap, sparse_jacobian_map
    from tpu_gmrf.sparse.pattern import SparsePattern

    def f(x):
        return jnp.stack([x[0] ** 2 + x[1], jnp.sin(x[2]), x[1] * x[3], x[3] - x[0]])

    x = jnp.asarray(rng.normal(size=4))
    J = np.asarray(jax.jacfwd(f)(x))
    m = ADJacobianMap(f, x)
    v = jnp.asarray(rng.normal(size=4))
    np.testing.assert_allclose(np.asarray(m @ v), J @ np.asarray(v), atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.rmatvec(v)), J.T @ np.asarray(v), atol=1e-12)
    rows, cols = np.nonzero(J != 0)
    pat = SparsePattern(rows, cols, (4, 4))
    S = sparse_jacobian_map(f, x, pat)
    np.testing.assert_allclose(np.asarray(S.data), J[pat.rows, pat.cols], atol=1e-12)


def test_gmrf_elementary_arithmetic(rng):
    import scipy.sparse as sp
    from tpu_gmrf.sparse import from_scipy

    Q = from_scipy(sp.eye(6).tocsr() * 3.0)
    g = tg.GMRF.from_precision(jnp.zeros(6), Q)
    v = jnp.asarray(rng.normal(size=6))
    g2 = g + v
    np.testing.assert_allclose(np.asarray(g2.mean), np.asarray(v))
    np.testing.assert_allclose(np.asarray((g2 - v).mean), 0.0, atol=1e-14)
    # precision untouched
    np.testing.assert_allclose(np.asarray(g2.Q.data), np.asarray(g.Q.data))
