"""Supernodal sparse Cholesky backend + native symbolic core.

Dense-baseline oracles, following the reference's test pattern
(reference test/test_gmrf.jl:64-76): build small random sparse SPD
matrices, compare every factorization product against numpy dense
linear algebra.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from tpu_gmrf.sparse import from_scipy
from tpu_gmrf.sparse.matrix import SparseMatrix
from tpu_gmrf.solvers.supernodal import supernodal_factorize, supernodal_plan
from tpu_gmrf import native


def _random_spd(n, density, seed):
    A = sp.random(n, n, density=density, random_state=np.random.RandomState(seed))
    A = A + A.T
    A = A + sp.eye(n) * (np.abs(A).sum(axis=1).max() + 1.0)
    return A.tocsr()


def _grid_adjacency(m):
    N = m * m
    idx = np.arange(N).reshape(m, m)
    rows, cols = [], []
    for di, dj in ((0, 1), (1, 0)):
        a = idx[: m - di if di else m, : m - dj if dj else m].ravel()
        b = idx[di:, dj:].ravel()
        rows += [a, b]
        cols += [b, a]
    rows = np.concatenate(rows + [np.arange(N)])
    cols = np.concatenate(cols + [np.arange(N)])
    return sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(N, N))


class TestNativeSymbolic:
    def test_etree_postorder_fill_against_dense_elimination(self):
        for seed, n in [(0, 15), (1, 40), (2, 80)]:
            A = (_random_spd(n, 0.15, seed) != 0).astype(np.int8)
            A = sp.csr_matrix(A)
            A.sort_indices()
            ap = A.indptr.astype(np.int32)
            ai = A.indices.astype(np.int32)
            parent = native.etree(n, ap, ai)
            post = native.postorder(parent)
            pos = np.empty(n, int)
            pos[post] = np.arange(n)
            for j in range(n):
                if parent[j] != -1:
                    assert pos[j] < pos[parent[j]]
            counts = native.col_counts(n, ap, ai, parent)
            lp, li = native.symbolic_fill(n, ap, ai, parent, counts)
            # dense symbolic elimination oracle
            F = A.toarray().astype(bool)
            for k in range(n):
                nz = np.nonzero(F[k + 1 :, k])[0] + k + 1
                F[np.ix_(nz, nz)] = True
            for j in range(n):
                oracle = np.nonzero(F[:, j])[0]
                oracle = oracle[oracle >= j]
                assert np.array_equal(np.sort(li[lp[j] : lp[j + 1]]), oracle)

    def test_amd_is_permutation_and_reduces_fill(self):
        G = _grid_adjacency(20)
        G.sort_indices()
        n = G.shape[0]
        ap = G.indptr.astype(np.int32)
        ai = G.indices.astype(np.int32)
        perm = native.amd_order(n, ap, ai)
        assert sorted(perm.tolist()) == list(range(n))
        P = sp.csr_matrix((np.ones(n), (np.arange(n), perm)), shape=(n, n))
        Gp = (P @ G @ P.T).tocsr()
        Gp.sort_indices()

        def fill_nnz(S):
            ap2, ai2 = S.indptr.astype(np.int32), S.indices.astype(np.int32)
            par = native.etree(n, ap2, ai2)
            return int(native.col_counts(n, ap2, ai2, par).sum())

        assert fill_nnz(Gp) < fill_nnz(G) * 0.75


class TestSupernodalFactor:
    @pytest.mark.parametrize(
        "n,density",
        [(25, 0.2), pytest.param(120, 0.05, marks=pytest.mark.slow)],
    )
    def test_against_dense_oracle(self, n, density):
        A = _random_spd(n, density, n)
        Q = from_scipy(A)
        F = supernodal_factorize(Q)
        Ad = A.toarray()
        _, ld = np.linalg.slogdet(Ad)
        assert abs(float(F.logdet()) - ld) < 1e-7 * max(1.0, abs(ld))
        rng = np.random.default_rng(n)
        b = rng.standard_normal(n)
        assert np.allclose(np.asarray(F.solve(jnp.asarray(b))), np.linalg.solve(Ad, b), atol=1e-7)
        Zd = np.linalg.inv(Ad)
        assert np.allclose(np.asarray(F.selinv_diag()), np.diag(Zd), atol=1e-7)
        Zs = F.selinv(Q.pattern)
        assert np.allclose(
            np.asarray(Zs.data), Zd[Q.pattern.rows, Q.pattern.cols], atol=1e-7
        )
        z = rng.standard_normal(n)
        xb = np.asarray(F.backward_solve(jnp.asarray(z)))
        assert np.allclose(xb @ Ad @ xb, z @ z, rtol=1e-7)
        w = np.asarray(F.sqrt_matvec(jnp.asarray(z)))
        assert np.allclose(w @ np.linalg.solve(Ad, w), z @ z, rtol=1e-7)

    def test_grid_laplacian(self):
        """Besag-style grid precision — the canonical unstructured workload."""
        m = 10
        W = _grid_adjacency(m)
        W.setdiag(0)
        W.eliminate_zeros()
        d = np.asarray(W.sum(axis=1)).ravel()
        Qs = (sp.diags(d + 0.1) - W).tocsr()
        Q = from_scipy(Qs)
        F = supernodal_factorize(Q)
        Ad = Qs.toarray()
        assert np.allclose(float(F.logdet()), np.linalg.slogdet(Ad)[1], atol=1e-6)
        assert np.allclose(
            np.asarray(F.selinv_diag()), np.diag(np.linalg.inv(Ad)), atol=1e-7
        )

    def test_logdet_gradient_is_selected_inverse(self):
        n = 30
        A = _random_spd(n, 0.2, 7)
        Q = from_scipy(A)

        def f(data):
            return supernodal_factorize(SparseMatrix(data, Q.pattern)).logdet()

        g = jax.grad(f)(Q.data)
        Zd = np.linalg.inv(A.toarray())
        assert np.allclose(
            np.asarray(g), Zd[Q.pattern.rows, Q.pattern.cols], atol=1e-7
        )

    def test_solver_dispatch(self):
        from tpu_gmrf.solvers import SolverSpec, factorize

        A = _random_spd(60, 0.1, 11)
        Q = from_scipy(A)
        F = factorize(Q, SolverSpec(kind="supernodal"))
        b = np.linspace(-1, 1, 60)
        assert np.allclose(
            np.asarray(F.solve(jnp.asarray(b))),
            np.linalg.solve(A.toarray(), b),
            atol=1e-7,
        )

    def test_gmrf_with_supernodal_solver(self):
        from tpu_gmrf import GMRF
        from tpu_gmrf.solvers import SolverSpec

        n = 64
        A = _random_spd(n, 0.08, 5)
        Q = from_scipy(A)
        g = GMRF.from_precision(jnp.zeros(n), Q, SolverSpec(kind="supernodal"))
        Ad = A.toarray()
        x = np.linspace(-0.5, 0.5, n)
        from scipy.stats import multivariate_normal

        expected = multivariate_normal(np.zeros(n), np.linalg.inv(Ad)).logpdf(x)
        assert np.allclose(float(g.logpdf(jnp.asarray(x))), expected, rtol=1e-8)
        assert np.allclose(np.asarray(g.var()), np.diag(np.linalg.inv(Ad)), atol=1e-7)


def test_plan_disk_cache_roundtrip(tmp_path, monkeypatch, rng):
    """A plan pickled to TPU_GMRF_PLAN_CACHE and reloaded in a fresh
    in-memory cache must drive a factorization identical to the freshly
    built plan (the n=1e6 bench path depends on this roundtrip)."""
    import tpu_gmrf.solvers.supernodal as sn
    from tests.conftest import random_sparse_spd
    from tpu_gmrf import from_scipy

    monkeypatch.setenv("TPU_GMRF_PLAN_CACHE", str(tmp_path))
    monkeypatch.setattr(sn, "_DISK_MIN_N", 1)

    S = random_sparse_spd(rng, 60)
    Q = from_scipy(S)
    f1 = sn.supernodal_factorize(Q)
    files = list(tmp_path.iterdir())
    assert len(files) == 1, files

    # evict the in-memory caches; the next plan call must load from disk
    key = (Q.pattern, 2048, "auto")
    saved = sn._PLAN_CACHE.pop(key)
    plan2 = sn.supernodal_plan(Q.pattern)
    assert plan2 is not saved  # came from disk, not memory
    f2 = sn.supernodal_factorize(Q)
    np.testing.assert_array_equal(np.asarray(f1.vals), np.asarray(f2.vals))
    np.testing.assert_allclose(float(f1.logdet()), float(f2.logdet()), rtol=0)
