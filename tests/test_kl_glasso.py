import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_gmrf.kl_cholesky import (
    approximate_gmrf_kl,
    gram,
    reverse_maximin_ordering,
    sparsity_pattern_from_ordering,
)
from tpu_gmrf.graphical_lasso import chordal_cover, graphical_lasso, soft_threshold_cov
from tpu_gmrf.sparse import SparsePattern


def _matern32(a, b, ell=0.4, s2=1.0):
    d = jnp.sqrt(jnp.sum((a - b) ** 2) + 1e-12)
    z = jnp.sqrt(3.0) * d / ell
    return s2 * (1 + z) * jnp.exp(-z)


def test_maximin_ordering_properties(rng):
    X = rng.uniform(0, 1, size=(60, 2))
    order, ell = reverse_maximin_ordering(X)
    assert sorted(order) == list(range(60))
    assert np.isinf(ell[-1])
    # lengthscales increase (fine-to-coarse), up to ties
    assert np.all(np.diff(ell[:-1]) >= -1e-12)


@pytest.mark.slow
def test_kl_cholesky_exact_with_full_pattern(rng):
    """With rho large enough the pattern is dense → exact inverse."""
    X = rng.uniform(0, 1, size=(25, 2))
    cov_fn = gram(_matern32)
    g = approximate_gmrf_kl(X, cov_fn, rho=100.0, jitter=1e-10)
    # exact: Q ≈ Theta^{-1}
    P1 = jnp.asarray(X)[None]
    Theta = np.asarray(cov_fn(P1, P1))[0]
    np.testing.assert_allclose(
        np.asarray(g.Q.todense()), np.linalg.inv(Theta), rtol=2e-4, atol=1e-4
    )


@pytest.mark.slow
def test_kl_cholesky_sparse_approximation_quality(rng):
    """Moderate rho: KL divergence to the true GP is small and decreases
    with rho (reference kl_approximation tutorial behavior)."""
    X = rng.uniform(0, 1, size=(80, 2))
    cov_fn = gram(_matern32)
    P1 = jnp.asarray(X)[None]
    Theta = np.asarray(cov_fn(P1, P1))[0] + 1e-10 * np.eye(80)

    def kl_to_truth(g):
        Q = np.asarray(g.Q.todense())
        # KL(N(0,Theta) || N(0,Q^{-1})) = 0.5(tr(Q Theta) - n + logdet(Q^{-1}) - logdet(Theta))
        n = Theta.shape[0]
        sign, ld_Q = np.linalg.slogdet(Q)
        _, ld_T = np.linalg.slogdet(Theta)
        return 0.5 * (np.sum(Q * Theta) - n - ld_Q - ld_T)

    kls = []
    for rho in [1.5, 3.0, 6.0]:
        g = approximate_gmrf_kl(X, cov_fn, rho=rho, jitter=1e-8)
        kls.append(kl_to_truth(g))
    assert kls[0] > kls[1] > kls[2] >= -1e-6
    # verified against a dense f64 per-column oracle: 28.8 / 7.6 / 1.7 nats
    # (this config has correlation length 0.4 on a unit square — strongly
    # coupled, so absolute KL is large; the exponential decay in rho is the
    # correctness signal)
    assert kls[2] < 2.5
    # sparsity actually sparse at rho=1.5
    g = approximate_gmrf_kl(X, cov_fn, rho=1.5)
    assert g.Q.nnz < 80 * 80 * 0.6


def test_chordal_cover_properties(rng):
    """Cover is chordal (simulate elimination w/o new fill) and ⊇ pattern."""
    import scipy.sparse as sp

    A = sp.random(30, 30, density=0.08, random_state=np.random.RandomState(0))
    A = ((A + A.T) != 0).astype(bool)
    A.setdiag(True)
    pat = SparsePattern.from_scipy(sp.csr_matrix(A))
    cover, cliques, seps = chordal_cover(pat)
    # cover contains original
    orig = set(zip(pat.rows.tolist(), pat.cols.tolist()))
    cov_set = set(zip(cover.rows.tolist(), cover.cols.tolist()))
    assert orig <= cov_set
    # every clique is complete in the cover
    for c in cliques:
        for a in c:
            for b in c:
                assert (int(a), int(b)) in cov_set
    # junction tree sanity: #separators ≤ #cliques − (#components)
    assert len(seps) <= max(len(cliques) - 1, 0)


def test_graphical_lasso_decomposable_mle_identity(rng):
    """Max-det completion identity: (Q⁻¹)_ij = C_ij on the thresholded
    pattern (the defining property of the completion)."""
    # chain-structured truth
    n = 12
    import scipy.sparse as sp

    Qtrue = sp.diags([-0.45 * np.ones(n - 1), np.ones(n), -0.45 * np.ones(n - 1)], [-1, 0, 1]).toarray()
    Sig = np.linalg.inv(Qtrue)
    L = np.linalg.cholesky(Sig)
    X = (L @ rng.normal(size=(n, 4000))).T
    thresh = 0.12
    C, pattern, mu = soft_threshold_cov(X, thresh)
    g = graphical_lasso(X, thresh)
    Sig_hat = np.linalg.inv(np.asarray(g.Q.todense()))
    for i, j in zip(pattern.rows, pattern.cols):
        np.testing.assert_allclose(
            Sig_hat[i, j], C[i, j], rtol=2e-2, atol=5e-3
        )
    # SPD + roughly recovers the chain structure
    assert np.linalg.eigvalsh(np.asarray(g.Q.todense())).min() > 0


def test_graphical_lasso_recovers_structure(rng):
    n = 15
    import scipy.sparse as sp

    Qtrue = sp.diags([-0.4 * np.ones(n - 1), np.ones(n), -0.4 * np.ones(n - 1)], [-1, 0, 1]).toarray()
    Sig = np.linalg.inv(Qtrue)
    L = np.linalg.cholesky(Sig)
    X = (L @ rng.normal(size=(n, 8000))).T
    g = graphical_lasso(X, 0.2)
    Qd = np.asarray(g.Q.todense())
    # dominant structure: first off-diagonal negative, distant entries ~0
    assert Qd[0, 1] < -0.05
    assert abs(Qd[0, n - 1]) < 0.05
