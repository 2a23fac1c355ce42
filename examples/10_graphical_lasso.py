"""Learning GMRFs from data with the graphical lasso.

Mirrors the reference's `graphical_lasso.jl` (Zhang et al. 2018): estimate a
sparse precision from samples of a known diagonally-dominant sparse
Gaussian by soft-thresholding the sample covariance and completing it to a
maximum-determinant positive-definite precision via chordal cliques; then
the restricted variant with a per-entry penalty matrix Λ.

Acceptance: the recovered precision is PD, sparse, and close to the truth
in relative Frobenius norm; the restricted variant stays inside Λ's pattern.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.sparse as sp

from tpu_gmrf import graphical_lasso


def main():
    rng = np.random.default_rng(42)
    n, m = 200, 4000
    A = sp.random(n, n, density=0.02, random_state=np.random.RandomState(7))
    A = A + A.T
    A = A + sp.diags(np.abs(A).sum(axis=1).A1 + 1.0)
    Qt = A.toarray()

    L = np.linalg.cholesky(Qt)
    X = np.linalg.solve(L.T, rng.normal(size=(n, m))).T  # samples ~ N(0, Q⁻¹)

    gmrf = graphical_lasso(X, threshold=0.03)
    Qe = np.asarray(gmrf.Q.todense())
    eigs = np.linalg.eigvalsh(Qe)
    rel = np.linalg.norm(Qe - Qt) / np.linalg.norm(Qt)
    nnz_frac = (Qe != 0).mean()
    print(f"scalar λ: min eig {eigs.min():.3f}, rel Frobenius error {rel:.3f}, "
          f"density {nnz_frac:.2%} (truth {(Qt != 0).mean():.2%})")
    assert eigs.min() > 0
    assert rel < 0.35
    assert nnz_frac < 0.25

    # restricted variant: per-entry penalties on the true pattern
    Lam = sp.csr_matrix((np.full(A.nnz, 0.03), A.nonzero()), shape=(n, n))
    gmrf_r = graphical_lasso(X, threshold=Lam)
    Qr = np.asarray(gmrf_r.Q.todense())
    rel_r = np.linalg.norm(Qr - Qt) / np.linalg.norm(Qt)
    print(f"restricted Λ: rel Frobenius error {rel_r:.3f}")
    assert np.linalg.eigvalsh(Qr).min() > 0
    assert rel_r <= rel + 1e-9
    print("OK")


if __name__ == "__main__":
    main()
