import numpy as np
import jax.numpy as jnp
import pytest

from tpu_gmrf.sparse import (
    SparseMatrix,
    SparsePattern,
    from_dense,
    from_scipy,
    sp_block_diag,
    sp_kron,
    spdiag,
    speye,
    union_patterns,
)
from tests.conftest import random_sparse_spd


def test_pattern_canonical_and_hash():
    p1 = SparsePattern([1, 0, 1], [0, 0, 1], (2, 2))
    p2 = SparsePattern([0, 1, 1], [0, 1, 0], (2, 2))
    assert p1 == p2
    assert hash(p1) == hash(p2)
    assert p1.nnz == 3
    with pytest.raises(ValueError):
        SparsePattern([0, 0], [1, 1], (2, 2))  # duplicates


def test_dense_roundtrip(rng):
    A = rng.normal(size=(5, 7))
    A[np.abs(A) < 0.8] = 0.0
    M = from_dense(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(M.todense()), A)


def test_matvec_matmul_quad(rng):
    S = random_sparse_spd(rng, 30)
    M = from_scipy(S)
    x = rng.normal(size=30)
    np.testing.assert_allclose(np.asarray(M.matvec(jnp.asarray(x))), S @ x, rtol=1e-10)
    X = rng.normal(size=(30, 4))
    np.testing.assert_allclose(np.asarray(M.matvec(jnp.asarray(X))), S @ X, rtol=1e-10)
    np.testing.assert_allclose(float(M.quad(jnp.asarray(x))), x @ (S @ x), rtol=1e-10)
    # transpose
    np.testing.assert_allclose(np.asarray(M.T.todense()), S.T.toarray(), rtol=1e-12)


def test_spgemm(rng):
    A = random_sparse_spd(rng, 20)
    B = random_sparse_spd(rng, 20)
    MA, MB = from_scipy(A), from_scipy(B)
    C = MA @ MB
    np.testing.assert_allclose(np.asarray(C.todense()), (A @ B).toarray(), rtol=1e-10)


def test_add_union_pad(rng):
    A = random_sparse_spd(rng, 15)
    B = random_sparse_spd(rng, 15)
    MA, MB = from_scipy(A), from_scipy(B)
    C = MA + MB
    np.testing.assert_allclose(np.asarray(C.todense()), (A + B).toarray(), rtol=1e-12)
    u = union_patterns(MA.pattern, MB.pattern)
    padded = MA.pad_to(u)
    np.testing.assert_allclose(np.asarray(padded.todense()), A.toarray(), rtol=1e-12)


def test_block_diag_and_kron(rng):
    A = random_sparse_spd(rng, 6)
    B = random_sparse_spd(rng, 4)
    MA, MB = from_scipy(A), from_scipy(B)
    import scipy.sparse as sp

    BD = sp_block_diag([MA, MB])
    np.testing.assert_allclose(
        np.asarray(BD.todense()), sp.block_diag([A, B]).toarray(), rtol=1e-12
    )
    K = sp_kron(MA, MB)
    np.testing.assert_allclose(
        np.asarray(K.todense()), sp.kron(A, B).toarray(), rtol=1e-12
    )


def test_eye_diag_symmetrize(rng):
    I = speye(4)
    np.testing.assert_allclose(np.asarray(I.todense()), np.eye(4))
    d = jnp.asarray(rng.normal(size=5))
    D = spdiag(d)
    np.testing.assert_allclose(np.asarray(D.todense()), np.diag(np.asarray(d)))
    A = from_scipy(random_sparse_spd(rng, 10))
    Adata = A.data.at[0].add(0.5)  # break symmetry numerically
    As = SparseMatrix(Adata, A.pattern).symmetrize()
    M = np.asarray(As.todense())
    np.testing.assert_allclose(M, M.T, rtol=1e-12)
