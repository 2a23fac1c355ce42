"""Scale validation: the 1e6-node BASELINE config has a viable solver path
(VERDICT round-1 item 3). Nested-dissection ordering + relaxed supernode
amalgamation keep the level schedule bounded (~155 buckets / 21 levels at
n=1e6), so the traced program stays compilable and each refactorization is
one compiled call (measured: ~10.8 s / 9.4 GFLOP/s on CPU f32; plan 90 s
host, compile 100 s — both once per pattern)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_gmrf.sparse.matrix import SparseMatrix
from tpu_gmrf.sparse.pattern import SparsePattern
from tpu_gmrf.solvers.supernodal import (
    supernodal_factorize,
    supernodal_symbolic_summary,
)


def _grid_matern2_precision(m):
    import scipy.sparse as sp

    n = m * m
    idx = np.arange(n).reshape(m, m)
    pairs = np.concatenate(
        [
            np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], 1),
            np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], 1),
        ]
    )
    W = sp.csr_matrix((np.ones(len(pairs)), (pairs[:, 0], pairs[:, 1])), shape=(n, n))
    L = sp.diags(np.asarray(W.sum(axis=1)).ravel()) - W
    K = (2.0 * sp.eye(n) + L).tocsr()
    Q = (K.T @ K).tocoo()
    pat = SparsePattern(Q.row, Q.col, (n, n))
    return SparseMatrix(jnp.asarray(Q.data[pat.sort_order], jnp.float32), pat)


@pytest.mark.slow
def test_million_node_factorization():
    """The flagship-scale pattern: symbolic stays bounded and the
    factorization produces a finite logdet at n = 10^6."""
    Q = _grid_matern2_precision(1000)
    summ = supernodal_symbolic_summary(Q.pattern)
    # bounded schedule: this is what makes the trace compile at all
    assert summ["nbuckets"] < 400
    assert summ["nlevels"] < 40

    @jax.jit
    def work(data):
        return supernodal_factorize(dataclasses.replace(Q, data=data)).logdet()

    ld = float(work(Q.data))
    assert np.isfinite(ld) and ld > 0


def test_symbolic_scaling_bounded():
    """Smoke-tier proxy: the bucket/level counts grow sub-linearly from 10k
    to 90k nodes (nested dissection keeps the schedule shallow)."""
    s1 = supernodal_symbolic_summary(_grid_matern2_precision(100).pattern)
    s3 = supernodal_symbolic_summary(_grid_matern2_precision(300).pattern)
    assert s3["nlevels"] <= s1["nlevels"] + 8
    assert s3["nbuckets"] <= 3 * s1["nbuckets"]
