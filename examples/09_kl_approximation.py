"""KL-minimizing sparse GMRF approximation of a Gaussian process.

Mirrors the reference's `kl_approximation.jl` (Schäfer et al. 2021): a GP
with a Matérn-3/2 kernel on a 30×30 grid is approximated by a sparse GMRF
via the KL-optimal sparse Cholesky factorization (reverse-maximin ordering +
length-scaled neighborhood sparsity + batched local solves), then
conditioned on a handful of observations.

Acceptance: the GMRF covariance matches the kernel to a few percent at
rho=3, and the conditional mean interpolates the observations.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_gmrf import approximate_gmrf_kl, linear_condition
from tpu_gmrf.kl_cholesky import gram
from tpu_gmrf.sparse.matrix import SparseMatrix
from tpu_gmrf.sparse.pattern import SparsePattern


def matern32(a, b, ell=0.3, sigma2=1.0):
    r = jnp.sqrt(jnp.sum((a - b) ** 2) + 1e-12)
    s = jnp.sqrt(3.0) * r / ell
    return sigma2 * (1.0 + s) * jnp.exp(-s)


def main():
    n_x = 30
    xs = np.linspace(0, 1, n_x)
    gx, gy = np.meshgrid(xs, xs)
    X = np.stack([gx.ravel(), gy.ravel()], axis=1)
    n = len(X)
    print(f"grid: {n} points")

    cov_fn = gram(matern32)
    gmrf = approximate_gmrf_kl(X, cov_fn, rho=3.0, jitter=1e-8)
    Q = gmrf.Q
    print(f"precision: {Q.nnz} nonzeros ({Q.nnz / n**2:.2%} dense)")

    # accuracy: compare Σ = Q⁻¹ against the kernel on a probe set
    rng = np.random.default_rng(123)
    probe = rng.integers(0, n, size=12)
    eye_cols = jnp.zeros((n, len(probe))).at[jnp.asarray(probe), jnp.arange(len(probe))].set(1.0)
    Sig_cols = np.asarray(gmrf.factor.solve(eye_cols.astype(gmrf.dtype)))
    Xj = jnp.asarray(X)
    K_cols = np.asarray(
        jax.vmap(lambda xp: jax.vmap(lambda x: matern32(x, xp))(Xj))(Xj[jnp.asarray(probe)])
    ).T
    err = np.abs(Sig_cols - K_cols).max()
    print(f"max |Sigma - K| on probe columns: {err:.4f}")
    assert err < 0.08, err

    # condition on 5 observations
    obs_idx = rng.integers(0, n, size=5)
    y = np.sin(4 * X[obs_idx, 0]) * np.cos(3 * X[obs_idx, 1])
    m = len(obs_idx)
    A = SparseMatrix(
        jnp.ones(m, gmrf.dtype),
        SparsePattern(np.arange(m), obs_idx, (m, n)),
    )
    post = linear_condition(gmrf, jnp.asarray(y, gmrf.dtype), Q_eps=1e4, A=A)
    fit = np.asarray(post.mean)[obs_idx]
    print("obs vs posterior mean:", np.round(y, 3), np.round(fit, 3))
    np.testing.assert_allclose(fit, y, atol=0.02)
    v = np.asarray(post.var())
    assert v[obs_idx].max() < np.median(v)
    print("OK")


if __name__ == "__main__":
    main()
