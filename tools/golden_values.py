"""Compute reference-anchored golden values with independent f64 oracles.

BASELINE.md consequence #1 requires posterior moments to match the
reference within error on the BASELINE configs. The reference publishes no
numeric tables, so the anchor is an INDEPENDENT float64 sparse/dense
linear-algebra oracle (scipy) evaluated at the exact seeded configs of the
tutorial examples. Run this script to (re)produce the literals asserted in
examples 01/03/04; any library regression that changes posterior moments
breaks those asserts.

Usage: python tools/golden_values.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spl
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def _to_csr64(Q):
    return sp.coo_matrix(
        (np.asarray(Q.data, np.float64), (Q.pattern.rows, Q.pattern.cols)),
        shape=Q.shape,
    ).tocsr()


def golden_ar1():
    """Example 01 temporal config: AR1(365), tau=2, rho=0.95, weekly obs."""
    from tpu_gmrf import AR1Model

    rng = np.random.default_rng(0)
    n = 365
    model = AR1Model(n)
    Q = _to_csr64(model.precision(tau=2.0, rho=0.95))
    obs_idx = np.arange(0, n, 7)
    truth = np.sin(np.linspace(0, 6 * np.pi, n))
    y = truth[obs_idx] + 0.1 * rng.standard_normal(len(obs_idx))
    A = sp.eye(n, format="csr")[obs_idx]
    Qp = (Q + A.T @ A * (1.0 / 0.1**2)).tocsc()
    lu = spl.splu(Qp)
    mean = lu.solve(A.T @ y * (1.0 / 0.1**2))
    Sig = spl.inv(Qp).toarray()
    std = np.sqrt(np.diag(Sig))
    rmse = float(np.sqrt(np.mean((mean - truth) ** 2)))
    print(f"ar1_mean_of_mean = {float(mean.mean()):.6f}")
    print(f"ar1_rmse_vs_truth = {rmse:.6f}")
    print(f"ar1_mean_marginal_std = {float(std.mean()):.6f}")


def golden_spatial():
    """Example 01 spatial config: Matérn(80 uniform pts), tau=1, range=0.3."""
    from tpu_gmrf import MaternModel

    rng = np.random.default_rng(0)
    _ = rng.standard_normal(53)  # advance the stream exactly as example 01
    # (the example draws AR1 noise first: 53 obs points)
    pts = rng.uniform(0, 1, size=(80, 2))
    model = MaternModel(pts, smoothness=1)
    Q = _to_csr64(model.precision(tau=1.0, range=0.3))
    Aev = model.evaluation_matrix()
    A64 = sp.coo_matrix(
        (np.asarray(Aev.data, np.float64), (Aev.pattern.rows, Aev.pattern.cols)),
        shape=Aev.shape,
    ).tocsr()
    ys = np.cos(4 * pts[:, 0]) + 0.05 * rng.standard_normal(80)
    Qp = (Q + A64.T @ A64 * (1.0 / 0.05**2)).tocsc()
    lu = spl.splu(Qp)
    mean = lu.solve(A64.T @ ys * (1.0 / 0.05**2))
    Sig = spl.inv(Qp).toarray()
    std = np.sqrt(np.diag(Sig))
    pred = A64 @ mean
    print(f"matern_fit_rmse = {float(np.sqrt(np.mean((pred - ys) ** 2))):.6f}")
    print(f"matern_mean_marginal_std = {float(std.mean()):.6f}")


def golden_bernoulli():
    """Example 03 config: Bernoulli Laplace mode via f64 dense Newton."""
    from tpu_gmrf import MaternModel

    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 1, size=(150, 2))
    logit = 3.0 * np.sin(3 * pts[:, 0]) - 1.0 * pts[:, 1]
    y = (rng.uniform(size=len(pts)) < 1 / (1 + np.exp(-logit))).astype(np.float64)
    model = MaternModel(pts, smoothness=1)
    Q = _to_csr64(model.precision(tau=0.5, range=0.4)).toarray()
    Aev = model.evaluation_matrix()
    A = sp.coo_matrix(
        (np.asarray(Aev.data, np.float64), (Aev.pattern.rows, Aev.pattern.cols)),
        shape=Aev.shape,
    ).toarray()
    n = Q.shape[0]
    x = np.zeros(n)
    for _ in range(100):
        eta = A @ x
        p = 1 / (1 + np.exp(-eta))
        g = A.T @ (y - p)
        W = p * (1 - p)
        H = Q + A.T @ (W[:, None] * A)
        step = np.linalg.solve(H, g - Q @ x)
        if np.linalg.norm(step) < 1e-12:
            break
        x = x + step
    Sig = np.linalg.inv(H)
    std = np.sqrt(np.diag(Sig))
    eta = A @ x
    acc = float(np.mean(((1 / (1 + np.exp(-eta))) > 0.5) == (y > 0.5)))
    print(f"bern_mode_norm = {float(np.linalg.norm(x)):.6f}")
    print(f"bern_mean_marginal_std = {float(std.mean()):.6f}")
    print(f"bern_accuracy = {acc:.6f}")


def golden_advdiff():
    """Example 04 config: advection-diffusion joint, f64 splu oracle.

    Requires x64 (run separately: the joint's equilibrated condition is
    ~1e10 — see the example's numerics note)."""
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)
    from tpu_gmrf.fem import (
        AdvectionDiffusionSPDE,
        FEMDiscretization,
        interval_mesh,
        spatial_to_spatiotemporal,
    )

    Nx, Nt = 201, 71
    d = FEMDiscretization(interval_mesh(-1, 1, Nx))
    spde = AdvectionDiffusionSPDE(
        d, gamma=[0.6], H=0.1, kappa=1.0, alpha=1, c=1.0, tau=3.0,
        spatial_kappa=float(np.sqrt(8.0) / 0.4),
    )
    ts = np.linspace(0.0, 1.0, Nt)
    X = spde.discretize(ts)
    Q = _to_csr64(X.gmrf.Q)
    nodes = d.mesh.nodes
    xs_i = np.linspace(-1, 1, 100)
    fi = np.exp(-((xs_i + 0.6) ** 2) / 0.2**2)
    A0 = spatial_to_spatiotemporal(d.evaluation_matrix(xs_i[:, None]), 0, Nt)
    tl = 2 * Nt // 3
    Al = spatial_to_spatiotemporal(d.evaluation_matrix(np.array([[-0.25]])), tl, Nt)

    def toc(A):
        return sp.coo_matrix(
            (np.asarray(A.data, np.float64), (A.pattern.rows, A.pattern.cols)),
            shape=A.shape,
        ).tocsr()

    A64 = sp.vstack([toc(A0), toc(Al)]).tocsr()
    y = np.concatenate([fi, [0.55]])
    W = sp.diags(np.concatenate([np.full(100, 100.0), [1e4]]))
    Qp = (Q + A64.T @ W @ A64).tocsc()
    mean = spl.splu(Qp).solve(A64.T @ (W @ y))
    mm = mean.reshape(Nt, Nx)
    rmse0 = float(np.sqrt(np.mean((toc(A0) @ mean - fi) ** 2)))
    print(f"advdiff_rmse0 = {rmse0:.6f}")
    print(f"advdiff_fit_later = {float((toc(Al) @ mean)[0]):.6f}")
    print(f"advdiff_peak_later = {float(nodes[np.argmax(mm[tl])]):.6f}")


if __name__ == "__main__":
    golden_ar1()
    golden_spatial()
    golden_bernoulli()
    golden_advdiff()
