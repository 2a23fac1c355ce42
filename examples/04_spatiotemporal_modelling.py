"""Spatiotemporal modelling: advection-diffusion of a pollutant in a river.

Mirrors the reference's `spatiotemporal_modelling.jl` tutorial
(docs/src/literate-tutorials/spatiotemporal_modelling.jl:13-27,124-139):
1D domain [-1, 1] with Nx=201, times [0, 1] with Nt=71, a Clarotto-2024
advection-diffusion prior (γ=0.6, H=0.1, propagation κ=1 — the struct
default the tutorial keeps — with range-0.4 Matérn spatial noise), noisy
observations of the initial concentration profile f(x)=exp(-((x+0.6)/0.2)²)
plus one later measurement at x=-0.25, t=2T/3. The non-separable prior
carries information along the flow: the later observation's influence
extends upstream, and the initial profile is recovered exactly.

Numerics note: joint implicit-Euler space-time precisions are numerically
stiff (equilibrated condition ~1e10 here; ~1e17 at the tutorial's exact
τ=0.1, α=2 — beyond even f64 Cholesky). The reference leans on f64 CHOLMOD;
our backends follow the input dtype, so this example enables jax x64 and
runs the f64 path on CPU. τ=3, α=1 keeps the same physics at f64-safe
conditioning.
"""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from tpu_gmrf import linear_condition
from tpu_gmrf.fem import (
    AdvectionDiffusionSPDE,
    FEMDiscretization,
    interval_mesh,
    spatial_to_spatiotemporal,
)
from tpu_gmrf.sparse.matrix import SparseMatrix
from tpu_gmrf.sparse.pattern import SparsePattern


def sp_vstack(blocks):
    n = blocks[0].shape[1]
    rows, cols, datas, off = [], [], [], 0
    for B in blocks:
        rows.append(B.pattern.rows.astype(np.int64) + off)
        cols.append(B.pattern.cols.astype(np.int64))
        datas.append(np.asarray(B.data))
        off += B.shape[0]
    pat = SparsePattern(np.concatenate(rows), np.concatenate(cols), (off, n))
    data = jnp.asarray(np.concatenate(datas))[pat.sort_order]
    return SparseMatrix(data, pat)


def main():
    Nx, Nt = 201, 71
    d = FEMDiscretization(interval_mesh(-1, 1, Nx))
    spde = AdvectionDiffusionSPDE(
        d, gamma=[0.6], H=0.1, kappa=1.0, alpha=1, c=1.0, tau=3.0,
        spatial_kappa=float(np.sqrt(8.0) / 0.4),
    )
    ts = np.linspace(0.0, 1.0, Nt)
    X = spde.discretize(ts)
    print(f"joint space-time GMRF: N_t={X.N_t}, N_s={X.N_s}, n={X.N_t * X.N_s}")

    # observations: the initial profile at 100 points (σ = 0.1) and one
    # later measurement at x=-0.25, t=2T/3 (σ = 0.01)
    xs_initial = np.linspace(-1, 1, 100)
    f_initial = np.exp(-((xs_initial + 0.6) ** 2) / 0.2**2)
    A_init = spatial_to_spatiotemporal(
        d.evaluation_matrix(xs_initial[:, None]), 0, Nt
    )
    t_later = 2 * Nt // 3
    A_later = spatial_to_spatiotemporal(
        d.evaluation_matrix(np.array([[-0.25]])), t_later, Nt
    )
    A_all = sp_vstack([A_init, A_later])
    y_all = np.concatenate([f_initial, [0.55]])
    prec = np.concatenate([np.full(len(f_initial), 0.1 ** -2), [0.01 ** -2]])
    m = len(y_all)
    Q_eps = SparseMatrix(
        jnp.asarray(prec),
        SparsePattern(np.arange(m), np.arange(m), (m, m)),
    )

    post = linear_condition(X.gmrf, jnp.asarray(y_all), Q_eps=Q_eps, A=A_all)
    means = np.asarray(post.mean).reshape(Nt, Nx)
    nodes = d.mesh.nodes

    for t in (0, Nt // 3, t_later, Nt - 1):
        peak = nodes[np.argmax(means[t])]
        print(
            f"t = {ts[t]:.2f}: posterior-mean peak at x = {peak:.3f}, "
            f"height {means[t].max():.3f}"
        )

    # the initial profile is recovered at t=0 ...
    fit0 = np.asarray(A_init.matvec(post.mean))
    rmse0 = float(np.sqrt(np.mean((fit0 - f_initial) ** 2)))
    print(f"t=0 fit RMSE: {rmse0:.4f}")
    assert rmse0 < 0.05, rmse0
    peak_start = nodes[np.argmax(means[0])]
    assert abs(peak_start - (-0.6)) < 0.05, peak_start
    # ... the later measurement is honored ...
    fit_later = float(np.asarray(A_later.matvec(post.mean))[0])
    print(f"t=2T/3 fit at x=-0.25: {fit_later:.4f}")
    assert abs(fit_later - 0.55) < 0.01, fit_later
    # ... and the advection carries its influence along the flow: the field
    # at t_later peaks upstream of the measurement site
    peak_later = nodes[np.argmax(means[t_later])]
    assert -0.6 < peak_later < -0.1, peak_later

    # golden values (independent f64 scipy-splu oracle on this exact
    # config, tools/golden_values.py)
    assert abs(rmse0 - 0.00209) < 0.005, rmse0
    assert abs(fit_later - 0.54997) < 0.005, fit_later
    assert abs(peak_later - (-0.44)) < 0.05, peak_later
    print("matches f64 oracle golden values")


if __name__ == "__main__":
    main()
