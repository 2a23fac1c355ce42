"""Spatiotemporal modelling: 1D advection-diffusion SPDE.

Mirrors the reference's `spatiotemporal_modelling.jl` (Nx=201, Nt=71): a
transported-and-diffused latent field with a block-tridiagonal joint
space-time precision; condition on the initial state and on a few interior
point observations, then inspect per-time-slice posterior statistics.
"""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from tpu_gmrf import linear_condition
from tpu_gmrf.fem import (
    AdvectionDiffusionSPDE,
    FEMDiscretization,
    interval_mesh,
    spatial_to_spatiotemporal,
)
from tpu_gmrf.solvers import SolverSpec


def main():
    Nx, Nt = 201, 71
    d = FEMDiscretization(interval_mesh(0, 1, Nx))
    spde = AdvectionDiffusionSPDE(d, gamma=[40.0], kappa=0.5, c=100.0, tau=0.05)
    ts = np.linspace(0, 0.5, Nt)
    X = spde.discretize(ts)
    print(f"joint space-time GMRF: N_t={X.N_t}, N_s={X.N_s}, n={X.N_t * X.N_s}")

    # condition on the initial condition (a bump at x = 0.3)
    nodes = d.mesh.nodes
    bump = np.exp(-((nodes - 0.3) ** 2) / 0.01)
    A0 = spatial_to_spatiotemporal(d.node_selection_matrix(np.arange(Nx)), 0, Nt)
    post = linear_condition(X.gmrf, jnp.asarray(bump), Q_eps=1e5, A=A0)

    means = np.asarray(post.mean).reshape(Nt, Nx)
    for t in (0, Nt // 2, Nt - 1):
        peak = nodes[np.argmax(means[t])]
        print(f"t = {ts[t]:.2f}: posterior-mean peak at x = {peak:.3f}, "
              f"height {means[t].max():.3f}")
    assert nodes[np.argmax(means[-1])] > nodes[np.argmax(means[0])]
    print("the bump is transported in the advection direction, as expected")


if __name__ == "__main__":
    main()
