"""Boundary conditions for SPDE-based GMRFs.

Mirrors the reference's `boundary_conditions.jl`: a 1D Matérn SPDE under
(1) homogeneous Neumann (default), (2) soft Dirichlet boundary conditions
(boundary dofs pinned to 0 up to noise 1e-4 — reference `Dirichlet` +
constraint noise), and (3) periodic boundaries u(left) = u(right)
(reference `AffineConstraint`; here the hard-constrained GMRF), plus a
Dirichlet advection-diffusion spatiotemporal model.

Acceptance: Dirichlet boundary std ≈ 1e-4; periodic samples close the loop;
Neumann variance inflates at the boundary relative to the interior.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

# The constrained space-time joint in section 4 has condition ~noise⁻²·κ⁴;
# like the reference (which is f64-only) this example runs double precision.
# TPU backends silently execute x64 requests in f32 (≈2.5% error on the
# stiff section-4 marginals, outside the golden tolerances) — pin the CPU
# backend, where x64 is real.
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from tpu_gmrf import ConstrainedGMRF
from tpu_gmrf.fem import AdvectionDiffusionSPDE, FEMDiscretization, MaternSPDE, interval_mesh
from tpu_gmrf.solvers import SolverSpec


def main():
    n = 51
    disc = FEMDiscretization(interval_mesh(-1.0, 1.0, n))
    dense = SolverSpec(kind="dense")

    # 1) homogeneous Neumann (default): variance inflates at the boundary
    neumann = MaternSPDE(disc, smoothness=1, variance=0.3).discretize(
        kappa=np.sqrt(8 * 1.5) / 0.5, solver=dense
    )
    v = np.asarray(neumann.var())
    print(f"Neumann: boundary var {v[0]:.3f} vs interior {v[n // 2]:.3f}")
    assert v[0] > 1.5 * v[n // 2]
    # golden values: f64 dense-inverse oracle (tools/golden_values.py
    # --only boundary)
    assert abs(v[0] - 0.605518) < 2e-3, v[0]
    assert abs(v[n // 2] - 0.302768) < 2e-3, v[n // 2]

    # 2) soft Dirichlet: boundary dofs ~ N(0, 1e-8)
    dirichlet = MaternSPDE(
        disc, smoothness=1, variance=0.3, bc="dirichlet", boundary_noise=1e-4
    ).discretize(kappa=np.sqrt(8 * 1.5) / 0.5, solver=dense)
    s = np.asarray(dirichlet.std())
    print(f"Dirichlet: boundary std {s[0]:.2e}, interior std {s[n // 2]:.3f}")
    np.testing.assert_allclose(s[[0, -1]], 1e-4, rtol=1e-3)
    assert s[n // 2] > 0.1
    assert abs(s[n // 2] - 0.550227) < 2e-3, s[n // 2]  # golden (f64 oracle)

    # 3) periodic: hard constraint u_0 - u_{n-1} = 0
    A = jnp.zeros((1, n)).at[0, 0].set(1.0).at[0, n - 1].set(-1.0)
    periodic = ConstrainedGMRF.create(neumann, A, jnp.zeros(1))
    xs = np.asarray(periodic.sample(jax.random.PRNGKey(0), (32,)))
    gap = np.abs(xs[:, 0] - xs[:, -1]).max()
    print(f"periodic: max |u(-1) - u(1)| over 32 samples = {gap:.2e}")
    assert gap < 1e-5
    vp = np.asarray(periodic.var())
    np.testing.assert_allclose(vp[0], vp[-1], rtol=1e-6)

    # 4) advection-diffusion with Dirichlet boundaries (f64: see header)
    spde = AdvectionDiffusionSPDE(
        disc, gamma=[-0.6], H=np.array([[0.1]]), tau=0.1, alpha=1,
        kappa=1.0, c=1.0, bc="dirichlet", constraint_noise=1e-4,
    )
    X = spde.discretize(np.linspace(0, 1, 8), solver=dense)
    stds = np.asarray(X.time_stds())
    print(f"AD-SPDE Dirichlet: boundary std {stds[4, 0]:.2e}, interior {stds[4, n // 2]:.3f}")
    assert stds[4, 0] < 1e-3 and stds[4, n // 2] > 1e-3
    assert abs(stds[4, n // 2] - 0.072161) < 1e-3, stds[4, n // 2]  # golden
    print("OK")


if __name__ == "__main__":
    main()
