"""Modelling on manifolds: a Matérn field on the unit sphere.

Mirrors the reference's `modelling_on_manifolds.jl`: the Matérn SPDE
definition carries over to manifolds by replacing the Laplacian with the
Laplace–Beltrami operator — discretizing on a *surface mesh of the sphere*
yields a GMRF with all the usual sparse linear algebra. The reference
meshes the sphere with Gmsh; here an icosahedral subdivision. Observations
at off-vertex points hit the mesh via closest-point projection.

Acceptance: correlations decay with geodesic (not chordal) distance;
conditioning on point observations interpolates them; antipodal points are
nearly uncorrelated at short range.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_gmrf import linear_condition
from tpu_gmrf.fem import FEMDiscretization, MaternSPDE, icosphere
from tpu_gmrf.solvers import SolverSpec


def main():
    mesh = icosphere(3)  # 642 vertices on S²
    disc = FEMDiscretization(mesh)
    print(f"sphere mesh: {mesh.n_vertices} vertices, {mesh.n_elements} triangles")
    assert disc.intrinsic_dim == 2 and mesh.embedding_dim == 3

    # Matérn field with range ~ 1 radian of arc
    nu = 1.0  # smoothness 0 in 2D -> nu = 1
    range_ = 1.0
    kappa = np.sqrt(8 * nu) / range_
    spde = MaternSPDE(disc, smoothness=0, variance=1.0)
    prior = spde.discretize(kappa=kappa, solver=SolverSpec(kind="supernodal"))
    v = np.asarray(prior.var())
    print(f"prior variance: median {np.median(v):.3f} (normalized to 1)")
    assert 0.5 < np.median(v) < 2.0
    # golden value: f64 dense-inverse oracle (tools/golden_values.py
    # --only manifold)
    assert abs(float(np.median(v)) - 1.124293) < 1e-2, np.median(v)

    # correlation from the north pole decays with geodesic distance
    north = int(np.argmax(mesh.vertices[:, 2]))
    e = jnp.zeros(len(v)).at[north].set(1.0)
    col = np.asarray(prior.factor.solve(e.astype(prior.dtype)))  # Σ[:, north]
    corr = col / np.sqrt(v * v[north])
    geo = np.arccos(np.clip(mesh.vertices @ mesh.vertices[north], -1, 1))
    near = geo < 0.3
    far = geo > np.pi - 0.5
    print(f"mean corr near pole {corr[near].mean():.3f}, antipodal {corr[far].mean():.3f}")
    assert corr[near].mean() > 0.5
    assert abs(corr[far].mean()) < 0.1
    # golden values (f64 oracle): near-pole 0.756208, |antipodal| 0.004910
    assert abs(float(corr[near].mean()) - 0.756208) < 1e-2
    assert abs(float(corr[far].mean())) < 0.02
    # monotone-ish decay: binned correlation decreases with geodesic distance
    bins = np.digitize(geo, np.linspace(0, np.pi, 8))
    means = [corr[bins == b].mean() for b in range(1, 5)]
    assert all(means[i] > means[i + 1] for i in range(len(means) - 1)), means

    # condition on observations at arbitrary (off-vertex) sphere points
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(40, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    A = disc.evaluation_matrix(pts)
    y = np.sin(2 * pts[:, 2]) + 0.5 * pts[:, 0]
    post = linear_condition(prior, jnp.asarray(y, prior.dtype), Q_eps=400.0, A=A)
    fit = np.asarray(A.matvec(post.mean))
    err = np.abs(fit - y).max()
    print(f"posterior interpolation error at observations: {err:.3f}")
    assert err < 0.25
    vpost = np.asarray(post.var())
    assert np.median(vpost) < np.median(v)
    print("OK")


if __name__ == "__main__":
    main()
