"""Spatial modelling with SPDEs: Matérn field regression with uncertainty.

Mirrors the reference's `spatial_modelling_spdes.jl` (Meuse-style workflow
on synthetic data): scattered observation sites, a Matérn SPDE latent
field, conjugate Gaussian conditioning, posterior std via selected
inversion, and out-of-sample prediction at new locations.
"""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from tpu_gmrf import MaternModel, linear_condition


def main():
    rng = np.random.default_rng(42)

    # synthetic "measurement sites" and a smooth ground truth
    sites = rng.uniform(0, 2, size=(120, 2))
    truth = lambda p: np.sin(2.5 * p[:, 0]) * np.cos(1.5 * p[:, 1])
    y = truth(sites) + 0.1 * rng.standard_normal(len(sites))

    model = MaternModel(sites, smoothness=1)
    prior = model(tau=1.0, range=0.5)
    A = model.evaluation_matrix()

    post = linear_condition(prior, jnp.asarray(y), Q_eps=1.0 / 0.1**2, A=A)

    # in-sample fit
    fit = np.asarray(A.matvec(post.mean))
    print(f"in-sample RMSE: {np.sqrt(np.mean((fit - y) ** 2)):.4f}")

    # posterior std at every mesh node via selected inversion (Takahashi)
    std = np.asarray(post.std())
    print(f"posterior std: min {std.min():.3f}, max {std.max():.3f}")

    # out-of-sample prediction at a regular grid
    gx, gy = np.meshgrid(np.linspace(0.2, 1.8, 8), np.linspace(0.2, 1.8, 8))
    newpts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    Anew = model.evaluation_matrix(newpts)
    pred = np.asarray(Anew.matvec(post.mean))
    err = pred - truth(newpts)
    oos = float(np.sqrt(np.mean(err**2)))
    print(f"out-of-sample RMSE on 8x8 grid: {oos:.4f}")
    # correctness anchors
    assert float(np.sqrt(np.mean((fit - y) ** 2))) < 0.12
    assert oos < 0.35, oos
    assert std.min() > 0
    # golden values: f64 scipy oracle on this exact seeded config
    # (tools/golden_values.py --only spdes)
    fit_rmse = float(np.sqrt(np.mean((fit - y) ** 2)))
    assert abs(fit_rmse - 0.021820) < 2e-3, fit_rmse
    assert abs(oos - 0.102026) < 8e-3, oos
    assert abs(float(std.mean()) - 0.497823) < 5e-3, std.mean()


if __name__ == "__main__":
    main()
