"""Bernoulli spatial classification with a Laplace approximation.

Mirrors the reference's `bernoulli_spatial_classification.jl` (Lansing
Woods): binary marks observed at scattered locations, a Matérn latent
field, and `gaussian_approximation` (Fisher scoring) for the non-Gaussian
posterior.
"""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from tpu_gmrf import (
    ExponentialFamily,
    LinearlyTransformedObservationModel,
    MaternModel,
    gaussian_approximation,
)


def main():
    rng = np.random.default_rng(7)

    pts = rng.uniform(0, 1, size=(150, 2))
    # ground truth: class probability varies smoothly across the domain
    logit = 3.0 * np.sin(3 * pts[:, 0]) - 1.0 * pts[:, 1]
    y = (rng.uniform(size=len(pts)) < 1 / (1 + np.exp(-logit))).astype(np.float32)

    model = MaternModel(pts, smoothness=1)
    prior = model(tau=0.5, range=0.4)

    # observations live at the scattered sites; the latent field lives on
    # the FEM mesh — map with the evaluation matrix (η = A·x)
    A = model.evaluation_matrix()
    obs_model = LinearlyTransformedObservationModel(
        ExponentialFamily("bernoulli"), A
    )
    lik = obs_model(jnp.asarray(y))

    post = gaussian_approximation(prior, lik)
    eta = np.asarray(A.matvec(post.mean))
    p_hat = 1 / (1 + np.exp(-eta))
    acc = np.mean((p_hat > 0.5) == (y > 0.5))
    mean_std = float(jnp.mean(post.std()))
    mode_norm = float(jnp.linalg.norm(post.mean))
    print(f"training accuracy of the Laplace mode: {acc:.2%}")
    print(f"posterior mean std over the field: {mean_std:.3f}")
    # correctness anchor: the latent field must separate the classes well
    assert acc > 0.7, acc
    # golden values: f64 dense-Newton oracle on this exact seeded config
    # (tools/golden_values.py) — mode, marginal std, and accuracy
    assert abs(mode_norm - 31.958964) < 0.3, mode_norm
    assert abs(mean_std - 1.026679) < 0.02, mean_std
    # count-tolerant: accuracy is discrete (multiples of 1/150); allow a
    # couple of boundary points to flip under cross-platform f32 kernels
    assert abs(acc - 0.80) <= 2.0 / 150 + 1e-9, acc


if __name__ == "__main__":
    main()
