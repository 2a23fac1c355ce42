"""Autoregressive latent models: AR(p) via the PACF parameterization.

Mirrors the reference's `autoregressive_models.jl`: stationary AR(p)
priors with partial-autocorrelation hyperparameters (Durbin-Levinson),
conditioning on noisy observations and forecasting.
"""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from tpu_gmrf import ARModel, AR1Model, linear_condition
from tpu_gmrf.sparse import from_scipy


def main():
    rng = np.random.default_rng(3)
    n = 200

    # AR(2) with PACF hyperparameters — oscillatory dynamics
    model = ARModel(n, order=2)
    prior = model(tau=1.0, pacf1=0.9, pacf2=-0.5)
    x = prior.sample(jax.random.PRNGKey(0))
    print(f"AR(2) sample: mean {float(x.mean()):+.3f}, std {float(x.std()):.3f}")

    # observe the first 150 values, forecast the rest
    obs = np.arange(150)
    y = np.asarray(x)[obs] + 0.05 * rng.standard_normal(len(obs))
    A = from_scipy(sp.eye(n).tocsr()[obs])
    post = linear_condition(prior, jnp.asarray(y), Q_eps=1.0 / 0.05**2, A=A)
    err = np.asarray(post.mean)[150:160] - np.asarray(x)[150:160]
    print(f"10-step-ahead forecast RMSE: {np.sqrt(np.mean(err**2)):.3f}")
    band = np.asarray(post.std())
    print(f"forecast std grows from {band[150]:.3f} (t=150) to {band[-1]:.3f} (t={n-1})")

    # AR1 marginal variance sanity check: 1/(τ(1-ρ²)) in the interior
    ar1 = AR1Model(400)
    g = ar1(tau=2.0, rho=0.7)
    v = float(g.var()[200])
    closed = 1 / (2 * (1 - 0.49))
    print(f"AR1 interior marginal var: {v:.4f} (closed form {closed:.4f})")
    # correctness anchors
    assert abs(v - closed) < 1e-2 * closed
    assert float(np.sqrt(np.mean(err**2))) < 1.5  # forecast reverts to prior scale
    assert band[-1] > band[150]  # forecast uncertainty grows
    # golden values: f64 splu oracle at this exact seeded config
    # (tools/golden_values.py --only ar_forecast)
    rmse = float(np.sqrt(np.mean(err**2)))
    assert abs(rmse - 1.085257) < 2e-2, rmse
    assert abs(float(band[150]) - 1.002574) < 1e-2, band[150]
    assert abs(float(band[-1]) - 2.649064) < 3e-2, band[-1]


if __name__ == "__main__":
    main()
