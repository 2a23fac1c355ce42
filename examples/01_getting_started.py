"""Getting started: AR1 temporal smoothing and a spatial Matérn field.

Mirrors the reference's `getting_started.jl` tutorial: build a latent AR1
GMRF, condition on noisy observations of a subset of time points
(conjugate update), then do the same spatially with a Matérn SPDE model
built from scattered points (README quickstart).
"""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_gmrf import AR1Model, MaternModel, linear_condition


def main():
    rng = np.random.default_rng(0)

    # ---- temporal: AR1 ------------------------------------------------------
    n = 365
    model = AR1Model(n)
    prior = model(tau=2.0, rho=0.95)  # x_t = ρ x_{t-1} + ε_t

    # observe every 7th day with noise σ = 0.1
    obs_idx = np.arange(0, n, 7)
    truth = np.sin(np.linspace(0, 6 * np.pi, n))
    y = truth[obs_idx] + 0.1 * rng.standard_normal(len(obs_idx))

    import scipy.sparse as sp
    from tpu_gmrf.sparse import from_scipy

    A = from_scipy(sp.eye(n).tocsr()[obs_idx])
    post = linear_condition(prior, jnp.asarray(y), Q_eps=1.0 / 0.1**2, A=A)

    rmse = float(jnp.sqrt(jnp.mean((post.mean - truth) ** 2)))
    mean_std = float(jnp.mean(post.std()))
    print(f"AR1 posterior RMSE vs truth: {rmse:.3f}")
    print(f"posterior mean marginal std: {mean_std:.3f}")
    # correctness anchors: weekly observations at σ=0.1 recover the smooth
    # truth well, and the posterior std must be far below the prior's
    assert rmse < 0.12, rmse
    assert mean_std < float(jnp.mean(prior.std())) / 2
    # golden values from the independent f64 scipy oracle on this exact
    # seeded config (tools/golden_values.py) — BASELINE.md consequence #1
    assert abs(rmse - 0.078080) < 2e-3, rmse
    assert abs(mean_std - 0.723701) < 5e-3, mean_std

    # a posterior sample
    s = post.sample(jax.random.PRNGKey(1))
    print(f"sample range: [{float(s.min()):.2f}, {float(s.max()):.2f}]")

    # ---- spatial: Matérn from scattered points (README quickstart) ---------
    pts = rng.uniform(0, 1, size=(80, 2))
    smodel = MaternModel(pts, smoothness=1)
    x = smodel(tau=1.0, range=0.3)
    Aev = smodel.evaluation_matrix()
    ys = np.cos(4 * pts[:, 0]) + 0.05 * rng.standard_normal(80)
    spost = linear_condition(x, jnp.asarray(ys), Q_eps=1.0 / 0.05**2, A=Aev)
    pred = np.asarray(Aev.matvec(spost.mean))
    fit_rmse = float(np.sqrt(np.mean((pred - ys) ** 2)))
    s_mean_std = float(jnp.mean(spost.std()))
    print(f"Matérn posterior fit RMSE at points: {fit_rmse:.4f}")
    print(f"mean posterior std over mesh: {s_mean_std:.4f}")
    assert fit_rmse < 0.1, fit_rmse
    # golden values (f64 oracle, tools/golden_values.py)
    assert abs(fit_rmse - 0.004299) < 2e-3, fit_rmse
    assert abs(s_mean_std - 0.494114) < 1e-2, s_mean_std


if __name__ == "__main__":
    main()
