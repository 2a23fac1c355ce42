"""Bernoulli spatial classification figure — the JOSS paper figure script
(reference paper/generate_figure.jl): scattered binary marks, a Matérn
latent field, Laplace inference, train/test accuracy, and a predicted
probability surface on a 100×100 grid via `conditional_distribution`.

The reference downloads the Lansing Woods hickory data; this environment
has no network, so an equivalent synthetic marked point pattern (smooth
logit surface, ~580 points on the unit square) stands in. The pipeline —
MaternModel → PointEvaluationObsModel(Bernoulli) → gaussian_approximation →
conditional_distribution on a prediction grid — is identical.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from tpu_gmrf import (
    ExponentialFamily,
    MaternModel,
    conditional_distribution,
    gaussian_approximation,
)
from tpu_gmrf.fem.obs_models import PointEvaluationObsModel


def main():
    rng = np.random.default_rng(42)

    # marked point pattern: smooth class-probability surface on [0,1]^2
    n_pts = 580
    X = rng.uniform(0, 1, size=(n_pts, 2))
    logit = 5.0 * np.sin(4.0 * X[:, 0]) * np.cos(3.0 * X[:, 1]) + 3.0 * (
        X[:, 1] - 0.5
    )
    y_all = (rng.uniform(size=n_pts) < 1 / (1 + np.exp(-logit))).astype(np.float32)

    # 80/20 train/test split (reference generate_figure.jl)
    perm = rng.permutation(n_pts)
    split = int(round(0.8 * n_pts))
    tr, te = perm[:split], perm[split:]
    X_train, y_train = X[tr], y_all[tr]
    X_test, y_test = X[te], y_all[te]

    # latent Matérn field on a mesh over all points
    latent = MaternModel(X, smoothness=1)
    u = latent(tau=1.0, range=0.2)

    obs_model = PointEvaluationObsModel(
        latent.disc, X_train, ExponentialFamily("bernoulli")
    )
    lik = obs_model(jnp.asarray(y_train))

    post = gaussian_approximation(u, lik)

    # test accuracy via the predictive distribution
    obs_test = PointEvaluationObsModel(
        latent.disc, X_test, ExponentialFamily("bernoulli")
    )
    p_test = np.asarray(conditional_distribution(obs_test, post.mean).mean())
    acc = float(np.mean((p_test >= 0.5) == (y_test > 0.5)))
    print(f"test accuracy: {acc:.2%}")
    assert acc > 0.6, f"classifier should beat chance clearly, got {acc:.2%}"

    # probability surface on a 100x100 grid
    nx = ny = 100
    xs, ys = np.linspace(0, 1, nx), np.linspace(0, 1, ny)
    gx, gy = np.meshgrid(xs, ys)
    grid = np.stack([gx.ravel(), gy.ravel()], axis=1)
    obs_grid = PointEvaluationObsModel(
        latent.disc, grid, ExponentialFamily("bernoulli")
    )
    probs = np.asarray(conditional_distribution(obs_grid, post.mean).mean())
    probs = probs.reshape(ny, nx)
    assert np.all((probs >= 0) & (probs <= 1))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 5))
        im = ax.pcolormesh(gx, gy, probs, cmap="RdBu_r", vmin=0, vmax=1)
        mask1 = y_train > 0.5
        ax.scatter(X_train[mask1, 0], X_train[mask1, 1], s=6, c="k", marker="o")
        ax.scatter(X_train[~mask1, 0], X_train[~mask1, 1], s=6, c="w", marker="o",
                   edgecolors="k", linewidths=0.3)
        fig.colorbar(im, ax=ax, label="P(class 1)")
        ax.set_title(f"Bernoulli classification (test acc {acc:.1%})")
        out = os.path.join(os.path.dirname(__file__), "paper_figure.png")
        fig.savefig(out, dpi=150, bbox_inches="tight", transparent=True)
        print(f"wrote {out}")
    except Exception as e:  # matplotlib optional
        print(f"skipped figure rendering: {e}")


if __name__ == "__main__":
    main()
