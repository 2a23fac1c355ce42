"""Fully Bayesian hyperparameter inference: NUTS over a CAR model.

Mirrors the reference's `autodiff_mcmc.jl` tutorial: a conditional
autoregressive (CAR) process with unknown spatial dependence rho and scale
sigma, observed directly; NUTS samples the hyperparameter posterior, with
every leapfrog step differentiating the GMRF logpdf (sparse factorization +
logdet) by autodiff. The reference drives Turing/Enzyme; here the native
NUTS sampler runs the whole chain as one jitted lax.while_loop on device,
and JAX reverse-mode differentiates through the factorization rules.

Acceptance: true (rho, sigma) inside the central 95% posterior interval.
"""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from tpu_gmrf.models.car import generate_car_model
from tpu_gmrf.samplers import LogitTransform, ParamSpec, make_logdensity, run_nuts


def main():
    # 21-point chain graph with 1/|k| weights at lags 1 and 2
    N = 21
    rows, cols, vals = [], [], []
    for i in range(N):
        for k in (-2, -1, 1, 2):
            j = i + k
            if 0 <= j < N:
                rows.append(i)
                cols.append(j)
                vals.append(1.0 / abs(k))
    W = sp.csr_matrix((vals, (rows, cols)), shape=(N, N))

    true_rho, true_sigma = 0.85, 0.01
    true_car = generate_car_model(W, true_rho, sigma=true_sigma)
    y = true_car.sample(jax.random.PRNGKey(123))
    print(f"generated CAR observations, N={N}, true rho={true_rho}, sigma={true_sigma}")

    # Uniform priors on (0.5, 0.99) and (0.001, 0.1) via logit transforms —
    # the transform's log-Jacobian is the entire (flat) prior contribution.
    spec = ParamSpec(
        rho=(LogitTransform(0.5, 0.99), lambda r: 0.0),
        sigma=(LogitTransform(0.001, 0.1), lambda s: 0.0),
    )

    def loglik(theta):
        car = generate_car_model(W, theta["rho"], sigma=theta["sigma"])
        return car.logpdf(y)

    ld = make_logdensity(loglik, spec)

    # golden value: f64 dense slogdet+quadratic-form oracle of the CAR
    # logpdf at the true hyperparameters on this seeded draw
    # (tools/golden_values.py --only car)
    ll_truth = float(loglik({"rho": true_rho, "sigma": true_sigma}))
    assert abs(ll_truth - 24.138412) < 0.05, ll_truth

    n_chains = 4
    init = jnp.zeros((n_chains, 2), jnp.float32)
    res = run_nuts(
        ld,
        jax.random.PRNGKey(456),
        init,
        num_warmup=300,
        num_samples=500,
        max_depth=8,
    )
    # map unconstrained draws through the ParamSpec transforms
    draws = jax.vmap(jax.vmap(spec.constrain))(res.samples)
    rho_s = np.asarray(draws["rho"]).ravel()
    sig_s = np.asarray(draws["sigma"]).ravel()

    for name, s, truth in (("rho", rho_s, true_rho), ("sigma", sig_s, true_sigma)):
        lo, hi = np.quantile(s, [0.025, 0.975])
        print(
            f"{name}: posterior mean {s.mean():.4f} +- {s.std():.4f}, "
            f"95% CI [{lo:.4f}, {hi:.4f}], truth {truth} in CI: {lo <= truth <= hi}"
        )
        assert lo <= truth <= hi, f"true {name} outside the 95% interval"
    print("OK")


if __name__ == "__main__":
    main()
