"""Benchmark: NUTS posterior samples/sec/chip on the flagship GMRF
hyperparameter-inference workload (Poisson observations over an AR1 latent
field, n=500 — the reference's gaussian_approximation benchmark size,
benchmarks/benchmarks.jl:69-76). Each NUTS leaf evaluates a full Laplace
marginal (Newton mode + logdet) and its IFT gradient; 16 chains run as one
vmapped batch so factorizations hit the MXU as batched dense Cholesky.

Prints ONE JSON line. `vs_baseline` is 1.0 by convention: the reference
publishes no absolute numbers (BASELINE.md), so the baseline is this
framework's own first-round measurement.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu_gmrf import AR1Model, ExponentialFamily, laplace_marginal
    from tpu_gmrf.samplers import (
        LogitTransform,
        LogTransform,
        ParamSpec,
        make_logdensity,
        run_nuts,
    )

    n = 500
    # The eval is latency-bound on a single chip: 256 vmapped chains cost
    # nearly the same wall-clock as 16 (measured ~2.5 ms/leapfrog either
    # way), so throughput/chip scales with the chain batch — the BASELINE
    # scaling axis ("64+ NUTS chains").
    n_chains = 256
    num_warmup = 100
    num_samples = 100

    import jax.numpy as _jnp

    rng = np.random.default_rng(0)
    model = AR1Model(n)
    x_true = np.asarray(model(tau=1.0, rho=0.7).sample(jax.random.PRNGKey(0)))
    y = rng.poisson(np.exp(np.clip(x_true, -3, 3))).astype(np.float32)
    obs = ExponentialFamily("poisson")
    # weakly-informative priors keep warmup exploration in f32-safe territory
    spec = ParamSpec(
        tau=(LogTransform(), lambda t: -0.5 * _jnp.log(t) ** 2),
        rho=(LogitTransform(-1.0, 1.0), lambda r: 0.0),
    )
    from tpu_gmrf import GAOptions

    ga_opts = GAOptions(max_iter=25)

    def loglik(theta):
        return laplace_marginal(model, obs, y, theta, options=ga_opts)

    ld = make_logdensity(loglik, spec)
    init = jnp.zeros((n_chains, 2), jnp.float32)

    def run(key):
        return run_nuts(
            ld,
            key,
            init,
            num_warmup=num_warmup,
            num_samples=num_samples,
            max_depth=8,
        )

    # compile warm-up
    res = run(jax.random.PRNGKey(1))
    jax.block_until_ready(res.samples)
    # timed run
    t0 = time.time()
    res = run(jax.random.PRNGKey(2))
    jax.block_until_ready(res.samples)
    dt = time.time() - t0

    total_samples = n_chains * num_samples
    # count warmup as work too (it runs the same kernels) but report
    # samples/sec in terms of retained posterior draws over total wall time
    sps = total_samples / dt
    print(
        json.dumps(
            {
                "metric": "nuts_posterior_samples_per_sec_per_chip_n500_poisson_ar1",
                "value": round(sps, 3),
                "unit": "samples/s",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
