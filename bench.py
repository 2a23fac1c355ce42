"""Benchmarks for the three headline workloads (BASELINE.md):

1. Supernodal sparse Cholesky factorize + selected inversion throughput on a
   ~10k-node 2D Matérn precision (the CHOLMOD-role core,
   reference src/workspace/backend.jl:24-182).
2. End-to-end NUTS posterior samples/sec on a *spatial* Poisson model whose
   Laplace marginals run through the supernodal backend.
3. The flagship n=500 Poisson/AR1 NUTS workload (reference
   benchmarks/benchmarks.jl:69-76) — 256 vmapped chains per chip.

Prints one JSON line PER metric; the flagship metric is printed LAST so a
single-line parser records it. `vs_baseline` for the flagship is measured
against the round-1 number (223.134 samples/s); new metrics use 1.0 (the
reference publishes no absolute numbers, BASELINE.md).
"""

import json
import time

import numpy as np

R1_FLAGSHIP = 223.134  # BENCH_r01.json


def _emit(metric, value, unit, vs_baseline=1.0):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(float(value), 3),
                "unit": unit,
                "vs_baseline": round(float(vs_baseline), 3),
            }
        ),
        flush=True,
    )


def bench_supernodal_factorize_selinv():
    """Factorize + selected-inverse diagonal of a ~10k-node 2D Matérn(α=2)
    precision. GFLOP/s uses the symbolic multiply-add count (Σ colcount² for
    the factorization; selected inversion does the same traversal again), so
    value = 2 · 2 · Σcc² / wall — a conservative, pattern-derived count."""
    import jax
    import jax.numpy as jnp

    from tpu_gmrf import MaternModel
    from tpu_gmrf.solvers.base import SolverSpec
    from tpu_gmrf.solvers.supernodal import (
        supernodal_factorize,
        supernodal_symbolic_summary,
    )

    gx, gy = np.meshgrid(np.linspace(0, 1, 100), np.linspace(0, 1, 100))
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    model = MaternModel(pts, smoothness=1, solver=SolverSpec(kind="supernodal"))
    prior = model(tau=1.0, range=0.25)
    Q = prior.Q
    summ = supernodal_symbolic_summary(Q.pattern)["flops"]
    n = Q.shape[0]

    @jax.jit
    def work(data):
        import dataclasses

        Q2 = dataclasses.replace(Q, data=data)
        f = supernodal_factorize(Q2)
        return f.logdet(), f.selinv_diag()

    ld, d = work(Q.data)
    jax.block_until_ready(d)
    reps = 5
    t0 = time.time()
    for i in range(reps):
        ld, d = work(Q.data * (1.0 + 1e-6 * i))
        jax.block_until_ready(d)
    dt = (time.time() - t0) / reps
    gflops = 4.0 * summ / dt / 1e9
    _emit(
        f"supernodal_factorize_selinv_gflops_n{n}_matern2d",
        gflops,
        "GFLOP/s",
    )
    return dt


def bench_spatial_poisson_nuts():
    """NUTS over (tau, range) of a Matérn-latent Poisson model: every leapfrog
    leaf re-assembles the SPDE precision, runs the Newton Laplace
    approximation through the supernodal backend, and differentiates via the
    IFT rules. 8 vmapped chains."""
    import jax
    import jax.numpy as jnp

    from tpu_gmrf import ExponentialFamily, GAOptions, MaternModel, laplace_marginal
    from tpu_gmrf.samplers import (
        LogTransform,
        ParamSpec,
        make_logdensity,
        run_nuts,
    )
    from tpu_gmrf.solvers.base import SolverSpec

    rng = np.random.default_rng(1)
    gx, gy = np.meshgrid(np.linspace(0, 1, 20), np.linspace(0, 1, 20))
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    model = MaternModel(pts, smoothness=1, solver=SolverSpec(kind="supernodal"))
    n = model(tau=1.0, range=0.4).n
    truth = np.sin(3.0 * gx.ravel()) * np.cos(2.0 * gy.ravel())
    field = np.zeros(n, np.float32)
    field[: truth.shape[0]] = truth
    y = rng.poisson(np.exp(np.clip(field, -3, 3))).astype(np.float32)
    obs = ExponentialFamily("poisson")

    spec = ParamSpec(
        tau=(LogTransform(), lambda t: -0.5 * jnp.log(t) ** 2),
        range=(LogTransform(), lambda r: -0.5 * (jnp.log(r) - np.log(0.3)) ** 2),
    )
    opts = GAOptions(max_iter=20)

    def loglik(theta):
        return laplace_marginal(model, obs, y, theta, options=opts)

    ld = make_logdensity(loglik, spec)
    n_chains, num_warmup, num_samples = 8, 30, 30
    init = jnp.tile(jnp.asarray([0.0, np.log(0.3)], jnp.float32), (n_chains, 1))

    def run(key):
        return run_nuts(
            ld, key, init, num_warmup=num_warmup, num_samples=num_samples, max_depth=6
        )

    res = run(jax.random.PRNGKey(3))
    jax.block_until_ready(res.samples)
    t0 = time.time()
    res = run(jax.random.PRNGKey(4))
    jax.block_until_ready(res.samples)
    dt = time.time() - t0
    _emit(
        f"nuts_samples_per_sec_spatial_poisson_matern_n{n}",
        n_chains * num_samples / dt,
        "samples/s",
    )


def bench_flagship_ar1():
    import jax
    import jax.numpy as jnp

    from tpu_gmrf import AR1Model, ExponentialFamily, GAOptions, laplace_marginal
    from tpu_gmrf.samplers import (
        LogitTransform,
        LogTransform,
        ParamSpec,
        make_logdensity,
        run_nuts,
    )

    n = 500
    n_chains = 256
    num_warmup = 100
    num_samples = 100

    rng = np.random.default_rng(0)
    model = AR1Model(n)
    x_true = np.asarray(model(tau=1.0, rho=0.7).sample(jax.random.PRNGKey(0)))
    y = rng.poisson(np.exp(np.clip(x_true, -3, 3))).astype(np.float32)
    obs = ExponentialFamily("poisson")
    spec = ParamSpec(
        tau=(LogTransform(), lambda t: -0.5 * jnp.log(t) ** 2),
        rho=(LogitTransform(-1.0, 1.0), lambda r: 0.0),
    )
    ga_opts = GAOptions(max_iter=25)

    def loglik(theta):
        return laplace_marginal(model, obs, y, theta, options=ga_opts)

    ld = make_logdensity(loglik, spec)
    init = jnp.zeros((n_chains, 2), jnp.float32)

    def run(key):
        return run_nuts(
            ld, key, init, num_warmup=num_warmup, num_samples=num_samples, max_depth=8
        )

    res = run(jax.random.PRNGKey(1))
    jax.block_until_ready(res.samples)
    t0 = time.time()
    res = run(jax.random.PRNGKey(2))
    jax.block_until_ready(res.samples)
    dt = time.time() - t0
    sps = n_chains * num_samples / dt
    _emit(
        "nuts_posterior_samples_per_sec_per_chip_n500_poisson_ar1",
        sps,
        "samples/s",
        vs_baseline=sps / R1_FLAGSHIP,
    )


def main():
    for fn in (bench_supernodal_factorize_selinv, bench_spatial_poisson_nuts):
        try:
            fn()
        except Exception as e:  # a failed secondary metric must not kill the run
            print(f"# bench {fn.__name__} failed: {type(e).__name__}: {e}", flush=True)
    bench_flagship_ar1()


if __name__ == "__main__":
    main()
