"""Benchmarks for the three headline workloads (BASELINE.md):

1. Supernodal sparse Cholesky factorize + selected inversion throughput on a
   ~16k-node 2D Matérn precision (the CHOLMOD-role core,
   reference src/workspace/backend.jl:24-182).
2. End-to-end NUTS posterior samples/sec on a *spatial* Poisson model whose
   Laplace marginals run through the supernodal backend.
3. The flagship n=500 Poisson/AR1 NUTS workload (reference
   benchmarks/benchmarks.jl:69-76) — 256 vmapped chains per chip.

Robustness: every metric runs in its OWN subprocess under a wall-clock
timeout, so a compile blowup or device fault in one workload cannot take
down the others (round-2 failure mode: one TPU device error killed the whole
bench). The flagship runs FIRST (the most important number lands even if the
budget runs out) but its JSON line is printed LAST so a single-line parser
records it. `vs_baseline` for the flagship is measured against the round-1
number (223.134 samples/s); other metrics use 1.0 (the reference publishes
no absolute numbers, BASELINE.md).

Eager-execution hygiene: on the axon TPU backend every un-jitted op is a
tunnel round trip, so workloads must build precisions via `model.precision`
(host + cheap ops) and keep factorizations inside jit — `model(...)`
factorizes eagerly and takes minutes off-jit.
"""

import json
import subprocess
import sys
import time

import numpy as np

R1_FLAGSHIP = 223.134  # BENCH_r01.json

# (name, subprocess timeout seconds)
METRICS = [
    ("flagship_ar1", 900),
    ("supernodal_factorize_selinv", 540),
    ("spatial_poisson_nuts", 540),
    ("spmv", 420),
]


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
    """Factorize + selected-inverse diagonal of a ~16k-node 2D Matérn(α=2)
    precision. GFLOP/s uses the symbolic multiply-add count (Σ colcount² for
    the factorization; selected inversion does the same traversal again), so
    value = 2 · 2 · Σcc² / wall — a conservative, pattern-derived count."""
    import dataclasses

    import jax

    from tpu_gmrf import MaternModel
    from tpu_gmrf.solvers.base import SolverSpec
    from tpu_gmrf.solvers.supernodal import (
        supernodal_factorize,
        supernodal_symbolic_summary,
    )

    gx, gy = np.meshgrid(np.linspace(0, 1, 100), np.linspace(0, 1, 100))
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    model = MaternModel(pts, smoothness=1, solver=SolverSpec(kind="supernodal"))
    Q = model.precision(tau=1.0, range=0.25)  # no eager factorization
    summ = supernodal_symbolic_summary(Q.pattern)["flops"]
    n = Q.shape[0]

    @jax.jit
    def work(data):
        f = supernodal_factorize(dataclasses.replace(Q, data=data))
        return f.logdet(), f.selinv_diag()

    ld, d = work(Q.data)
    jax.block_until_ready(d)
    assert np.isfinite(float(ld)), f"non-finite logdet {float(ld)}"
    reps = 3
    t0 = time.time()
    for i in range(reps):
        ld, d = work(Q.data * (1.0 + 1e-6 * i))
        jax.block_until_ready(d)
    dt = (time.time() - t0) / reps
    gflops = 4.0 * summ / dt / 1e9
    _emit(f"supernodal_factorize_selinv_gflops_n{n}_matern2d", gflops, "GFLOP/s")


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
    n = model.n
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
        # chunked dispatch: each supernodal-Newton leapfrog is expensive, so
        # a full-run dispatch would execute for minutes on-device — the axon
        # relay kills long dispatches (round-2/3 failure mode)
        return run_nuts(
            ld, key, init, num_warmup=num_warmup, num_samples=num_samples,
            max_depth=6, dispatch_chunk=5,
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
    # jit: eager sampling through the axon tunnel costs minutes of op round trips
    x_true = np.asarray(
        jax.jit(lambda k: model(tau=1.0, rho=0.7).sample(k))(jax.random.PRNGKey(0))
    )
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
        # dispatch_chunk keeps each device dispatch ~15 s: single-dispatch
        # runs of this workload intermittently die with `UNAVAILABLE: TPU
        # device error` through the axon relay (round-2/3 failure mode)
        return run_nuts(
            ld, key, init, num_warmup=num_warmup, num_samples=num_samples,
            max_depth=8, dispatch_chunk=25,
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


def bench_spmv():
    """The CG/RBMC hot multiply (`kernels.hot_matvec` — dense block-tridiag
    MXU einsums on banded-after-RCM patterns) vs the XLA COO segment-sum
    matvec on a ~16k-node Matérn pattern, 8 RHS. Emits effective GB/s of
    sparse payload (nnz values + x + y) with vs_baseline = speedup over the
    COO path."""
    import jax
    import jax.numpy as jnp

    from tpu_gmrf import MaternModel
    from tpu_gmrf.kernels import hot_matvec
    from tpu_gmrf.solvers.base import SolverSpec

    gx, gy = np.meshgrid(np.linspace(0, 1, 100), np.linspace(0, 1, 100))
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    model = MaternModel(pts, smoothness=1, solver=SolverSpec(kind="cg"))
    Q = model.precision(tau=1.0, range=0.25)
    n, k = Q.shape[0], 8
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, k)), jnp.float32)

    coo = jax.jit(lambda v: Q.matvec(v))
    mv = hot_matvec(Q)
    # pass the matvec pytree as an ARGUMENT: baked-in 50MB constants stall
    # the compiler through the remote-compile tunnel
    hot_f = jax.jit(lambda m, v: m(v))
    hot = lambda v: hot_f(mv, v)

    def timeit(fn):
        y = fn(x)
        jax.block_until_ready(y)
        reps = 50
        t0 = time.time()
        for _ in range(reps):
            y = fn(x)
        jax.block_until_ready(y)
        return (time.time() - t0) / reps

    t_coo = timeit(coo)
    t_hot = timeit(hot)
    payload = Q.nnz * 4 + 2 * n * k * 4
    _emit(
        f"spmv_payload_gbps_n{n}_k{k}_hot",
        payload / t_hot / 1e9,
        "GB/s",
        vs_baseline=t_coo / t_hot,
    )


def main():
    lines = {}
    for name, tmo in METRICS:
        got = []
        for attempt in range(2):  # one retry: transient UNAVAILABLE happens
            try:
                out = subprocess.run(
                    [sys.executable, __file__, "--metric", name],
                    capture_output=True,
                    text=True,
                    timeout=tmo,
                )
                got = [l for l in out.stdout.splitlines() if l.startswith("{")]
                if out.returncode == 0 and got:
                    break
                tail = (out.stderr or out.stdout).strip().splitlines()[-3:]
                print(
                    f"# bench {name} attempt {attempt + 1} failed "
                    f"(rc={out.returncode}): {' | '.join(tail)}",
                    flush=True,
                )
            except subprocess.TimeoutExpired:
                print(f"# bench {name} attempt {attempt + 1} timed out after {tmo}s", flush=True)
        lines[name] = got
    # secondary metrics first, flagship line last (single-line parsers)
    for name, _ in METRICS[1:]:
        for l in lines.get(name, []):
            print(l, flush=True)
    for l in lines.get("flagship_ar1", []):
        print(l, flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--metric":
        {
            "flagship_ar1": bench_flagship_ar1,
            "supernodal_factorize_selinv": bench_supernodal_factorize_selinv,
            "spatial_poisson_nuts": bench_spatial_poisson_nuts,
            "spmv": bench_spmv,
        }[sys.argv[2]]()
    else:
        main()
