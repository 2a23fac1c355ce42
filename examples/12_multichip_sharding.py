"""Multi-chip sharding: chain-, particle-, and time-axis parallelism.

No reference equivalent — this is the TPU-native scaling story (SURVEY §5):

1. **Chain parallelism**: NUTS chains sharded over a device mesh
   (`run_nuts(mesh=...)`) — the warmup's cross-chain step-size adaptation
   becomes an ICI all-reduce.
2. **Particle parallelism**: tempered SMC with particles sharded over the
   mesh (`run_smc(mesh=...)`) — ESS/normalization/resampling ride
   `psum`/`all_gather` collectives.
3. **Time-axis parallelism**: a spatiotemporal block-tridiagonal solve
   distributed over the mesh with the SPIKE substructuring algorithm
   (`parallel.pbtridiag_solve`, ppermute/psum collectives).

Runs on any device count: creates 8 virtual CPU devices when only one
device is present, so the same script validates on a laptop and scales on a
TPU pod slice.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import jax

# Default to the 8-virtual-device CPU mesh; set GMRF_EXAMPLE_PLATFORM=tpu on
# a real pod slice. (Probing jax.devices() first would initialize the TPU
# runtime even when we only want CPU.)
if os.environ.get("GMRF_EXAMPLE_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import Mesh

from tpu_gmrf import AR1Model, ExponentialFamily, laplace_marginal
from tpu_gmrf.parallel import pbtridiag_logdet, pbtridiag_solve
from tpu_gmrf.samplers import (
    LogTransform,
    LogitTransform,
    ParamSpec,
    make_logdensity,
    run_nuts,
    run_smc,
)


def main():
    devices = np.array(jax.devices())
    n_dev = len(devices)
    print(f"{n_dev} devices: {devices[0].platform}")

    # ---- 1) chain-parallel NUTS on the flagship AR1/Poisson posterior ----
    n = 64
    rng = np.random.default_rng(0)
    model = AR1Model(n)
    y = rng.poisson(2.0, size=n).astype(np.float32)
    obs = ExponentialFamily("poisson")
    spec = ParamSpec(
        tau=(LogTransform(), lambda t: -0.5 * jnp.log(t) ** 2),
        rho=(LogitTransform(-1.0, 1.0), lambda r: 0.0),
    )
    ld = make_logdensity(lambda th: laplace_marginal(model, obs, y, th), spec)

    mesh = Mesh(devices, ("chains",))
    n_chains = 2 * n_dev
    init = jnp.zeros((n_chains, 2), jnp.float32)
    res = run_nuts(
        ld, jax.random.PRNGKey(0), init, num_warmup=100, num_samples=100, mesh=mesh
    )
    samples = np.asarray(res.samples)  # (chains, draws, 2)
    tau_post = np.exp(samples[..., 0])
    print(f"chain-parallel NUTS: {n_chains} chains × 100 draws, "
          f"tau posterior mean {tau_post.mean():.3f} ± {tau_post.std():.3f}")
    assert np.isfinite(samples).all()

    # ---- 2) particle-parallel tempered SMC on the same posterior ----------
    pmesh = Mesh(devices, ("particles",))
    n_part = 32 * n_dev

    def log_prior(z):
        return -0.5 * z @ z

    def log_lik(z):
        return ld(z) + 0.5 * z @ z

    init_p = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (n_part, 2), jnp.float32)
    smc = run_smc(
        log_prior, log_lik, jax.random.PRNGKey(2), init_p,
        num_move_steps=2, hmc_num_steps=4, step_size=0.2, mesh=pmesh,
    )
    tau_smc = np.exp(np.asarray(smc.particles)[:, 0])
    print(f"particle-parallel SMC: {n_part} particles, "
          f"tau mean {tau_smc.mean():.3f}, log evidence {float(smc.log_evidence):.2f}")
    # the two samplers must agree on the (broad) posterior within its spread
    assert abs(tau_smc.mean() - tau_post.mean()) < tau_post.std()

    # ---- 3) time-axis-sharded block-tridiagonal solve --------------------
    tmesh = Mesh(devices, ("time",))
    Nt, ns = 4 * n_dev, 8
    rng = np.random.default_rng(3)
    diag = rng.normal(size=(Nt, ns, ns)).astype(np.float32)
    diag = diag @ np.swapaxes(diag, -1, -2) + (ns + 1.0) * np.eye(ns, dtype=np.float32)
    sub = (0.05 * rng.normal(size=(Nt - 1, ns, ns))).astype(np.float32)
    b = rng.normal(size=(Nt, ns)).astype(np.float32)

    @jax.jit
    def st_solve(diag, sub, b):
        return (
            pbtridiag_solve(diag, sub, b, tmesh),
            pbtridiag_logdet(diag, sub, tmesh),
        )

    x, logdet = st_solve(jnp.asarray(diag), jnp.asarray(sub), jnp.asarray(b))
    # dense oracle
    Qd = np.zeros((Nt * ns, Nt * ns), np.float64)
    for t in range(Nt):
        Qd[t * ns : (t + 1) * ns, t * ns : (t + 1) * ns] = diag[t]
    for t in range(Nt - 1):
        Qd[(t + 1) * ns : (t + 2) * ns, t * ns : (t + 1) * ns] = sub[t]
        Qd[t * ns : (t + 1) * ns, (t + 1) * ns : (t + 2) * ns] = sub[t].T
    x_ref = np.linalg.solve(Qd, b.ravel())
    err = np.abs(np.asarray(x).ravel() - x_ref).max()
    sign, ld_ref = np.linalg.slogdet(Qd)
    print(f"time-sharded SPIKE solve over {n_dev} devices: max err {err:.2e}, "
          f"logdet {float(logdet):.2f} (dense {ld_ref:.2f})")
    assert err < 1e-3
    assert abs(float(logdet) - ld_ref) < 0.05
    print("OK")


if __name__ == "__main__":
    main()
