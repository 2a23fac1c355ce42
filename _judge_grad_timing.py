import sys, time
import numpy as np

root = sys.argv[1]
sys.path.insert(0, root)

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from tpu_gmrf import AR1Model, ExponentialFamily, GAOptions, laplace_marginal

n = 500
rng = np.random.default_rng(0)
model = AR1Model(n)
y = rng.poisson(2.0, size=n).astype(np.float32)
obs = ExponentialFamily("poisson")
opts = GAOptions(max_iter=25)


def loss(params):
    log_tau, arctanh_rho = params
    return -laplace_marginal(
        model,
        obs,
        y,
        {"tau": jnp.exp(log_tau), "rho": jnp.tanh(arctanh_rho)},
        options=opts,
    )


vg = jax.jit(jax.value_and_grad(loss))
p = jnp.asarray([0.0, 0.5], jnp.float32)
t0 = time.time()
v, g = vg(p)
jax.block_until_ready(g)
t_compile = time.time() - t0
t0 = time.time()
reps = 20
for i in range(reps):
    v, g = vg(p + 1e-6 * i)
    jax.block_until_ready(g)
t_run = (time.time() - t0) / reps
print(f"{root}: compile+first={t_compile:.2f}s per-eval={t_run * 1e3:.1f}ms value={float(v):.4f} grad={np.asarray(g)}")
