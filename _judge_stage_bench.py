import time, numpy as np
t0 = time.time()
import jax, jax.numpy as jnp, dataclasses
from tpu_gmrf import MaternModel
from tpu_gmrf.solvers.base import SolverSpec
from tpu_gmrf.solvers.supernodal import (
    supernodal_factorize,
    supernodal_symbolic_summary,
    supernodal_plan,
)

gx, gy = np.meshgrid(np.linspace(0, 1, 100), np.linspace(0, 1, 100))
pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
print("imports", time.time() - t0, flush=True)
model = MaternModel(pts, smoothness=1, solver=SolverSpec(kind="supernodal"))
print("model built", time.time() - t0, flush=True)
prior = model(tau=1.0, range=0.25)
Q = prior.Q
print("prior materialized n=", Q.shape[0], time.time() - t0, flush=True)
s = supernodal_symbolic_summary(Q.pattern)
print("summary", s, time.time() - t0, flush=True)
plan = supernodal_plan(Q.pattern)
print("plan built", time.time() - t0, flush=True)


def work(data):
    Q2 = dataclasses.replace(Q, data=data)
    f = supernodal_factorize(Q2)
    return f.logdet(), f.selinv_diag()


lowered = jax.jit(work).lower(Q.data)
print("traced+lowered", time.time() - t0, flush=True)
comp = lowered.compile()
print("compiled", time.time() - t0, flush=True)
ld, d = comp(Q.data)
jax.block_until_ready(d)
print("ran, logdet=", float(ld), time.time() - t0, flush=True)
t1 = time.time()
for i in range(3):
    ld, d = comp(Q.data * (1.0 + 1e-6 * i))
    jax.block_until_ready(d)
print("3 reps", time.time() - t1, flush=True)
