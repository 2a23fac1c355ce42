"""Warm the 1e6-node supernodal workload on the chip: plan disk load,
table transfer, persistent-cache compile, then 3 timed calls + the scipy
splu host comparator. Writes progress lines immediately (run under nohup /
background; tail the log)."""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["TPU_GMRF_PLAN_CACHE"] = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".plan_cache"
)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from tests.test_scale import _grid_matern2_precision
from tpu_gmrf.solvers.supernodal import (
    supernodal_factorize_staged,
    supernodal_selinv_diag_staged,
    supernodal_symbolic_summary,
)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


t0 = time.time()
Q = _grid_matern2_precision(1000)
log(f"matrix built {time.time()-t0:.0f}s n={Q.shape[0]} nnz={Q.pattern.rows.shape[0]}")

t0 = time.time()
summ = supernodal_symbolic_summary(Q.pattern)
log(f"symbolic core {time.time()-t0:.0f}s flops={summ['flops']:.4g}")


def work():
    f = supernodal_factorize_staged(Q)
    d = supernodal_selinv_diag_staged(f)
    return float(f.logdet()) + float(d.sum())


t0 = time.time()
acc = work()
log(f"first call (plan load+transfer+compile+run): {time.time()-t0:.0f}s acc={acc:.6g}")
assert np.isfinite(acc), acc

for i in range(3):
    t0 = time.time()
    acc = work()
    dt = time.time() - t0
    log(
        f"warm call {i}: {dt:.2f}s -> {4.0*summ['flops']/dt/1e9:.1f} GFLOP/s "
        f"(factorize+selinv)"
    )

# host comparator (factorize only — conservative for vs_baseline)
import scipy.sparse as sp
import scipy.sparse.linalg as spl

A = sp.csr_matrix(
    (np.asarray(Q.data), (Q.pattern.rows, Q.pattern.cols)), shape=Q.pattern.shape
).tocsc()
t0 = time.time()
lu = spl.splu(A)
log(f"scipy splu factorize (host, 2 cores): {time.time()-t0:.1f}s")
log("DONE")
