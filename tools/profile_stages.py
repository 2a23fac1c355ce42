"""Per-stage wall profile of the supernodal factorization on the chip.

Uses the staged execution path at stage granularity (init / each scan
segment / each top level / Takahashi stages) with forced readback between
stages, to locate where factorize+selinv time goes at a given n — the
evidence base for the SURVEY §7 hard-part-1 (Pallas) decision.

Usage: python tools/profile_stages.py [grid_m]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "TPU_GMRF_PLAN_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".plan_cache"),
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
    _staged_fns,
    supernodal_plan,
    supernodal_factorize_staged,
)


def main(m=100):
    Q = _grid_matern2_precision(m)
    meta = (Q.pattern, 2048, "auto")
    plan = supernodal_plan(Q.pattern)
    fns = _staged_fns(meta)
    print(
        f"n={Q.shape[0]} nnzL={plan['nnzL']} nlevels={plan['nlevels']} "
        f"lstar={plan['lstar']} nseg={len(plan['segments'])} "
        f"flops={plan['flops']:.4g}"
    )

    # warm everything once
    f = supernodal_factorize_staged(Q)
    _ = float(f.logdet())

    def timed(fn, *args, reps=5):
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].sum())  # sync
        t0 = time.time()
        for _i in range(reps):
            out = fn(*args)
            _ = float(jax.tree_util.tree_leaves(out)[0].sum())
        return (time.time() - t0) / reps, out

    total = 0.0
    t, (vals, s) = timed(fns["init"], Q)
    print(f"init: {t*1e3:7.1f} ms")
    total += t
    nb = jnp.zeros((), jnp.int32)
    for i, fseg in enumerate(fns["segs"]):
        seg = plan["segments"][i]
        nlev = seg["hi"] - seg["lo"]
        ncls = len(seg["classes"])
        slots = sum(c["P"] for c in seg["classes"])
        t, (vals, nb) = timed(fseg, vals, nb)
        print(
            f"seg[{i}] levels {seg['lo']}..{seg['hi']}: {t*1e3:7.1f} ms "
            f"({ncls} classes, P-sum {slots}, {nlev} levels)"
        )
        total += t
    for i, ftop in enumerate(fns["tops"]):
        bks = plan["top_buckets"][i]
        shapes = [(b["W"], b["M"], b["panel_idx"].shape[0]) for b in bks]
        t, (vals, nb) = timed(ftop, vals, nb)
        print(f"top[{i}]: {t*1e3:7.1f} ms  buckets(W,M,B)={shapes}")
        total += t
    print(f"factorize total (stage-sync): {total*1e3:.1f} ms")

    sig = jnp.zeros(plan["nnzL"] + 1, vals.dtype)
    stot = 0.0
    for i in range(len(fns["sig_tops"]) - 1, -1, -1):
        t, sig = timed(fns["sig_tops"][i], vals, sig)
        print(f"sig_top[{i}]: {t*1e3:7.1f} ms")
        stot += t
    for i in range(len(fns["sig_segs"]) - 1, -1, -1):
        t, sig = timed(fns["sig_segs"][i], vals, sig)
        print(f"sig_seg[{i}]: {t*1e3:7.1f} ms")
        stot += t
    print(f"selinv total (stage-sync): {stot*1e3:.1f} ms")
    print(f"grand total: {(total+stot)*1e3:.1f} ms "
          f"-> {4.0*plan['flops']/(total+stot)/1e9:.1f} GFLOP/s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
