"""Constant-hoisting jit: keep large closed-over arrays out of the HLO.

JAX embeds every concrete array a traced function closes over as an HLO
literal. For this library that is fatal on the TPU path: supernodal symbolic
index tables (tens to hundreds of MB at n≥16k), banded scatter maps, and
observation vectors all ride in closures, so the serialized program blows up
and the axon remote-compile tunnel drops the upload (round-3 failure:
`remote_compile: response body closed`, BENCH_r03).

`hoist_jit` traces the function once with `make_jaxpr`, extracts the jaxpr's
constants, and re-enters them as *runtime arguments* of the compiled
executable. Measured: a 32 MB-literal program shrinks to ~4 KB of HLO with
identical semantics. The constants are device-put once at hoist time and
reused every call, so there is no per-call host→device traffic.

This plays the role CHOLMOD's persistent symbolic factor plays in the
reference (src/workspace/backend.jl:24-102): symbolic state lives *outside*
the numeric kernel and is passed in, never recompiled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["hoist_jit"]


def hoist_jit(fun, *, static_argnums=()):
    """Like `jax.jit(fun)`, but closed-over constants become runtime args.

    Returns a callable with the same signature as `fun`. On first call (per
    static-arg/shape signature) the function is traced, its jaxpr constants
    are hoisted to device arrays, and a jitted evaluator is cached; later
    calls pass the cached constants as ordinary arguments, so the compiled
    HLO contains no large literals.

    Limitations: like `jit`, shapes must be static per cache entry; `fun`
    must be a pure function of its arguments and closure.
    """
    cache: dict = {}
    static_argnums = tuple(static_argnums)

    def wrapped(*args):
        static_key = tuple(args[i] for i in static_argnums)
        dyn_args = [a for i, a in enumerate(args) if i not in static_argnums]
        flat, in_tree = jax.tree_util.tree_flatten(dyn_args)
        sig = (static_key, in_tree) + tuple(
            (jnp.shape(x), jnp.result_type(x)) for x in flat
        )
        entry = cache.get(sig)
        if entry is None:

            def positional(*dyn):
                dyn_full = jax.tree_util.tree_unflatten(in_tree, dyn)
                it = iter(dyn_full)
                full = [
                    args[i] if i in static_argnums else next(it)
                    for i in range(len(args))
                ]
                return fun(*full)

            closed, out_shape = jax.make_jaxpr(positional, return_shape=True)(
                *flat
            )
            out_tree = jax.tree_util.tree_structure(out_shape)
            consts = jax.device_put(closed.consts)

            def run(consts, *dyn):
                out = jax.core.eval_jaxpr(closed.jaxpr, consts, *dyn)
                return jax.tree_util.tree_unflatten(out_tree, out)

            jitted = jax.jit(run)
            entry = (jitted, consts)
            cache[sig] = entry
        jitted, consts = entry
        return jitted(consts, *flat)

    wrapped._hoist_cache = cache  # for tests / introspection
    return wrapped
