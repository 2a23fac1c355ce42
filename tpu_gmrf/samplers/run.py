"""Sampling driver: warmup (dual averaging + Welford mass) and sampling,
vmapped over chains and optionally `shard_map`-sharded over a device mesh.

The TPU scaling model (BASELINE.json): chains are the data-parallel axis —
`run_nuts(..., mesh=mesh)` lays chains over the mesh's devices with XLA
collectives handling any cross-chain reductions. Each chain's NUTS tree is
an independent `while_loop`, so chains on one device batch via vmap while
the mesh axis rides ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .adaptation import (
    da_init,
    da_update,
    warmup_schedule,
    welford_init,
    welford_update,
    welford_variance,
)
from ..hoist import hoist_jit
from .hmc import HMCState, hmc_init, hmc_kernel
from .nuts import nuts_kernel

__all__ = ["run_nuts", "run_hmc", "NUTSResult"]


class _HMCInfo(NamedTuple):
    # module-level (not per-trace): chunked drivers concatenate info trees
    # across traces of different chunk sizes, so the treedef class must be
    # stable across traces
    accept_prob: Any
    diverging: Any
    depth: Any


class NUTSResult(NamedTuple):
    samples: Any  # (chains, num_samples, dim)
    logdensity: Any  # (chains, num_samples)
    step_size: Any  # (chains,)
    inv_mass: Any  # (chains, dim)
    accept_prob: Any  # (chains, num_samples)
    diverging: Any  # (chains, num_samples)
    depth: Any  # (chains, num_samples)


def _single_chain(
    logdensity_fn,
    kernel,
    key,
    init_position,
    num_warmup,
    num_samples,
    initial_step_size,
    target_accept,
    progress_every=None,
):
    dim = init_position.shape[0]
    dtype = init_position.dtype
    state = hmc_init(logdensity_fn, init_position)
    is_slow, window_end = warmup_schedule(num_warmup)

    def warmup_step(carry, inputs):
        key, slow, w_end = inputs
        state, da, welford, inv_mass = carry
        step_size = jnp.exp(da.log_step)
        state, info = kernel(key, state, step_size, inv_mass)
        da = da_update(da, info.accept_prob, target=target_accept)
        welford = jax.tree_util.tree_map(
            lambda new, old: jnp.where(slow, new, old),
            welford_update(welford, state.position),
            welford,
        )
        # window end: refresh mass, reset welford + dual averaging
        new_inv_mass = welford_variance(welford)
        inv_mass = jnp.where(w_end, new_inv_mass, inv_mass)
        fresh_da = da_init(jnp.exp(da.log_step))
        da = jax.tree_util.tree_map(
            lambda f, o: jnp.where(w_end, f, o), fresh_da, da
        )
        welford = jax.tree_util.tree_map(
            lambda f, o: jnp.where(w_end, f, o), welford_init(dim, dtype), welford
        )
        return (state, da, welford, inv_mass), None

    key, sub = jax.random.split(key)
    warm_keys = jax.random.split(sub, num_warmup)
    carry = (
        state,
        da_init(jnp.asarray(initial_step_size, dtype)),
        welford_init(dim, dtype),
        jnp.ones(dim, dtype),
    )
    (state, da, _, inv_mass), _ = jax.lax.scan(
        warmup_step, carry, (warm_keys, is_slow, window_end)
    )
    step_size = jnp.exp(da.log_step_avg)

    def sample_step(state, inp):
        i, key = inp
        state, info = kernel(key, state, step_size, inv_mass)
        if progress_every:
            # progress hook (reference verbose/progress-meter parity): fires
            # per chain under vmap — use for few-chain diagnostic runs
            jax.lax.cond(
                i % progress_every == 0,
                lambda: jax.debug.print(
                    "sampling draw {i}/{n}  logdensity={ld:.3f}",
                    i=i, n=num_samples, ld=state.logdensity,
                ),
                lambda: None,
            )
        return state, (state.position, state.logdensity, info)

    sample_keys = jax.random.split(key, num_samples)
    state, (positions, lds, infos) = jax.lax.scan(
        sample_step, state, (jnp.arange(num_samples), sample_keys)
    )
    return positions, lds, step_size, inv_mass, infos


def _run_chunked(
    logdensity_fn,
    kernel,
    key,
    init_positions,
    num_warmup,
    num_samples,
    initial_step_size,
    target_accept,
    chunk,
    progress_every=None,
    mesh=None,
    axis_name="chains",
):
    """Chunked-dispatch driver: identical math to `_single_chain`, but the
    warmup and sampling scans are split into host-level chunks of at most
    `chunk` transitions, each its own (cached-compile) jit call.

    Why: a single dispatch covering hundreds of NUTS transitions can run for
    minutes on-device; remote-attached TPUs (and long-running-program
    watchdogs generally) can kill such dispatches, wedging the chip. Short
    dispatches bound the blast radius and let a retry resume cheaply. The
    per-dispatch launch overhead (~ms) is negligible against multi-second
    chunks.

    Composes with `mesh`: the chain axis (axis 0 of every carry/key array)
    is laid out over the mesh devices with a NamedSharding, and each chunk
    dispatch runs SPMD across the mesh — this is the BASELINE.json config
    (64+ chains sharded over a pod slice) with the dispatch length bounded.
    All chunk jits are constant-hoisted (`hoist_jit`) so model tables ride
    as runtime arguments rather than HLO literals."""
    init_positions = jnp.atleast_2d(jnp.asarray(init_positions))
    num_chains, dim = init_positions.shape
    dtype = init_positions.dtype
    chain_keys = jax.random.split(key, num_chains)

    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        if num_chains % n_dev != 0:
            raise ValueError(
                f"num_chains={num_chains} must divide over {n_dev} devices"
            )
        sharding = NamedSharding(mesh, P(axis_name))

        def shard(tree):
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding)
                if hasattr(x, "ndim") and x.ndim >= 1
                else x,
                tree,
            )

        chain_keys = shard(chain_keys)
        init_positions = shard(init_positions)

    is_slow, window_end = warmup_schedule(num_warmup)
    is_slow = np.asarray(is_slow)
    window_end = np.asarray(window_end)

    @hoist_jit
    def init_chains(keys, positions):
        def one(key, pos):
            state = hmc_init(logdensity_fn, pos)
            wkeys = jax.random.split(jax.random.fold_in(key, 0), num_warmup)
            skeys = jax.random.split(jax.random.fold_in(key, 1), num_samples)
            return state, wkeys, skeys

        return jax.vmap(one)(keys, positions)

    state, wkeys, skeys = init_chains(chain_keys, init_positions)
    if shard is not None:
        state, wkeys, skeys = shard(state), shard(wkeys), shard(skeys)

    def wchunk(carry, keys, slow, w_end):
        def step(c, inp):
            k, sl, we = inp
            st, da, welford, inv_mass = c
            eps = jnp.exp(da.log_step)
            st, info = kernel(k, st, eps, inv_mass)
            da = da_update(da, info.accept_prob, target=target_accept)
            welford = jax.tree_util.tree_map(
                lambda new, old: jnp.where(sl, new, old),
                welford_update(welford, st.position),
                welford,
            )
            new_inv_mass = welford_variance(welford)
            inv_mass = jnp.where(we, new_inv_mass, inv_mass)
            fresh_da = da_init(jnp.exp(da.log_step))
            da = jax.tree_util.tree_map(lambda f, o: jnp.where(we, f, o), fresh_da, da)
            welford = jax.tree_util.tree_map(
                lambda f, o: jnp.where(we, f, o), welford_init(dim, dtype), welford
            )
            return (st, da, welford, inv_mass), None

        return jax.lax.scan(step, carry, (keys, slow, w_end))[0]

    w_jit = hoist_jit(jax.vmap(wchunk, in_axes=(0, 0, None, None)))
    carry = (
        state,
        da_init(jnp.full((num_chains,), initial_step_size, dtype)),
        jax.vmap(lambda _: welford_init(dim, dtype))(jnp.arange(num_chains)),
        jnp.ones((num_chains, dim), dtype),
    )
    if shard is not None:
        carry = shard(carry)
    for lo in range(0, num_warmup, chunk):
        hi = min(lo + chunk, num_warmup)
        carry = w_jit(
            carry,
            wkeys[:, lo:hi],
            jnp.asarray(is_slow[lo:hi]),
            jnp.asarray(window_end[lo:hi]),
        )
        if progress_every:
            print(f"warmup {hi}/{num_warmup}", flush=True)
    state, da, _, inv_mass = carry
    step_size = jnp.exp(da.log_step_avg)

    def schunk(state, keys, eps, im):
        def step(st, k):
            st, info = kernel(k, st, eps, im)
            return st, (st.position, st.logdensity, info)

        return jax.lax.scan(step, state, keys)

    s_jit = hoist_jit(jax.vmap(schunk))
    pos_chunks, ld_chunks, info_chunks = [], [], []
    for lo in range(0, num_samples, chunk):
        hi = min(lo + chunk, num_samples)
        state, (positions, lds, infos) = s_jit(
            state, skeys[:, lo:hi], step_size, inv_mass
        )
        pos_chunks.append(positions)
        ld_chunks.append(lds)
        info_chunks.append(infos)
        if progress_every:
            print(f"sampling {hi}/{num_samples}", flush=True)
    positions = jnp.concatenate(pos_chunks, axis=1)
    lds = jnp.concatenate(ld_chunks, axis=1)
    infos = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=1), *info_chunks
    )
    return NUTSResult(
        samples=positions,
        logdensity=lds,
        step_size=step_size,
        inv_mass=inv_mass,
        accept_prob=infos.accept_prob,
        diverging=infos.diverging,
        depth=infos.depth,
    )


def _run(
    logdensity_fn,
    kernel,
    key,
    init_positions,
    num_warmup,
    num_samples,
    initial_step_size,
    target_accept,
    mesh=None,
    axis_name="chains",
    progress_every=None,
):
    init_positions = jnp.atleast_2d(jnp.asarray(init_positions))
    num_chains = init_positions.shape[0]
    keys = jax.random.split(key, num_chains)

    chain_fn = partial(
        _single_chain,
        logdensity_fn,
        kernel,
        num_warmup=num_warmup,
        num_samples=num_samples,
        initial_step_size=initial_step_size,
        target_accept=target_accept,
        progress_every=progress_every,
    )
    vmapped = jax.vmap(chain_fn)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        if num_chains % n_dev != 0:
            raise ValueError(f"num_chains={num_chains} must divide over {n_dev} devices")
        sharding = NamedSharding(mesh, P(axis_name))
        keys = jax.device_put(keys, sharding)
        init_positions = jax.device_put(
            init_positions, NamedSharding(mesh, P(axis_name, None))
        )
        out = hoist_jit(vmapped)(keys, init_positions)
    else:
        out = hoist_jit(vmapped)(keys, init_positions)

    positions, lds, step_size, inv_mass, infos = out
    return NUTSResult(
        samples=positions,
        logdensity=lds,
        step_size=step_size,
        inv_mass=inv_mass,
        accept_prob=infos.accept_prob,
        diverging=infos.diverging,
        depth=infos.depth,
    )


def run_nuts(
    logdensity_fn: Callable,
    key,
    init_positions,
    num_warmup: int = 500,
    num_samples: int = 1000,
    max_depth: int = 10,
    initial_step_size: float = 0.1,
    target_accept: float = 0.8,
    mesh=None,
    progress_every: int | None = None,
    dispatch_chunk: int | None = None,
) -> NUTSResult:
    """Multi-chain NUTS. `init_positions`: (chains, dim) or (dim,).
    Pass `mesh` (jax.sharding.Mesh over one axis) to shard chains over
    devices; `progress_every=k` prints a progress line every k draws.
    `dispatch_chunk=k` splits warmup/sampling into host-level jit calls of
    at most k transitions each — use when a single dispatch would run for
    minutes on-device (remote-attached TPUs kill long dispatches). `mesh`
    and `dispatch_chunk` compose: chunked dispatch of SPMD-sharded chains
    (the multi-host scaling config with bounded dispatch lengths)."""
    kernel = nuts_kernel(logdensity_fn, max_depth=max_depth)
    if dispatch_chunk is not None:
        return _run_chunked(
            logdensity_fn,
            kernel,
            key,
            init_positions,
            num_warmup,
            num_samples,
            initial_step_size,
            target_accept,
            dispatch_chunk,
            progress_every=progress_every,
            mesh=mesh,
        )
    return _run(
        logdensity_fn,
        kernel,
        key,
        init_positions,
        num_warmup,
        num_samples,
        initial_step_size,
        target_accept,
        mesh=mesh,
        progress_every=progress_every,
    )


def run_hmc(
    logdensity_fn: Callable,
    key,
    init_positions,
    num_warmup: int = 500,
    num_samples: int = 1000,
    num_integration_steps: int = 32,
    initial_step_size: float = 0.1,
    target_accept: float = 0.8,
    mesh=None,
    progress_every: int | None = None,
    dispatch_chunk: int | None = None,
) -> NUTSResult:
    """Multi-chain HMC with a fixed leapfrog length. `dispatch_chunk` and
    `mesh` compose exactly as in `run_nuts` — each host-level jit covers at
    most `dispatch_chunk` transitions (the bounded-dispatch discipline that
    keeps remote-attached TPUs from killing long device programs)."""
    kernel = hmc_kernel(logdensity_fn, num_steps=num_integration_steps)

    def wrapped(key, state, step_size, inv_mass):
        state, info = kernel(key, state, step_size, inv_mass)
        return state, _HMCInfo(
            info["accept_prob"], ~info["accepted"], jnp.zeros((), jnp.int32)
        )

    if dispatch_chunk is not None:
        return _run_chunked(
            logdensity_fn,
            wrapped,
            key,
            init_positions,
            num_warmup,
            num_samples,
            initial_step_size,
            target_accept,
            dispatch_chunk,
            progress_every=progress_every,
            mesh=mesh,
        )
    return _run(
        logdensity_fn,
        wrapped,
        key,
        init_positions,
        num_warmup,
        num_samples,
        initial_step_size,
        target_accept,
        mesh=mesh,
        progress_every=progress_every,
    )
