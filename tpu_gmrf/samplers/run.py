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
from .hmc import HMCState, hmc_init, hmc_kernel
from .nuts import nuts_kernel

__all__ = ["run_nuts", "run_hmc", "NUTSResult"]


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
        out = jax.jit(vmapped)(keys, init_positions)
    else:
        out = jax.jit(vmapped)(keys, init_positions)

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
) -> NUTSResult:
    """Multi-chain NUTS. `init_positions`: (chains, dim) or (dim,).
    Pass `mesh` (jax.sharding.Mesh over one axis) to shard chains over
    devices; `progress_every=k` prints a progress line every k draws."""
    kernel = nuts_kernel(logdensity_fn, max_depth=max_depth)
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
) -> NUTSResult:
    kernel = hmc_kernel(logdensity_fn, num_steps=num_integration_steps)

    def wrapped(key, state, step_size, inv_mass):
        state, info = kernel(key, state, step_size, inv_mass)

        class _I(NamedTuple):
            accept_prob: Any
            diverging: Any
            depth: Any

        return state, _I(info["accept_prob"], ~info["accepted"], jnp.zeros((), jnp.int32))

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
    )
