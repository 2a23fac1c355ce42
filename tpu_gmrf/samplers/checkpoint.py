"""Checkpoint/resume for long sampling runs (orbax-backed).

The reference has no checkpointing (SURVEY §5); BASELINE requires it for
long multi-host NUTS runs. Design: sampling proceeds in chunks; after each
chunk the full sampler state (positions, gradients, tuned step sizes, mass
matrices, RNG keys, draw counter) is written atomically; `resume` continues
from the last completed chunk.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .hmc import HMCState, hmc_init
from .nuts import nuts_kernel
from .run import _single_chain

__all__ = ["run_nuts_checkpointed"]


def _save(path, state: dict):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)


def _restore(path):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def run_nuts_checkpointed(
    logdensity_fn: Callable,
    key,
    init_positions,
    checkpoint_dir: str,
    num_warmup: int = 500,
    num_samples: int = 1000,
    chunk_size: int = 200,
    max_depth: int = 10,
    initial_step_size: float = 0.1,
    target_accept: float = 0.8,
):
    """Multi-chain NUTS with chunked sampling and resumable checkpoints.

    If `checkpoint_dir` contains a state, sampling resumes from it (warmup
    is not repeated). Returns (samples (chains, num_samples, dim), state)."""
    init_positions = jnp.atleast_2d(jnp.asarray(init_positions))
    n_chains, dim = init_positions.shape
    kernel = nuts_kernel(logdensity_fn, max_depth=max_depth)
    ckpt_path = os.path.join(checkpoint_dir, "nuts_state")

    if os.path.exists(ckpt_path):
        state = _restore(ckpt_path)
        positions = jnp.asarray(state["positions"])
        step_size = jnp.asarray(state["step_size"])
        inv_mass = jnp.asarray(state["inv_mass"])
        keys = jnp.asarray(state["keys"])
        drawn = int(state["drawn"])
        samples = [np.asarray(state["samples"])]
    else:
        # warmup via the standard driver with a handful of retained draws
        from .run import run_nuts

        warm = run_nuts(
            logdensity_fn,
            key,
            init_positions,
            num_warmup=num_warmup,
            num_samples=1,
            max_depth=max_depth,
            initial_step_size=initial_step_size,
            target_accept=target_accept,
        )
        positions = warm.samples[:, -1, :]
        step_size = warm.step_size
        inv_mass = warm.inv_mass
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            key, jnp.arange(n_chains)
        )
        drawn = 0
        samples = []

    @jax.jit
    def sample_chunk(keys, positions, step_size, inv_mass, n_steps_dummy):
        def one_chain(key, pos, eps, im):
            state = hmc_init(logdensity_fn, pos)

            def step(state, k):
                state, info = kernel(k, state, eps, im)
                return state, state.position

            chain_keys = jax.random.split(key, chunk_size)
            state, xs = jax.lax.scan(step, state, chain_keys)
            return xs, state.position

        return jax.vmap(one_chain)(keys, positions, step_size, inv_mass)

    while drawn < num_samples:
        keys = jax.vmap(lambda k: jax.random.fold_in(k, drawn))(keys)
        xs, positions = sample_chunk(keys, positions, step_size, inv_mass, 0)
        take = min(chunk_size, num_samples - drawn)
        samples.append(np.asarray(xs[:, :take, :]))
        drawn += take
        _save(
            ckpt_path,
            {
                "positions": np.asarray(positions),
                "step_size": np.asarray(step_size),
                "inv_mass": np.asarray(inv_mass),
                "keys": np.asarray(keys),
                "drawn": drawn,
                "samples": np.concatenate(samples, axis=1),
            },
        )
    all_samples = np.concatenate(samples, axis=1)[:, :num_samples, :]
    return all_samples, {
        "step_size": step_size,
        "inv_mass": inv_mass,
        "positions": positions,
    }
