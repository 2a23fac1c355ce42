"""ADVI: mean-field Gaussian variational inference on unconstrained
hyperparameters (required by BASELINE.json; absent in the reference).
Reparameterized ELBO with optax, multi-sample gradient estimator."""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["run_advi", "ADVIResult"]


class ADVIResult(NamedTuple):
    mean: Any  # (dim,) variational mean (unconstrained)
    log_std: Any  # (dim,)
    elbo_trace: Any  # (num_steps,)

    def sample(self, key, num_samples: int):
        eps = jax.random.normal(key, (num_samples, self.mean.shape[0]), self.mean.dtype)
        return self.mean + eps * jnp.exp(self.log_std)


def run_advi(
    logdensity_fn: Callable,
    key,
    init_position,
    num_steps: int = 2000,
    num_elbo_samples: int = 8,
    learning_rate: float = 1e-2,
    mesh=None,
    sample_axis: str | None = None,
    dispatch_chunk: int | None = None,
) -> ADVIResult:
    """With ``mesh``, the multi-sample ELBO estimator is sharded over
    ``sample_axis`` (default: the mesh's first axis): each device evaluates
    its shard of the `num_elbo_samples` logdensity draws and the mean/grad
    reductions become `psum` collectives.

    ``dispatch_chunk=k`` splits the optimization into host-level jit calls
    of at most k Adam steps each (same bounded-dispatch discipline as
    `run_nuts`): a single scan over `num_steps` ELBO gradients can run for
    minutes on-device, and remote-attached TPUs kill long dispatches."""
    init_position = jnp.asarray(init_position)
    dim = init_position.shape[0]
    params = {
        "mean": init_position,
        "log_std": jnp.full((dim,), -1.0, init_position.dtype),
    }
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis = sample_axis or mesh.axis_names[0]
        if num_elbo_samples % mesh.shape[axis] != 0:
            raise ValueError(
                f"num_elbo_samples {num_elbo_samples} not divisible by mesh "
                f"axis '{axis}' ({mesh.shape[axis]})"
            )
        _eps_sharding = NamedSharding(mesh, PartitionSpec(axis, None))
    else:
        _eps_sharding = None

    def neg_elbo(params, key):
        eps = jax.random.normal(key, (num_elbo_samples, dim), init_position.dtype)
        if _eps_sharding is not None:
            eps = jax.lax.with_sharding_constraint(eps, _eps_sharding)
        z = params["mean"] + eps * jnp.exp(params["log_std"])
        lps = jax.vmap(logdensity_fn)(z)
        entropy = jnp.sum(params["log_std"]) + 0.5 * dim * (1.0 + jnp.log(2 * jnp.pi))
        return -(jnp.mean(lps) + entropy)

    def step(carry, key):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(neg_elbo)(params, key)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), -loss

    keys = jax.random.split(key, num_steps)
    if dispatch_chunk is not None:
        from ..hoist import hoist_jit

        chunk_fn = hoist_jit(lambda c, ks: jax.lax.scan(step, c, ks))
        carry = (params, opt_state)
        elbo_chunks = []
        # all full-size chunks share one compiled program; a ragged tail
        # chunk compiles once more
        for lo in range(0, num_steps, dispatch_chunk):
            hi = min(lo + dispatch_chunk, num_steps)
            ks = keys[lo:hi]
            carry, elbos = chunk_fn(carry, ks)
            elbo_chunks.append(elbos)
        params, _ = carry
        return ADVIResult(
            params["mean"], params["log_std"], jnp.concatenate(elbo_chunks)
        )
    (params, _), elbos = jax.lax.scan(step, (params, opt_state), keys)
    return ADVIResult(params["mean"], params["log_std"], elbos)
