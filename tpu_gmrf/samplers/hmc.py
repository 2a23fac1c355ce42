"""Hamiltonian Monte Carlo: leapfrog integrator and fixed-length HMC kernel.

Native sampler layer (absent in the reference, which delegates to Turing.jl
— docs/src/literate-tutorials/autodiff_mcmc.jl:77-105; required by
BASELINE.json). Everything is pure JAX over flat position vectors: kernels
vmap over chains and shard_map over device meshes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["HMCState", "hmc_init", "hmc_kernel", "leapfrog"]


class HMCState(NamedTuple):
    position: Any  # (d,)
    logdensity: Any  # scalar
    grad: Any  # (d,)


def hmc_init(logdensity_fn: Callable, position) -> HMCState:
    ld, grad = jax.value_and_grad(logdensity_fn)(position)
    return HMCState(position, ld, grad)


def leapfrog(logdensity_fn, z, r, grad, step_size, inv_mass):
    """One leapfrog step for H(z, r) = -logp(z) + ½ rᵀ M⁻¹ r."""
    r_half = r + 0.5 * step_size * grad
    z_new = z + step_size * inv_mass * r_half
    ld_new, grad_new = jax.value_and_grad(logdensity_fn)(z_new)
    r_new = r_half + 0.5 * step_size * grad_new
    return z_new, r_new, ld_new, grad_new


def _kinetic(r, inv_mass):
    return 0.5 * jnp.sum(r * inv_mass * r)


def hmc_kernel(
    logdensity_fn: Callable,
    num_steps: int = 32,
):
    """Returns step(key, state, step_size, inv_mass) -> (state, info)."""

    def step(key, state: HMCState, step_size, inv_mass):
        key_mom, key_acc = jax.random.split(key)
        r0 = jax.random.normal(key_mom, state.position.shape, state.position.dtype) * jnp.sqrt(
            1.0 / inv_mass
        )
        h0 = -state.logdensity + _kinetic(r0, inv_mass)

        def body(_, carry):
            z, r, ld, grad = carry
            z, r, ld, grad = leapfrog(logdensity_fn, z, r, grad, step_size, inv_mass)
            return z, r, ld, grad

        z, r, ld, grad = jax.lax.fori_loop(
            0, num_steps, body, (state.position, r0, state.logdensity, state.grad)
        )
        h1 = -ld + _kinetic(r, inv_mass)
        delta = h0 - h1
        # NaN-safe: failed evaluations reject with zero acceptance
        accept_prob = jnp.where(
            jnp.isnan(delta), 0.0, jnp.minimum(1.0, jnp.exp(delta))
        )
        accept = jax.random.uniform(key_acc) < accept_prob
        new_state = HMCState(
            jnp.where(accept, z, state.position),
            jnp.where(accept, ld, state.logdensity),
            jnp.where(accept, grad, state.grad),
        )
        info = {"accept_prob": accept_prob, "accepted": accept, "energy": h1}
        return new_state, info

    return step
