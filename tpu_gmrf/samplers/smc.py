"""Adaptive tempered Sequential Monte Carlo.

Required by BASELINE.json (absent in the reference). Tempering
p_λ ∝ prior·likᵏ with the next λ chosen by ESS bisection, systematic
resampling, and HMC move steps. Particles vmap on-device; with a mesh the
resampling uses globally gathered weights (the `all_gather` + categorical
pattern from SURVEY §5) — here expressed through jit over sharded arrays so
XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from .hmc import hmc_init, hmc_kernel

__all__ = ["run_smc", "SMCResult"]


class SMCResult(NamedTuple):
    particles: Any  # (num_particles, dim)
    log_evidence: Any  # scalar estimate of log Z
    num_stages: Any
    lambdas: Any  # (max_stages,) tempering schedule (padded with 1s)


def _systematic_resample(key, log_weights, n):
    w = jax.nn.softmax(log_weights)
    cum = jnp.cumsum(w)
    u = (jax.random.uniform(key) + jnp.arange(n)) / n
    return jnp.searchsorted(cum, u)


def _ess(log_weights):
    lw = log_weights - jax.scipy.special.logsumexp(log_weights)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw))


def run_smc(
    log_prior_fn: Callable,
    log_lik_fn: Callable,
    key,
    init_particles,
    num_move_steps: int = 3,
    hmc_num_steps: int = 16,
    step_size: float = 0.1,
    target_ess: float = 0.5,
    max_stages: int = 50,
    mesh=None,
    particle_axis: str | None = None,
    dispatch_chunk: int | None = None,
) -> SMCResult:
    """Temper from prior to posterior: π_λ ∝ exp(log_prior + λ·log_lik).

    With ``mesh``, particles are sharded over ``particle_axis`` (default: the
    mesh's first axis name); the per-particle likelihood/move work runs SPMD
    and the ESS/normalization/resampling reductions become XLA collectives
    (`psum`/`all_gather`) over ICI — the gathered-weight systematic
    resampling of SURVEY §5.

    ``dispatch_chunk`` (any non-None value) bounds each device dispatch to a
    single tempering stage: the stage loop moves to the host (one jitted
    stage per dispatch, λ read back between stages) instead of one
    `while_loop` covering up to ``max_stages`` stages. Same bounded-dispatch
    discipline as `run_nuts(dispatch_chunk=...)` — a whole-run dispatch can
    execute for minutes and remote-attached TPUs kill long dispatches. The
    per-stage work (num_move_steps x hmc_num_steps leapfrogs over the
    particle batch) is the dispatch unit; math is identical either way."""
    particles = jnp.atleast_2d(jnp.asarray(init_particles))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis = particle_axis or mesh.axis_names[0]
        if particles.shape[0] % mesh.shape[axis] != 0:
            raise ValueError(
                f"num_particles {particles.shape[0]} not divisible by mesh axis "
                f"'{axis}' ({mesh.shape[axis]})"
            )
        particles = jax.device_put(
            particles, NamedSharding(mesh, PartitionSpec(axis, None))
        )
    n, dim = particles.shape
    dtype = particles.dtype

    def find_next_lambda(lam, loglik_vals):
        """Largest δ ∈ (0, 1−λ] with ESS(δ·loglik) ≥ target — bisection."""

        def ess_frac(delta):
            return _ess(delta * loglik_vals) / n

        def body(_, bounds):
            lo, hi = bounds
            mid = 0.5 * (lo + hi)
            ok = ess_frac(mid) >= target_ess
            return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

        full = 1.0 - lam
        ok_full = ess_frac(full) >= target_ess
        lo, hi = jax.lax.fori_loop(
            0, 26, body, (jnp.zeros((), dtype), full)
        )
        delta = jnp.where(ok_full, full, lo)
        return lam + delta, delta

    def stage(carry):
        key, particles, lam, logZ, stage_idx, lambdas = carry
        key, k_lam, k_res, k_move = jax.random.split(key, 4)
        loglik_vals = jax.vmap(log_lik_fn)(particles)
        new_lam, delta = find_next_lambda(lam, loglik_vals)
        log_w = delta * loglik_vals
        logZ = logZ + jax.scipy.special.logsumexp(log_w) - jnp.log(n * 1.0)
        idx = _systematic_resample(k_res, log_w, n)
        particles = particles[idx]

        # HMC moves at temperature new_lam
        def tempered_ld(z):
            return log_prior_fn(z) + new_lam * log_lik_fn(z)

        kernel = hmc_kernel(tempered_ld, num_steps=hmc_num_steps)
        inv_mass = jnp.ones(dim, dtype)

        def move(particle, key):
            state = hmc_init(tempered_ld, particle)

            def one(state, k):
                state, _ = kernel(k, state, step_size, inv_mass)
                return state, None

            state, _ = jax.lax.scan(one, state, jax.random.split(key, num_move_steps))
            return state.position

        move_keys = jax.random.split(k_move, n)
        particles = jax.vmap(move)(particles, move_keys)
        lambdas = lambdas.at[stage_idx].set(new_lam)
        return key, particles, new_lam, logZ, stage_idx + 1, lambdas

    def cond(carry):
        _, _, lam, _, stage_idx, _ = carry
        return (lam < 1.0) & (stage_idx < max_stages)

    lambdas = jnp.ones((max_stages,), dtype)
    carry = (
        key,
        particles,
        jnp.zeros((), dtype),
        jnp.zeros((), dtype),
        jnp.asarray(0),
        lambdas,
    )
    if dispatch_chunk is not None:
        from ..hoist import hoist_jit

        stage_jit = hoist_jit(stage)
        while True:
            lam_host = float(carry[2])
            n_stages = int(carry[4])
            if lam_host >= 1.0 or n_stages >= max_stages:
                break
            carry = stage_jit(carry)
        _, particles, lam, logZ, stages, lambdas = carry
        return SMCResult(particles, logZ, stages, lambdas)
    _, particles, lam, logZ, stages, lambdas = jax.lax.while_loop(cond, stage, carry)
    return SMCResult(particles, logZ, stages, lambdas)
