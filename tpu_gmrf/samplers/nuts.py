"""No-U-Turn Sampler — iterative, multinomial, Stan-style generalized
U-turn criterion, fully expressed with `lax.while_loop` (no recursion, no
dynamic shapes) so it jit-compiles and vmaps across chains on TPU.

Design notes (TPU-native):
- the doubling loop and the per-leaf loop are nested `while_loop`s;
- sub-U-turn checks use an O(max_depth) checkpoint stack: when leaf i opens
  a level-j subtree (i mod 2ʲ = 0) its momentum and the pre-subtree prefix
  momentum-sum are stored at slot j; when leaf i closes one ((i+1) mod 2ʲ=0)
  the segment sum S_i − ckpt_S[j] is checked against the segment's end
  velocities. All slot updates are masked vector ops — no data-dependent
  indexing beyond fixed-size gathers.
- multinomial sampling within subtrees, biased progressive sampling across
  doublings (Betancourt 2017).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from .hmc import HMCState, hmc_init, leapfrog

__all__ = ["nuts_kernel", "NUTSInfo"]

_DIVERGENCE_THRESHOLD = 1000.0


class NUTSInfo(NamedTuple):
    accept_prob: Any
    num_leaves: Any
    depth: Any
    diverging: Any
    energy: Any


def _uturn(v_left, v_right, rho):
    return (jnp.dot(v_left, rho) <= 0) | (jnp.dot(v_right, rho) <= 0)


def nuts_kernel(logdensity_fn: Callable, max_depth: int = 10):
    """Returns step(key, state, step_size, inv_mass) -> (state, NUTSInfo)."""

    def build_subtree(key, z0, r0, ld0, grad0, depth, direction, h0, step_size, inv_mass):
        """Build 2^depth leaves from (z0, r0) in `direction`; returns
        (end state, proposal, log_weight, rho, sum_alpha, n_alpha, stop)."""
        num_leaves = 2**depth
        dim = z0.shape[0]
        eps = direction * step_size

        ckpt_r = jnp.zeros((max_depth + 1, dim), z0.dtype)
        ckpt_S = jnp.zeros((max_depth + 1, dim), z0.dtype)
        levels = jnp.arange(max_depth + 1)

        def cond(carry):
            i = carry[0]
            stop = carry[-1]
            return (i < num_leaves) & (~stop)

        def body(carry):
            (i, key, z, r, ld, grad, prop, rho, logW, sum_alpha, ckpt_r, ckpt_S, div, stop) = carry
            key, key_prop = jax.random.split(key)
            z, r, ld, grad = leapfrog(logdensity_fn, z, r, grad, eps, inv_mass)
            h = -ld + 0.5 * jnp.sum(r * inv_mass * r)
            delta = h - h0  # positive = worse
            # NaN-safe: a NaN energy (failed factorization at extreme θ) is a
            # divergence, not a silent weight contribution
            diverged = ~(delta <= _DIVERGENCE_THRESHOLD)
            w = jnp.where(diverged, -jnp.inf, -delta)  # log weight of leaf
            sum_alpha = sum_alpha + jnp.where(
                diverged, 0.0, jnp.minimum(1.0, jnp.exp(-delta))
            )

            # multinomial within subtree
            new_logW = jnp.logaddexp(logW, w)
            take = jnp.log(jax.random.uniform(key_prop)) < (w - new_logW)
            prop = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, b, a), prop, (z, ld, grad)
            )

            # open checkpoints (before adding r to rho): levels j with i % 2^j == 0
            opens = (jnp.mod(i, 2**levels) == 0) & (levels >= 1)
            ckpt_r = jnp.where(opens[:, None], r[None, :], ckpt_r)
            ckpt_S = jnp.where(opens[:, None], rho[None, :], ckpt_S)

            rho = rho + r

            # close checkpoints: levels j with (i+1) % 2^j == 0 and 2^j <= i+1
            closes = (jnp.mod(i + 1, 2**levels) == 0) & (levels >= 1) & (
                2**levels <= i + 1
            )
            seg = rho[None, :] - ckpt_S  # (L, dim)
            v_start = ckpt_r * inv_mass[None, :]
            v_end = (r * inv_mass)[None, :]
            turn_j = (jnp.sum(v_start * seg, axis=1) <= 0) | (
                jnp.sum(v_end * seg, axis=1) <= 0
            )
            turning = jnp.any(turn_j & closes)

            stop = diverged | turning
            return (i + 1, key, z, r, ld, grad, prop, rho, new_logW, sum_alpha, ckpt_r, ckpt_S, div | diverged, stop)

        init = (
            jnp.asarray(0),
            key,
            z0,
            r0,
            ld0,
            grad0,
            (z0, ld0, grad0),  # placeholder proposal, overwritten by first leaf
            jnp.zeros(dim, z0.dtype),
            jnp.asarray(-jnp.inf, z0.dtype),
            jnp.zeros((), z0.dtype),
            ckpt_r,
            ckpt_S,
            jnp.asarray(False),
            jnp.asarray(False),
        )
        (i, _, z, r, ld, grad, prop, rho, logW, sum_alpha, _, _, div, stop) = jax.lax.while_loop(
            cond, body, init
        )
        return z, r, ld, grad, prop, rho, logW, sum_alpha, i, div, stop

    def step(key, state: HMCState, step_size, inv_mass):
        key_mom, key_tree = jax.random.split(key)
        dim = state.position.shape[0]
        r0 = jax.random.normal(key_mom, (dim,), state.position.dtype) * jnp.sqrt(
            1.0 / inv_mass
        )
        h0 = -state.logdensity + 0.5 * jnp.sum(r0 * inv_mass * r0)

        def cond(carry):
            depth = carry[0]
            stop = carry[-1]
            return (depth < max_depth) & (~stop)

        def body(carry):
            (depth, key, left, right, prop, rho, logW, sum_alpha, n_alpha, div, stop) = carry
            key, key_dir, key_sub, key_acc = jax.random.split(key, 4)
            go_right = jax.random.bernoulli(key_dir)
            direction = jnp.where(go_right, 1.0, -1.0).astype(state.position.dtype)
            start = jax.tree_util.tree_map(
                lambda a, b: jnp.where(go_right, b, a), left, right
            )
            (z, r, ld, grad, sub_prop, sub_rho, sub_logW, sub_alpha, sub_n, sub_div, sub_stop) = build_subtree(
                key_sub, *start, depth, direction, h0, step_size, inv_mass
            )
            new_end = (z, r, ld, grad)
            left = jax.tree_util.tree_map(
                lambda a, b: jnp.where(go_right, a, b), left, new_end
            )
            right = jax.tree_util.tree_map(
                lambda a, b: jnp.where(go_right, b, a), right, new_end
            )
            # biased progressive sampling across doublings
            take = jnp.log(jax.random.uniform(key_acc)) < (sub_logW - logW)
            take = take & (~sub_stop)
            prop = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, b, a), prop, sub_prop
            )
            rho = rho + sub_rho
            logW = jnp.logaddexp(logW, jnp.where(sub_stop, -jnp.inf, sub_logW))
            sum_alpha = sum_alpha + sub_alpha
            n_alpha = n_alpha + sub_n
            v_l = left[1] * inv_mass
            v_r = right[1] * inv_mass
            turning = _uturn(v_l, v_r, rho)
            stop = sub_stop | turning
            return (depth + 1, key, left, right, prop, rho, logW, sum_alpha, n_alpha, div | sub_div, stop)

        end0 = (state.position, r0, state.logdensity, state.grad)
        init = (
            jnp.asarray(0),
            key_tree,
            end0,
            end0,
            (state.position, state.logdensity, state.grad),
            r0,
            jnp.zeros((), state.position.dtype),  # logW of initial point = 0
            jnp.zeros((), state.position.dtype),
            jnp.asarray(0),
            jnp.asarray(False),
            jnp.asarray(False),
        )
        (depth, _, _, _, prop, _, _, sum_alpha, n_alpha, div, _) = jax.lax.while_loop(
            cond, body, init
        )
        z, ld, grad = prop
        new_state = HMCState(z, ld, grad)
        accept_prob = sum_alpha / jnp.maximum(n_alpha, 1)
        info = NUTSInfo(
            accept_prob=accept_prob,
            num_leaves=n_alpha,
            depth=depth,
            diverging=div,
            energy=-ld,
        )
        return new_state, info

    return step
