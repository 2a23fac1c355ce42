"""Warmup adaptation: Nesterov dual-averaging step size (Hoffman & Gelman
2014, Stan defaults) and Welford diagonal mass-matrix estimation with
Stan-style three-phase windows (fast / expanding-slow / fast)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = ["DualAveragingState", "da_init", "da_update", "WelfordState", "welford_init", "welford_update", "welford_variance", "warmup_schedule"]


class DualAveragingState(NamedTuple):
    log_step: Any
    log_step_avg: Any
    avg_error: Any
    mu: Any
    count: Any


def da_init(initial_step_size):
    ls = jnp.log(initial_step_size)
    return DualAveragingState(
        log_step=ls,
        log_step_avg=jnp.zeros_like(ls),
        avg_error=jnp.zeros_like(ls),
        mu=jnp.log(10.0) + ls,
        count=jnp.zeros_like(ls),
    )


def da_update(state: DualAveragingState, accept_prob, target=0.8, gamma=0.05, t0=10.0, kappa=0.75):
    count = state.count + 1.0
    error = target - accept_prob
    avg_error = state.avg_error + (error - state.avg_error) / (count + t0)
    log_step = state.mu - avg_error * jnp.sqrt(count) / gamma
    eta = count ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, avg_error, state.mu, count)


class WelfordState(NamedTuple):
    mean: Any
    m2: Any
    count: Any


def welford_init(dim, dtype=jnp.float32):
    return WelfordState(jnp.zeros(dim, dtype), jnp.zeros(dim, dtype), jnp.zeros((), dtype))


def welford_update(state: WelfordState, x):
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean, m2, count)


def welford_variance(state: WelfordState, regularize=True):
    var = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    if regularize:
        # Stan's shrinkage toward unit metric
        n = state.count
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var


def warmup_schedule(num_warmup: int, init_buffer=75, term_buffer=50, base_window=25):
    """Stan's warmup windows. Returns (is_slow (bool[num_warmup]),
    window_end (bool[num_warmup]) — True at the last step of each slow
    window where the mass matrix is refreshed)."""
    if num_warmup < init_buffer + term_buffer + base_window:
        # degenerate: single slow window in the middle
        init_buffer = max(1, int(0.15 * num_warmup))
        term_buffer = max(1, int(0.1 * num_warmup))
    is_slow = np.zeros(num_warmup, bool)
    window_end = np.zeros(num_warmup, bool)
    start = init_buffer
    end_slow = num_warmup - term_buffer
    is_slow[start:end_slow] = True
    w = base_window
    pos = start
    while pos < end_slow:
        win_end = min(pos + w, end_slow)
        # expand final window to absorb the remainder
        if win_end + 2 * w > end_slow:
            win_end = end_slow
        window_end[win_end - 1] = True
        pos = win_end
        w *= 2
    return jnp.asarray(is_slow), jnp.asarray(window_end)
