"""Rao-Blackwellized Monte Carlo marginal-variance estimators (Sidén 2018).

Reference spec: src/solvers/rbmc.jl — fallback variance path when selected
inversion is unavailable/too expensive:
  var_i ≈ 1/Q_ii + Var_s[ (Q_ii)⁻¹ · (Q x_s − Q_ii x_s)_i ]
with centered posterior samples x_s. TPU-native: the samples are one batched
backward-solve; the Rao-Blackwellization is a sparse matvec batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rbmc_var"]


def rbmc_var(gmrf, key, n_samples: int = 1000) -> jnp.ndarray:
    Q = gmrf.Q
    D = Q.diagonal()
    Dinv = 1.0 / D
    xs = gmrf.sample(key, (n_samples,)) - gmrf.mean  # (S, n)
    Qx = jax.vmap(Q.matvec)(xs)  # (S, n)
    transformed = Dinv * (Qx - D * xs)
    return Dinv + jnp.var(transformed, axis=0, ddof=1)
