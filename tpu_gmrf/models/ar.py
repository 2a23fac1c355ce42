"""Stationary autoregressive latent models (PACF parameterization).

Reference spec: src/latent_models/ar.jl:20-240 — AR(P) via partial
autocorrelations with the Durbin-Levinson recursion, Q = τ·LᵀDL with unit
lower-triangular L of bandwidth P and stationary-initialization diagonal D.
Here the recursion is unrolled at trace time (P is static) and the banded
assembly is a fixed-pattern gather, so the whole θ ↦ Q map jits and
differentiates.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..sparse.matrix import SparseMatrix, sp_tridiag, spdiag
from ..sparse.pattern import SparsePattern
from .base import LatentModel, process_constraint

__all__ = ["ARModel", "AR1Model"]


def durbin_levinson(pacf):
    """PACF → AR coefficients; returns (phi, history) where history[k] is the
    AR(k+1) coefficient vector (needed for boundary rows)."""
    P = len(pacf)
    phi = [pacf[0]]
    history = [jnp.stack([pacf[0]])]
    for k in range(1, P):
        prev = phi
        phi = [prev[j] - pacf[k] * prev[k - 1 - j] for j in range(k)] + [pacf[k]]
        history.append(jnp.stack(phi))
    return jnp.stack(phi), history


class ARModel(LatentModel):
    """AR(P) of length n. Hyperparameters: P=1 → (tau, rho);
    P≥2 → (tau, pacf1..pacfP)."""

    def __init__(self, n: int, order: int = 1, constraint=None, solver=None):
        if order < 1:
            raise ValueError("AR order must be >= 1")
        if order >= 2 and n <= order:
            raise ValueError(f"AR{order} requires n > {order}")
        self._n = n
        self.order = order
        self.constraint = process_constraint(constraint, n)
        if solver is not None:
            self.solver = solver
        self.name = "ar1" if order == 1 else f"ar{order}"
        if order >= 2:
            self._pattern, self._L_pattern = self._build_patterns()

    @property
    def n(self):
        return self._n

    @property
    def hyperparameters(self):
        if self.order == 1:
            return ("tau", "rho")
        return ("tau",) + tuple(f"pacf{k}" for k in range(1, self.order + 1))

    def _build_patterns(self):
        n, P = self._n, self.order
        rows = [np.arange(n, dtype=np.int64)]
        cols = [np.arange(n, dtype=np.int64)]
        for k in range(1, P + 1):
            rows.append(np.arange(k, n, dtype=np.int64))
            cols.append(np.arange(0, n - k, dtype=np.int64))
        L_pat = SparsePattern(np.concatenate(rows), np.concatenate(cols), (n, n))
        return None, L_pat

    def precision(self, tau, rho=None, **pacf_kwargs) -> SparseMatrix:
        n, P = self._n, self.order
        tau = jnp.asarray(tau)
        if P == 1:
            rho = jnp.asarray(rho)
            interior = (1.0 + rho**2) * tau
            main = jnp.concatenate(
                [tau[None], jnp.full((n - 2,), 1.0) * interior, tau[None]]
            )
            off = jnp.full((n - 1,), 1.0) * (-rho * tau)
            return sp_tridiag(main, off)
        pacf = [jnp.asarray(pacf_kwargs[f"pacf{k}"]) for k in range(1, P + 1)]
        phi, history = durbin_levinson(pacf)
        # D[0] = Π(1-θ_k²), D[t] = Π_{k>t}(1-θ_k²) for t<P, else 1
        one_minus = jnp.stack([1.0 - p**2 for p in pacf])  # (P,)
        d_head = [jnp.prod(one_minus)]
        for t in range(1, P):
            d_head.append(jnp.prod(one_minus[t:]))
        D = jnp.concatenate([jnp.stack(d_head), jnp.ones(n - P, dtype=phi.dtype)])
        # L values in the build order of _build_patterns: diag ones, then band k
        vals = [jnp.ones(n, dtype=phi.dtype)]
        for k in range(1, P + 1):
            band = jnp.full((n - k,), 1.0) * (-phi[k - 1])
            # boundary rows t0 in [k, P-1] use AR(t0) coefficients
            for t0 in range(k, min(P, n)):
                band = band.at[t0 - k].set(-history[t0 - 1][k - 1])
            vals.append(band)
        L_data = jnp.concatenate(vals)[self._L_pattern.sort_order]
        L = SparseMatrix(L_data, self._L_pattern)
        Q = L.T @ (spdiag(D) @ L)
        return Q * tau

    def constraints(self):
        return self.constraint


def AR1Model(n: int, constraint=None, solver=None) -> ARModel:
    return ARModel(n, order=1, constraint=constraint, solver=solver)
