"""Hard linear equality constraints via conditioning-by-Kriging.

`ConstrainedGMRF` represents x | Ax = e for x ~ N(μ, Q⁻¹), with the
Rue & Held (2005, §2.3.3) density correction. TPU-native re-design of
reference src/arithmetic/constrained.jl:61-243: all precomputations
(Ã^T = Q⁻¹Aᵀ, L_c = chol(AÃᵀ), constrained mean, log correction) happen at
construction inside the same jitted graph, so they amortize across
logpdf/sample/var calls and differentiate through by ordinary JAX AD
(no special Dual handling needed — autodiff flows through the solves).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .gmrf import GMRF, _LOG2PI

__all__ = ["ConstrainedGMRF"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ConstrainedGMRF:
    """x | Ax = e for x ~ base. Degenerate on the constraint manifold."""

    base: GMRF
    A: Any  # (m, n) dense constraint matrix
    e: Any  # (m,)
    A_tilde_T: Any  # (n, m) = Q⁻¹Aᵀ
    L_c: Any  # (m, m) lower Cholesky of A Q⁻¹ Aᵀ
    constrained_mean: Any  # (n,)
    log_correction: Any  # scalar

    @staticmethod
    def create(base: GMRF, A, e) -> "ConstrainedGMRF":
        A = jnp.atleast_2d(jnp.asarray(A, dtype=base.dtype))
        e = jnp.asarray(e, dtype=base.dtype)
        m, n = A.shape
        if n != base.n or e.shape != (m,):
            raise ValueError(f"constraint shapes A{A.shape}, e{e.shape} incompatible with n={base.n}")
        A_tilde_T = base.factor.solve(A.T)  # (n, m)
        AAt = A @ A_tilde_T  # (m, m), SPD
        L_c = jnp.linalg.cholesky(AAt)
        mu = base.mean
        resid = A @ mu - e
        correction = A_tilde_T @ jsl.cho_solve((L_c, True), resid)
        mean_c = mu - correction
        # Rue-Held §2.3.3: ½(m·log2π + logdet(AQ⁻¹Aᵀ) + residᵀ(AQ⁻¹Aᵀ)⁻¹resid)
        #                  − ½ logdet(AAᵀ)
        logdet_Lc = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L_c)))
        quad = resid @ jsl.cho_solve((L_c, True), resid)
        gram = A @ A.T
        logdet_gram = 2.0 * jnp.sum(jnp.log(jnp.diagonal(jnp.linalg.cholesky(gram))))
        log_corr = 0.5 * (m * _LOG2PI + logdet_Lc + quad) - 0.5 * logdet_gram
        return ConstrainedGMRF(base, A, e, A_tilde_T, L_c, mean_c, log_corr)

    # ---- distribution interface -------------------------------------------

    def __len__(self):
        return self.base.n

    @property
    def n(self):
        return self.base.n

    @property
    def mean(self):
        return self.constrained_mean

    @property
    def Q(self):
        """Precision of the *unconstrained* base (reference convention:
        src/arithmetic/constrained.jl `precision_map`)."""
        return self.base.Q

    @property
    def factor(self):
        return self.base.factor

    @property
    def n_constraints(self):
        return self.A.shape[0]

    def precision_matrix(self):
        return self.base.Q

    def logpdf(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.base.logpdf(x) + self.log_correction

    def gradlogpdf(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.base.gradlogpdf(x)

    def project(self, x: jnp.ndarray) -> jnp.ndarray:
        """Kriging projection of any point onto the constraint manifold."""
        resid = self.A @ x - self.e if x.ndim == 1 else x @ self.A.T - self.e
        corr = jsl.cho_solve((self.L_c, True), resid.T if x.ndim > 1 else resid)
        return x - (self.A_tilde_T @ corr).T if x.ndim > 1 else x - self.A_tilde_T @ corr

    def sample(self, key, shape: tuple = ()) -> jnp.ndarray:
        x = self.base.sample(key, shape)
        return self.project(x)

    def var(self) -> jnp.ndarray:
        """σ_c = σ_base − rowsums(B²), B = Ã^T L_c⁻ᵀ
        (reference src/arithmetic/constrained.jl:195-215)."""
        sigma = self.base.var()
        B_T = jsl.solve_triangular(self.L_c, self.A_tilde_T.T, lower=True)  # (m, n)
        corr = jnp.sum(B_T * B_T, axis=0)
        return jnp.maximum(sigma - corr, 0.0)

    def std(self) -> jnp.ndarray:
        return jnp.sqrt(self.var())

    def logdet_precision(self):
        return self.base.logdet_precision()

    def sqmahal(self, x):
        return self.base.sqmahal(x)
