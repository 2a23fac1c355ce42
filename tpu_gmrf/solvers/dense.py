"""Dense Cholesky factorization backend.

TPU-native rationale: for n up to a few thousand, a dense (optionally
batched/vmapped) Cholesky on the MXU beats any sparse scalar recursion by
orders of magnitude — batched `jnp.linalg.cholesky` over 64 NUTS chains is
one fat MXU workload. This backend therefore replaces the reference's
CHOLMOD path (reference: src/workspace/backend.jl:50-102) for
moderate-dimension models; large meshes use the banded/supernodal backends.

Fully differentiable through JAX's builtin cholesky/triangular-solve rules.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..sparse.matrix import SparseMatrix
from ..sparse.pattern import SparsePattern

__all__ = ["DenseFactor", "dense_factorize"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseFactor:
    """Lower Cholesky factor L with Q = L Lᵀ."""

    L: Any  # (n, n)

    @property
    def n(self):
        return self.L.shape[-1]

    def solve(self, b: jnp.ndarray) -> jnp.ndarray:
        y = jsl.solve_triangular(self.L, b, lower=True)
        return jsl.solve_triangular(self.L, y, lower=True, trans=1)

    def forward_solve(self, b: jnp.ndarray) -> jnp.ndarray:
        """L x = b (whitening of residuals)."""
        return jsl.solve_triangular(self.L, b, lower=True)

    def backward_solve(self, z: jnp.ndarray) -> jnp.ndarray:
        """Lᵀ x = z — maps N(0, I) noise to N(0, Q⁻¹) samples
        (reference: src/solvers/backward_solve.jl:35)."""
        return jsl.solve_triangular(self.L, z, lower=True, trans=1)

    def sqrt_matvec(self, z: jnp.ndarray) -> jnp.ndarray:
        """L z — maps N(0, I) to N(0, Q)."""
        return self.L @ z

    def logdet(self) -> jnp.ndarray:
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(self.L, axis1=-2, axis2=-1)), axis=-1)

    def _inv(self) -> jnp.ndarray:
        Linv = jsl.solve_triangular(
            self.L, jnp.eye(self.n, dtype=self.L.dtype), lower=True
        )
        return Linv.T @ Linv

    def selinv_diag(self) -> jnp.ndarray:
        Linv = jsl.solve_triangular(
            self.L, jnp.eye(self.n, dtype=self.L.dtype), lower=True
        )
        return jnp.sum(Linv * Linv, axis=0)

    def selinv(self, pattern: SparsePattern) -> SparseMatrix:
        """Entries of Q⁻¹ on `pattern` (used for ∂logdet(Q)/∂Q)."""
        Z = self._inv()
        return SparseMatrix(Z[pattern.rows, pattern.cols], pattern)

    def selinv_dot(self, other: SparseMatrix) -> jnp.ndarray:
        """tr(Q⁻¹ · B) for B on any pattern (reference selinv_dot,
        src/workspace/backend.jl:112-177)."""
        Z = self._inv()
        return jnp.sum(Z[other.pattern.rows, other.pattern.cols] * other.data, axis=-1)


def dense_factorize(Q: SparseMatrix | jnp.ndarray) -> DenseFactor:
    A = Q.todense() if isinstance(Q, SparseMatrix) else Q
    return DenseFactor(jnp.linalg.cholesky(A))
