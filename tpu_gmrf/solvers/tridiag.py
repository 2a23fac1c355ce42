"""Tridiagonal Cholesky backend (AR1 / RW1 precisions).

Bidiagonal Cholesky, solves, and the Takahashi selected-inverse recursion
— O(n) work, O(n) memory, no dense materialization. The reference handles
this case via sequential LDLt on `SymTridiagonal`
(reference: src/utils/linsolve_utils.jl storage-type resolution;
src/latent_models/ar.jl:7-8). Here every recurrence is solved by parallel
prefix (`associative_scan`, solvers/prefix.py): O(log n) depth instead of
n sequential steps, which is the TPU-native formulation — the recurrences
are latency-bound on the VPU otherwise.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.matrix import SparseMatrix
from ..sparse.pattern import SparsePattern
from .prefix import linear_recurrence, mobius_recurrence

__all__ = ["TridiagFactor", "tridiag_factorize"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TridiagFactor:
    """Q = L Lᵀ with L lower bidiagonal: diag d (n,), subdiag e (n-1,)."""

    d: Any
    e: Any

    @property
    def n(self):
        return self.d.shape[-1]

    def _e_pad(self):
        return jnp.concatenate([self.e, jnp.zeros((1,), self.d.dtype)])

    def forward_solve(self, b: jnp.ndarray) -> jnp.ndarray:
        """L y = b, via parallel prefix on y_i = -(e_{i-1}/d_i) y_{i-1} + b_i/d_i."""
        e = jnp.concatenate([jnp.zeros((1,), self.d.dtype), self.e])
        dcol = self.d.reshape(self.d.shape + (1,) * (b.ndim - 1))
        alpha = -e / self.d
        return linear_recurrence(alpha, b / dcol)

    def backward_solve(self, z: jnp.ndarray) -> jnp.ndarray:
        """Lᵀ x = z, via reverse parallel prefix on x_i = -(e_i/d_i) x_{i+1} + z_i/d_i."""
        e = self._e_pad()
        dcol = self.d.reshape(self.d.shape + (1,) * (z.ndim - 1))
        alpha = -e / self.d
        return linear_recurrence(alpha, z / dcol, reverse=True)

    def solve(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.backward_solve(self.forward_solve(b))

    def sqrt_matvec(self, z: jnp.ndarray) -> jnp.ndarray:
        lower = self.e[..., :, None] * z[:-1] if z.ndim > 1 else self.e * z[:-1]
        main = self.d[..., :, None] * z if z.ndim > 1 else self.d * z
        pad = jnp.zeros_like(main[:1])
        return main + jnp.concatenate([pad, lower])

    def logdet(self) -> jnp.ndarray:
        return 2.0 * jnp.sum(jnp.log(self.d), axis=-1)

    def selinv_tridiag(self):
        """Takahashi recursion: returns (Zdiag (n,), Zoff (n-1,)) of Q⁻¹.

        Backward scan: Z[n-1,n-1] = 1/d²; Z[j,j] = 1/d_j² + (e_j/d_j)² Z[j+1,j+1];
        Z[j+1,j] = -(e_j/d_j) Z[j+1,j+1].
        """
        r = self.e / self.d[:-1]  # (n-1,)
        # z_j = r_j² z_{j+1} + 1/d_j², reverse recurrence (r_{n-1} := 0).
        alpha = jnp.concatenate([r * r, jnp.zeros((1,), self.d.dtype)])
        zdiag = linear_recurrence(alpha, 1.0 / (self.d * self.d), reverse=True)
        zoff = -r * zdiag[1:]
        return zdiag, zoff

    def selinv_diag(self) -> jnp.ndarray:
        return self.selinv_tridiag()[0]

    def selinv(self, pattern: SparsePattern) -> SparseMatrix:
        zdiag, zoff = self.selinv_tridiag()
        off = pattern.rows.astype(np.int64) - pattern.cols
        if np.any(np.abs(off) > 1):
            raise ValueError("tridiag selinv only supports tridiagonal patterns")
        idx = np.minimum(pattern.rows, pattern.cols)
        vals = jnp.where(
            jnp.asarray(off == 0), zdiag[pattern.rows], zoff[np.minimum(idx, zoff.shape[0] - 1)]
        )
        return SparseMatrix(vals, pattern)

    def selinv_dot(self, other: SparseMatrix) -> jnp.ndarray:
        z = self.selinv(other.pattern)
        return jnp.sum(z.data * other.data, axis=-1)


def tridiag_factorize(Q: SparseMatrix) -> TridiagFactor:
    # Average with the transpose so gradient sensitivity splits evenly over
    # both stored triangle entries (matching the dense backend's convention).
    if Q.pattern.is_symmetric:
        Q = Q.symmetrize()
    pat = Q.pattern
    n = pat.shape[0]
    a = Q.data[pat.diag_positions]
    # subdiagonal entries Q[i+1, i]
    sub_mask = (pat.rows == pat.cols + 1)
    sub_pos = np.full(n - 1, -1, dtype=np.int64)
    sub_pos[pat.cols[sub_mask]] = np.nonzero(sub_mask)[0]
    if np.any(sub_pos < 0):
        c = jnp.zeros(n - 1, Q.data.dtype)
        present = sub_pos >= 0
        c = c.at[np.nonzero(present)[0]].set(Q.data[sub_pos[present]])
    else:
        c = Q.data[sub_pos]

    # LDL pivots δ_k = a_k − c_{k-1}²/δ_{k-1}: a continued fraction, i.e. a
    # Möbius transform δ_k = (a_k δ_{k-1} − c_{k-1}²)/(1·δ_{k-1} + 0) —
    # composed in O(log n) stages by normalized 2x2 products (prefix.py).
    ones = jnp.ones_like(c)
    delta_rest = mobius_recurrence(a[1:], -c * c, ones, jnp.zeros_like(c), a[0], 1.0)
    delta = jnp.concatenate([a[:1], delta_rest])
    d = jnp.sqrt(delta)
    e = c / d[:-1]
    return TridiagFactor(d, e)
