"""Tridiagonal Cholesky backend (AR1 / RW1 precisions).

Bidiagonal Cholesky, solves, and the Takahashi selected-inverse recursion
as `lax.scan`s — O(n) work, O(n) memory, no dense materialization. The
reference handles this case via LDLt on `SymTridiagonal`
(reference: src/utils/linsolve_utils.jl storage-type resolution;
src/latent_models/ar.jl:7-8).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.matrix import SparseMatrix
from ..sparse.pattern import SparsePattern

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
        """L y = b."""
        e = jnp.concatenate([jnp.zeros((1,), self.d.dtype), self.e])

        def step(y_prev, inp):
            bi, di, ei = inp
            yi = (bi - ei * y_prev) / di
            return yi, yi

        _, y = jax.lax.scan(step, jnp.zeros(b.shape[1:], b.dtype), (b, self.d, e))
        return y

    def backward_solve(self, z: jnp.ndarray) -> jnp.ndarray:
        """Lᵀ x = z."""
        e = self._e_pad()

        def step(x_next, inp):
            zi, di, ei = inp
            xi = (zi - ei * x_next) / di
            return xi, xi

        _, x = jax.lax.scan(
            step, jnp.zeros(z.shape[1:], z.dtype), (z, self.d, e), reverse=True
        )
        return x

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

        def step(z_next, inp):
            dj, rj = inp
            zoff = -rj * z_next
            zj = 1.0 / dj**2 + rj * rj * z_next
            return zj, (zj, zoff)

        z_last = 1.0 / self.d[-1] ** 2
        _, (zdiag, zoff) = jax.lax.scan(
            step, z_last, (self.d[:-1], r), reverse=True
        )
        zdiag = jnp.concatenate([zdiag, z_last[None]])
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

    # d_0 = sqrt(a_0); e_i = c_i / d_i; d_{i+1} = sqrt(a_{i+1} - e_i²)
    def chol_step(d_prev, inp):
        ai, ci_prev = inp
        ei = ci_prev / d_prev
        di = jnp.sqrt(ai - ei * ei)
        return di, (di, ei)

    d0 = jnp.sqrt(a[0])
    _, (d_rest, e) = jax.lax.scan(chol_step, d0, (a[1:], c))
    d = jnp.concatenate([d0[None], d_rest])
    return TridiagFactor(d, e)
