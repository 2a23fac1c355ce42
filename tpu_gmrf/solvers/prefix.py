"""Parallel-prefix primitives for first-order recurrences.

TPU-first replacements for sequential `lax.scan` recurrences: a length-n
scalar recurrence is latency-bound on TPU (n sequential VPU steps), while
`jax.lax.associative_scan` runs in O(log n) vectorized stages. Used by the
tridiagonal Cholesky backend (factorize / solves / Takahashi recursion),
i.e. the AR1/RW1 hot path (reference handles these via sequential LDLt on
`SymTridiagonal`, src/utils/linsolve_utils.jl — here the recurrences are
re-derived as associative compositions instead).

Two primitives:

- `linear_recurrence(alpha, beta, reverse)` solves y_k = alpha_k*y_{k-1} +
  beta_k (y_0 = beta_0 with alpha_0 ignored/1) via the affine-composition
  monoid  (a2,b2)∘(a1,b1) = (a2*a1, a2*b1 + b2).

- `mobius_recurrence(A, B, C, D, p0, q0)` solves the continued-fraction
  recurrence x_k = (A_k x_{k-1} + B_k)/(C_k x_{k-1} + D_k) by composing the
  2x2 coefficient matrices with per-step L-infinity normalization (the
  Möbius value is a projective ratio, invariant under scaling, so the
  normalized combine stays associative *on ratios* while avoiding
  overflow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["linear_recurrence", "mobius_recurrence"]


def linear_recurrence(alpha, beta, reverse: bool = False):
    """Solve y_k = alpha_k * y_{k-1} + beta_k along axis 0.

    alpha: (n,) array. beta: (n,) or (n, ...) array (extra axes broadcast).
    The k=0 element uses y_0 = alpha_0 * y_init + beta_0 with y_init = 0,
    matching `lax.scan` with a zero carry. Returns all y_k, shape of beta.
    """
    if beta.ndim > alpha.ndim:
        alpha = alpha.reshape(alpha.shape + (1,) * (beta.ndim - alpha.ndim))

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a2 * a1, a2 * b1 + b2

    a, b = jax.lax.associative_scan(combine, (alpha, beta), reverse=reverse)
    del a
    return b


def mobius_recurrence(a, b, c, d, p0, q0):
    """Cumulative Möbius transforms: x_k = (a_k x_{k-1} + b_k)/(c_k x_{k-1} + d_k).

    a,b,c,d: (n,) step coefficients (k = 1..n). p0/q0: scalars with
    x_0 = p0/q0. Returns x_1..x_n, shape (n,).

    Composition is 2x2 matrix multiplication of [[a,b],[c,d]]; each combine
    is normalized by its max-abs entry, which leaves the projective ratio
    unchanged and keeps f32 in range for any n.
    """
    def combine(m1, m2):
        # Unrolled (m2 @ m1) as elementwise FMAs: a 2x2 product must stay on
        # the VPU at full f32 — einsum/dot would route through the MXU, whose
        # default-precision bf16 multiplies destroy the continued fraction
        # (pivots go negative → sqrt NaN on near-singular intrinsic models).
        a1, b1, c1, d1 = m1
        a2, b2, c2, d2 = m2
        a3 = a2 * a1 + b2 * c1
        b3 = a2 * b1 + b2 * d1
        c3 = c2 * a1 + d2 * c1
        d3 = c2 * b1 + d2 * d1
        scale = jnp.maximum(
            jnp.maximum(jnp.abs(a3), jnp.abs(b3)),
            jnp.maximum(jnp.abs(c3), jnp.abs(d3)),
        )
        scale = jnp.maximum(scale, jnp.finfo(a3.dtype).tiny)
        return a3 / scale, b3 / scale, c3 / scale, d3 / scale

    A, B, C, D = jax.lax.associative_scan(combine, (a, b, c, d))
    p = A * p0 + B * q0
    q = C * p0 + D * q0
    return p / q
