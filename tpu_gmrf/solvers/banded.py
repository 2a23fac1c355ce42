"""Blocked banded Cholesky backend (large-mesh path) — placeholder.

Implemented in a later milestone: RCM-permuted banded storage + blocked
Cholesky (`lax.scan` over block columns with dense MXU panel ops) and a
blocked Takahashi recursion for the selected inverse.
"""

from __future__ import annotations


def banded_factorize(Q, block: int = 256):  # pragma: no cover
    raise NotImplementedError(
        "banded backend lands in a later milestone; use SolverSpec(kind='dense')"
    )
