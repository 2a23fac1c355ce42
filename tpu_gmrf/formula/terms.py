"""Formula terms: placeholder functors mapping data columns to (design
block, latent model) pairs.

Reference spec: src/formula/constructors.jl:1-433 (IID, RandomWalk, AR1,
AR, Besag, BYM2, Separable, Matern functors) and
ext/GaussianMarkovRandomFieldsFormula/{terms,build}.jl (indicator /
Khatri-Rao design assembly).
"""

from __future__ import annotations

import numpy as np

from ..models import (
    ARModel,
    BYM2Model,
    BesagModel,
    FixedEffectsModel,
    IIDModel,
    RWModel,
)
from ..sparse.matrix import SparseMatrix
from ..sparse.pattern import SparsePattern

__all__ = [
    "Col",
    "Term",
    "Intercept",
    "Fixed",
    "IID",
    "RandomWalk",
    "RW1",
    "RW2",
    "AR1",
    "AR",
    "Besag",
    "BYM2",
    "Matern",
    "Separable",
    "TermList",
]


def _colname(c):
    return c.name if isinstance(c, Col) else c


def indicator_matrix(codes: np.ndarray, n_levels: int) -> SparseMatrix:
    import jax.numpy as jnp

    m = len(codes)
    pat = SparsePattern(np.arange(m), codes.astype(np.int64), (m, n_levels))
    return SparseMatrix(jnp.ones(m)[pat.sort_order], pat)


def _factor_codes(values):
    """(codes, levels) with levels sorted unique."""
    levels, codes = np.unique(np.asarray(values), return_inverse=True)
    return codes, levels


class Col:
    """Bare column reference produced by the string-formula namespace."""

    def __init__(self, name):
        self.name = name

    def __add__(self, other):
        return TermList([Fixed(self.name)]) + other

    def __radd__(self, other):
        return TermList._coerce(other) + Fixed(self.name)

    def __repr__(self):
        return f"Col({self.name})"


class Term:
    """Base: build(data) -> (A_block: SparseMatrix, model | None, levels)."""

    def __add__(self, other):
        return TermList([self]) + other

    def __radd__(self, other):
        return TermList._coerce(other) + self

    def build(self, data):
        raise NotImplementedError


class TermList:
    def __init__(self, terms):
        self.terms = list(terms)

    @staticmethod
    def _coerce(x):
        if isinstance(x, TermList):
            return x
        if isinstance(x, Term):
            return TermList([x])
        if isinstance(x, Col):
            return TermList([Fixed(x.name)])
        if x == 1:
            return TermList([Intercept()])
        if x == 0:
            return TermList([])
        raise TypeError(f"cannot use {x!r} in a formula")

    def __add__(self, other):
        other = TermList._coerce(other)
        return TermList(self.terms + other.terms)

    __radd__ = __add__


class Intercept(Term):
    is_fixed = True

    def fixed_cols(self, data):
        n = len(next(iter(data.values())))
        return np.ones((n, 1))


class Fixed(Term):
    is_fixed = True

    def __init__(self, col):
        self.col = _colname(col)

    def fixed_cols(self, data):
        return np.asarray(data[self.col], dtype=np.float64).reshape(-1, 1)


class _FactorTerm(Term):
    is_fixed = False

    def __init__(self, col):
        self.col = _colname(col)

    def _codes(self, data):
        return _factor_codes(data[self.col])


class IID(_FactorTerm):
    def __init__(self, col, constraint=None):
        super().__init__(col)
        self.constraint = constraint

    def build(self, data):
        codes, levels = self._codes(data)
        return (
            indicator_matrix(codes, len(levels)),
            IIDModel(len(levels), constraint=self.constraint, levels=levels),
            levels,
        )


class RandomWalk(_FactorTerm):
    def __init__(self, col, order: int = 1, scale_model: bool = False):
        super().__init__(col)
        self.order = order
        self.scale_model = scale_model

    def build(self, data):
        codes, levels = self._codes(data)
        return (
            indicator_matrix(codes, len(levels)),
            RWModel(len(levels), order=self.order, scale_model=self.scale_model),
            levels,
        )


def RW1(col, **kw):
    return RandomWalk(col, order=1, **kw)


def RW2(col, **kw):
    return RandomWalk(col, order=2, **kw)


class AR(_FactorTerm):
    def __init__(self, col, order: int = 1):
        super().__init__(col)
        self.order = order

    def build(self, data):
        codes, levels = self._codes(data)
        return (
            indicator_matrix(codes, len(levels)),
            ARModel(len(levels), order=self.order),
            levels,
        )


def AR1(col):
    return AR(col, order=1)


class Besag(_FactorTerm):
    def __init__(self, col, W, **kw):
        super().__init__(col)
        self.W = W
        self.kw = kw

    def build(self, data):
        codes = np.asarray(data[self.col], dtype=np.int64)
        model = BesagModel(self.W, **self.kw)
        return indicator_matrix(codes, model.n), model, np.arange(model.n)


class BYM2(_FactorTerm):
    def __init__(self, col, W, **kw):
        super().__init__(col)
        self.W = W
        self.kw = kw

    def build(self, data):
        codes = np.asarray(data[self.col], dtype=np.int64)
        model = BYM2Model(self.W, **self.kw)
        half = model.n // 2
        # predictor = u*_i + v_i: [indicator | indicator] over the 2n stack
        import jax.numpy as jnp

        m = len(codes)
        rows = np.concatenate([np.arange(m), np.arange(m)])
        cols = np.concatenate([codes, codes + half])
        pat = SparsePattern(rows, cols, (m, model.n))
        A = SparseMatrix(jnp.ones(2 * m)[pat.sort_order], pat)
        return A, model, np.arange(half)


class Matern(Term):
    """Matern(['x', 'y'], smoothness=1): continuous spatial field evaluated
    at observation coordinates."""

    is_fixed = False

    def __init__(self, cols, smoothness: int = 1, element_size=None, **kw):
        self.cols = [_colname(c) for c in (cols if isinstance(cols, (list, tuple)) else [cols])]
        self.smoothness = smoothness
        self.element_size = element_size
        self.kw = kw

    def build(self, data):
        from ..fem import MaternModel

        pts = np.stack([np.asarray(data[c], dtype=np.float64) for c in self.cols], axis=1)
        model = MaternModel(
            pts, smoothness=self.smoothness, element_size=self.element_size, **self.kw
        )
        A = model.disc.evaluation_matrix(pts)
        return A, model, pts


class Separable(Term):
    """Khatri-Rao (row-wise Kronecker) of factor terms — space-time
    interactions. Components must be factor terms (IID/RW/AR/Besag)."""

    is_fixed = False

    def __init__(self, *components):
        self.components = components

    def build(self, data):
        from ..models import SeparableModel

        built = [c.build(data) for c in self.components]
        models = [b[1] for b in built]
        sep = SeparableModel(*models)
        # row-wise kron of indicator blocks (each row one-hot → product index)
        A = None
        for b in built:
            Ab = b[0]
            if A is None:
                A = Ab
            else:
                A = _khatri_rao_indicator(A, Ab)
        return A, sep, None


def _khatri_rao_indicator(A: SparseMatrix, B: SparseMatrix) -> SparseMatrix:
    """Row-wise Kronecker for row-sparse design blocks."""
    import jax.numpy as jnp

    m = A.shape[0]
    # per-row entries: all pairs (a-entry, b-entry) in the same row
    pa, pb = A.pattern, B.pattern
    rows, cols, va, vb = [], [], [], []
    for r in range(m):
        sa, ea = pa.indptr[r], pa.indptr[r + 1]
        sb, eb = pb.indptr[r], pb.indptr[r + 1]
        for i in range(sa, ea):
            for j in range(sb, eb):
                rows.append(r)
                cols.append(int(pa.cols[i]) * B.shape[1] + int(pb.cols[j]))
                va.append(i)
                vb.append(j)
    pat = SparsePattern(np.asarray(rows), np.asarray(cols), (m, A.shape[1] * B.shape[1]))
    data = (A.data[np.asarray(va)] * B.data[np.asarray(vb)])[pat.sort_order]
    return SparseMatrix(data, pat)
