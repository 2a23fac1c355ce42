"""Formula model builder.

Reference spec: ext/GaussianMarkovRandomFieldsFormula/build.jl:216-330 —
`build_formula_components(formula, data; family, trials, exposure)` returns
`(A, y, obs_model, combined_model, hyperparameters, meta)`: random-effect
blocks first, then one FixedEffectsModel for all fixed columns (ridge
λ=1e-6); observation side is `ExponentialFamily(family)` lifted by the
stacked design through `LinearlyTransformedObservationModel`.

Accepts either a list of `Term` objects or an R-style string formula
("y ~ 1 + x + IID(g) + Besag(region, W)") evaluated in a namespace of term
constructors with bare data columns bound as `Col` references (extra
objects like adjacency matrices come from `context`).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from ..models import CombinedModel, FixedEffectsModel
from ..observations import (
    BinomialObservations,
    ExponentialFamily,
    LinearlyTransformedObservationModel,
    NegativeBinomialObservations,
    PoissonObservations,
)
from ..sparse.matrix import SparseMatrix
from ..sparse.pattern import SparsePattern
from . import terms as T

__all__ = ["build_formula_components", "FormulaComponents", "sp_hstack", "predict_cols"]


def sp_hstack(blocks) -> SparseMatrix:
    import jax.numpy as jnp

    m = blocks[0].shape[0]
    rows, cols, datas = [], [], []
    off = 0
    for b in blocks:
        if b.shape[0] != m:
            raise ValueError("row-count mismatch in hstack")
        rows.append(b.pattern.rows.astype(np.int64))
        cols.append(b.pattern.cols.astype(np.int64) + off)
        datas.append(b.data)
        off += b.shape[1]
    pat = SparsePattern(np.concatenate(rows), np.concatenate(cols), (m, off))
    data = jnp.concatenate(datas, axis=-1)[..., pat.sort_order]
    return SparseMatrix(data, pat)


@dataclasses.dataclass
class FormulaComponents:
    A: SparseMatrix
    y: Any
    obs_model: LinearlyTransformedObservationModel
    combined_model: CombinedModel
    hyperparameters: tuple
    meta: dict
    terms: list


def _parse_string_formula(formula: str, data, context):
    lhs, rhs = formula.split("~")
    lhs = lhs.strip()
    namespace = {
        "IID": T.IID,
        "RandomWalk": T.RandomWalk,
        "RW1": T.RW1,
        "RW2": T.RW2,
        "AR1": T.AR1,
        "AR": T.AR,
        "Besag": T.Besag,
        "BYM2": T.BYM2,
        "Matern": T.Matern,
        "Separable": T.Separable,
        "Fixed": T.Fixed,
        "Intercept": T.Intercept,
    }
    if context:
        namespace.update(context)
    for k in data:
        namespace.setdefault(k, T.Col(k))
    result = eval(rhs, {"__builtins__": {}}, namespace)  # noqa: S307 — restricted DSL eval
    return lhs, T.TermList._coerce(result).terms


def build_formula_components(
    formula,
    data,
    family: str = "normal",
    trials=None,
    exposure=None,
    fixed_prior: float = 1e-6,
    context: dict | None = None,
) -> FormulaComponents:
    if isinstance(formula, str):
        response, term_list = _parse_string_formula(formula, data, context or {})
        y = np.asarray(data[response])
    else:
        response, term_list = None, list(formula)
        y = np.asarray(data["y"]) if "y" in data else None

    fam = family.lower()
    if fam == "binomial":
        if trials is None:
            raise ValueError("family='binomial' requires trials column name")
        import jax.numpy as jnp

        y = BinomialObservations(jnp.asarray(y), jnp.asarray(np.asarray(data[trials])))
    elif fam == "poisson":
        expo = None if exposure is None else np.asarray(data[exposure])
        y = PoissonObservations.create(y, exposure=expo)
    elif fam in ("negativebinomial", "negbin"):
        expo = None if exposure is None else np.asarray(data[exposure])
        y = NegativeBinomialObservations.create(y, exposure=expo)

    random_terms = [t for t in term_list if not getattr(t, "is_fixed", False)]
    fixed_terms = [t for t in term_list if getattr(t, "is_fixed", False)]

    A_blocks, models, built_terms = [], [], []
    for t in random_terms:
        A_i, model, levels = t.build(data)
        A_blocks.append(A_i)
        models.append(model)
        built_terms.append((t, levels))

    n_fixed = 0
    if fixed_terms:
        X = np.hstack([t.fixed_cols(data) for t in fixed_terms])
        n_fixed = X.shape[1]
        import jax.numpy as jnp

        mask = np.ones_like(X, dtype=bool)
        rows, cols = np.nonzero(mask)
        pat = SparsePattern(rows, cols, X.shape)
        A_blocks.append(SparseMatrix(jnp.asarray(X.ravel())[pat.sort_order], pat))
        models.append(FixedEffectsModel(n_fixed, lam=fixed_prior))

    if not models:
        raise ValueError("no terms found on the formula RHS")

    A = sp_hstack(A_blocks)
    combined = CombinedModel(*models)
    obs_model = LinearlyTransformedObservationModel(ExponentialFamily(fam), A)
    if A.shape[1] != combined.n:
        raise ValueError(
            f"design columns ({A.shape[1]}) do not match latent dimension ({combined.n})"
        )
    meta = {
        "n_random": len(random_terms),
        "n_fixed": n_fixed,
        "term_sizes": [b.shape[1] for b in A_blocks],
        "fixed_terms": fixed_terms,
    }
    return FormulaComponents(
        A=A,
        y=y,
        obs_model=obs_model,
        combined_model=combined,
        hyperparameters=combined.hyperparameters,
        meta=meta,
        terms=built_terms,
    )


def predict_cols(components: FormulaComponents, newdata) -> SparseMatrix:
    """Out-of-sample design matrix for the random terms, matching the fitted
    latent layout (reference `predict_cols`). Fixed terms are re-evaluated
    from `newdata` columns."""
    blocks = []
    for t, levels in components.terms:
        if isinstance(t, T.Matern):
            pts = np.stack(
                [np.asarray(newdata[c], dtype=np.float64) for c in t.cols], axis=1
            )
            # reuse the FITTED mesh
            model = [
                m
                for m in components.combined_model.components
                if getattr(m, "name", "") == "matern"
            ][0]
            blocks.append(model.disc.evaluation_matrix(pts))
        elif isinstance(t, T._FactorTerm):
            vals = np.asarray(newdata[t.col])
            if isinstance(t, (T.Besag, T.BYM2)):
                codes = vals.astype(np.int64)
                n_lev = len(levels)
            else:
                lookup = {v: i for i, v in enumerate(levels)}
                codes = np.asarray([lookup[v] for v in vals], dtype=np.int64)
                n_lev = len(levels)
            blocks.append(T.indicator_matrix(codes, n_lev))
        else:
            raise TypeError(f"predict_cols: unsupported term {type(t)}")
    n_fixed = components.meta["n_fixed"]
    if n_fixed:
        # fixed terms re-evaluate their covariate columns from newdata,
        # matching the fitted latent layout (reference
        # ext/GaussianMarkovRandomFieldsFormula/build.jl:216-330)
        import jax.numpy as jnp

        X = np.hstack(
            [t.fixed_cols(newdata) for t in components.meta["fixed_terms"]]
        )
        if X.shape[1] != n_fixed:
            raise ValueError(
                f"newdata produced {X.shape[1]} fixed columns; fit had {n_fixed}"
            )
        rows, cols = np.nonzero(np.ones_like(X, dtype=bool))
        pat = SparsePattern(rows, cols, X.shape)
        blocks.append(SparseMatrix(jnp.asarray(X.ravel())[pat.sort_order], pat))
    return sp_hstack(blocks)
