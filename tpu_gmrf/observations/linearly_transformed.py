"""Linearly transformed observation models: η = A·x + b.

Reference spec: src/observation_models/linearly_transformed.jl:40-395 —
wraps any base likelihood; grad = Aᵀ g(η), Hessian = Aᵀ·diag(h_η)·A with a
fixed sparsity pattern (the SpGEMM plan AᵀDA is cached per A-pattern, so
the Newton loop stays fully jitted).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..sparse.matrix import SparseMatrix, spdiag
from .base import ObservationLikelihood, ObservationModel

__all__ = [
    "LinearlyTransformedObservationModel",
    "LinearlyTransformedLikelihood",
    "ParameterizedMatrix",
    "ParameterizedOffset",
]


class ParameterizedMatrix:
    """θ-dependent design matrix with a fixed sparsity pattern
    (reference linearly_transformed.jl:40-61): `builder(**θ_sub)` returns the
    concrete A (SparseMatrix or dense) when called with the hyperparameters
    it declares. Values may depend on θ; the pattern/shape may not — that is
    the static-pattern contract that keeps the Newton loop jittable.
    """

    def __init__(self, builder, hyperparameters=(), n_latent=None):
        self.builder = builder
        self.hyperparameters = tuple(hyperparameters)
        self.n_latent = n_latent

    def resolve(self, theta):
        return self.builder(**{k: theta[k] for k in self.hyperparameters})


class ParameterizedOffset:
    """θ-dependent additive offset b for the affine predictor η = A·x + b
    (reference linearly_transformed.jl:63-104). The offset's values may
    depend on θ but its length may not."""

    def __init__(self, builder, hyperparameters=()):
        self.builder = builder
        self.hyperparameters = tuple(hyperparameters)

    def resolve(self, theta):
        return jnp.asarray(self.builder(**{k: theta[k] for k in self.hyperparameters}))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LinearlyTransformedLikelihood(ObservationLikelihood):
    base: Any  # base ObservationLikelihood evaluated at η
    A: Any  # SparseMatrix (m_eta, n) or dense (m_eta, n)
    b: Any  # (m_eta,) offset or None

    conditionally_independent = False  # w.r.t. latent x
    hessian_kind = "sparse"

    @property
    def n(self):
        return self.A.shape[1]

    def _eta(self, x):
        eta = self.A.matvec(x) if isinstance(self.A, SparseMatrix) else self.A @ x
        if self.b is not None:
            eta = eta + self.b
        return eta

    def loglik(self, x):
        return self.base.loglik(self._eta(x))

    def pointwise_loglik(self, x):
        return self.base.pointwise_loglik(self._eta(x))

    def loggrad(self, x):
        g_eta = self.base.loggrad(self._eta(x))
        if isinstance(self.A, SparseMatrix):
            return self.A.rmatvec(g_eta)
        return self.A.T @ g_eta

    def loghessian(self, x) -> SparseMatrix:
        h_eta = self.base.loghessian_diag(self._eta(x))
        if isinstance(self.A, SparseMatrix):
            # Aᵀ D A with cached symbolic plan — fixed output pattern
            return self.A.T @ (spdiag(h_eta) @ self.A)
        H = self.A.T @ (h_eta[:, None] * self.A)
        from ..sparse.matrix import from_dense
        from ..sparse.pattern import SparsePattern
        import numpy as np

        n = H.shape[0]
        rows, cols = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        pat = SparsePattern(rows.ravel(), cols.ravel(), (n, n))
        return SparseMatrix(H.ravel(), pat)

    def loghessian_diag(self, x):
        raise NotImplementedError("LT Hessian is not diagonal; use loghessian")


class LinearlyTransformedObservationModel(ObservationModel):
    """Wrap a base ObservationModel with η = A·x + b.

    A may be a concrete SparseMatrix/dense array or a `ParameterizedMatrix`;
    b may be a vector, a `ParameterizedOffset`, or None. Parameterized specs
    are resolved once at materialization (`model(y, **θ)`), with their
    declared hyperparameter names merged into the model's
    (reference linearly_transformed.jl:40-104)."""

    def __init__(self, base_model: ObservationModel, A, b=None):
        self.base_model = base_model
        self.A = A
        if b is None or isinstance(b, ParameterizedOffset):
            self.b = b
        else:
            self.b = jnp.asarray(b)

    @property
    def hyperparameters(self):
        hp = tuple(getattr(self.base_model, "hyperparameters", ()))
        if isinstance(self.A, ParameterizedMatrix):
            hp += self.A.hyperparameters
        if isinstance(self.b, ParameterizedOffset):
            hp += self.b.hyperparameters
        return hp

    def _design_hp_names(self):
        names = ()
        if isinstance(self.A, ParameterizedMatrix):
            names += self.A.hyperparameters
        if isinstance(self.b, ParameterizedOffset):
            names += self.b.hyperparameters
        return set(names)

    def __call__(self, y, **theta) -> LinearlyTransformedLikelihood:
        design = self._design_hp_names()
        base = self.base_model(y, **{k: v for k, v in theta.items() if k not in design})
        A = self.A.resolve(theta) if isinstance(self.A, ParameterizedMatrix) else self.A
        b = self.b.resolve(theta) if isinstance(self.b, ParameterizedOffset) else self.b
        return LinearlyTransformedLikelihood(base=base, A=A, b=b)

    def conditional_distribution(self, x_full, **theta):
        """Predictive at η = A·x + b forwarded to the base model
        (reference linearly_transformed.jl:372-377)."""
        design = self._design_hp_names()
        A = self.A.resolve(theta) if isinstance(self.A, ParameterizedMatrix) else self.A
        b = self.b.resolve(theta) if isinstance(self.b, ParameterizedOffset) else self.b
        eta = A.matvec(x_full) if isinstance(A, SparseMatrix) else A @ x_full
        if b is not None:
            eta = eta + b
        return self.base_model.conditional_distribution(
            eta, **{k: v for k, v in theta.items() if k not in design}
        )
