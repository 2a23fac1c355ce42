"""AD-based observation likelihoods and nonlinear least squares.

Reference specs: src/observation_models/autodiff_likelihood.jl:32-500
(custom log-likelihood with AD grad/Hessian; `diagonal_hessian_safe` fast
path) and src/observation_models/nonlinear_least_squares.jl:16-316
(y ~ N(f(x), σ), Gauss-Newton ∇²ℓ ≈ −JᵀWJ).

TPU-native: instead of the reference's backend-preference machinery
(Enzyme > Mooncake > Zygote > ForwardDiff + prep caches), everything is
`jax.grad`/`jax.jacfwd`/HVP composition — one AD system, trace-time fused.
The Hessian representation is chosen statically: "diag" (safe only when
∂²ℓ/∂xᵢ∂xⱼ = 0 for i≠j), "dense", or a fixed sparse pattern probed via HVPs
against pattern columns.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.matrix import SparseMatrix, from_dense, spdiag
from ..sparse.pattern import SparsePattern
from .base import ObservationLikelihood, ObservationModel

__all__ = [
    "AutoDiffObservationModel",
    "AutoDiffLikelihood",
    "NonlinearLeastSquaresModel",
    "ZeroLikelihood",
]


def _dense_pattern(n):
    rows, cols = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return SparsePattern(rows.ravel(), cols.ravel(), (n, n))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AutoDiffLikelihood(ObservationLikelihood):
    theta: Any  # traced hyperparameters passed through to fn
    y: Any
    fn: Callable = dataclasses.field(metadata=dict(static=True))
    hessian: Any = dataclasses.field(default="dense", metadata=dict(static=True))

    conditionally_independent = False

    @property
    def hessian_kind(self):
        return "diag" if self.hessian == "diag" else "sparse"

    def _ll(self, x):
        return self.fn(x, self.y, **self.theta)

    def loglik(self, x):
        return self._ll(x)

    def loggrad(self, x):
        return jax.grad(self._ll)(x)

    def loghessian_diag(self, x):
        """Diagonal of the Hessian via a single HVP trick valid only when the
        Hessian IS diagonal (reference `diagonal_hessian_safe`)."""
        g = jax.grad(self._ll)
        _, hvp = jax.jvp(g, (x,), (jnp.ones_like(x),))
        return hvp

    def loghessian(self, x) -> SparseMatrix:
        if isinstance(self.hessian, SparsePattern):
            from ..linear_maps import sparse_hessian_map

            return sparse_hessian_map(self._ll, x, self.hessian).symmetrize()
        if self.hessian == "diag":
            return spdiag(self.loghessian_diag(x))
        H = jax.hessian(self._ll)(x)
        n = x.shape[0]
        return SparseMatrix(H.ravel(), _dense_pattern(n))


class AutoDiffObservationModel(ObservationModel):
    """obs_model = AutoDiffObservationModel(fn, hessian=...) with hessian in
    {'dense', 'diag'} or a symmetric `SparsePattern` (colored HVP extraction,
    no n×n array — reference ext/GaussianMarkovRandomFieldsSparseADLikelihoods.jl);
    fn(x, y, **theta) -> scalar log-likelihood."""

    def __init__(self, fn: Callable, hessian="dense"):
        if not isinstance(hessian, SparsePattern) and hessian not in (
            "dense",
            "diag",
        ):
            raise ValueError("hessian must be 'dense', 'diag', or a SparsePattern")
        self.fn = fn
        self.hessian = hessian

    def __call__(self, y, **theta) -> AutoDiffLikelihood:
        return AutoDiffLikelihood(theta=theta, y=y, fn=self.fn, hessian=self.hessian)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NLSQLikelihood(ObservationLikelihood):
    """y ~ N(f(x), σ): Gauss-Newton curvature −JᵀWJ (PSD by construction).

    With `jac_pattern` (an (m, n) SparsePattern of ∂f/∂x) the Jacobian is
    extracted by colored jvps and the curvature assembled as a sparse
    JᵀJ product — the reference's sparse-AD NLSQ path
    (reference src/observation_models/nonlinear_least_squares.jl:16-316)."""

    y: Any
    sigma: Any
    f: Callable = dataclasses.field(metadata=dict(static=True))
    jac_pattern: Any = dataclasses.field(default=None, metadata=dict(static=True))

    conditionally_independent = False
    hessian_kind = "sparse"

    def _resid(self, x):
        return self.y - self.f(x)

    def loglik(self, x):
        r = self._resid(x)
        n = r.shape[0]
        return -0.5 * jnp.sum((r / self.sigma) ** 2) - n * jnp.log(self.sigma) - 0.5 * n * 1.8378770664093453

    def loggrad(self, x):
        # ∇ℓ = Jᵀ W r with W = I/σ²
        r = self._resid(x)
        _, vjp = jax.vjp(self.f, x)
        return vjp(r / self.sigma**2)[0]

    def loghessian(self, x) -> SparseMatrix:
        if self.jac_pattern is not None:
            from ..linear_maps import sparse_jacobian_map
            from ..sparse.matrix import sp_matmul

            J = sparse_jacobian_map(self.f, x, self.jac_pattern)
            return sp_matmul(J.T, J) * (-1.0 / self.sigma**2)
        J = jax.jacfwd(self.f)(x)  # (m, n)
        H = -(J.T @ J) / self.sigma**2
        n = x.shape[0]
        return SparseMatrix(H.ravel(), _dense_pattern(n))


class NonlinearLeastSquaresModel(ObservationModel):
    def __init__(self, f: Callable, jac_pattern: SparsePattern | None = None):
        self.f = f
        self.jac_pattern = jac_pattern

    @property
    def hyperparameters(self):
        return ("sigma",)

    def __call__(self, y, sigma, **_) -> NLSQLikelihood:
        return NLSQLikelihood(
            y=jnp.asarray(y),
            sigma=jnp.asarray(sigma),
            f=self.f,
            jac_pattern=self.jac_pattern,
        )

    def conditional_distribution(self, x, sigma, **_):
        """Predictive y | x ~ Normal(f(x), σ)
        (reference nonlinear_least_squares.jl:249)."""
        from .exponential_family import Predictive

        return Predictive(
            eta=self.f(jnp.asarray(x)),
            params={"sigma": jnp.asarray(sigma)},
            family="normal",
            link="identity",
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ZeroLikelihood(ObservationLikelihood):
    """loglik ≡ 0: enables TMB-style monolithic joints
    (reference src/observation_models/zero_likelihood.jl)."""

    conditionally_independent = True
    hessian_kind = "diag"

    def loglik(self, x):
        return jnp.zeros(())

    def loggrad(self, x):
        return jnp.zeros_like(x)

    def loghessian_diag(self, x):
        return jnp.zeros_like(x)

    def pointwise_loglik(self, x):
        return jnp.zeros_like(x)
