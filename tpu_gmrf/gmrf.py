"""GMRF distribution core.

A `GMRF` is a pytree holding (mean, sparse precision Q, factorization) with
pure jittable/grad-able/vmappable functions `logpdf`, `sample`, `var`,
`std`, `mean` — the TPU-native equivalent of the reference's
`AbstractGMRF <: Distributions.AbstractMvNormal` interface
(reference: src/gmrf.jl:39-333).

The factorization is computed eagerly at construction and reused by every
statistic — the analogue of the reference's lazy `ensure_factorization!`
caching (src/solvers/utils.jl:9-14); under `jit`, XLA dead-code-eliminates
it when unused in a trace.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .sparse.matrix import SparseMatrix
from .solvers.base import SolverSpec, factorize

__all__ = ["GMRF", "logpdf", "sample", "gradlogpdf", "information_vector"]

_LOG2PI = 1.8378770664093453


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GMRF:
    """Gaussian with sparse precision: x ~ N(mean, Q⁻¹)."""

    mean: Any  # (n,)
    Q: SparseMatrix
    factor: Any  # backend factorization (DenseFactor / TridiagFactor / ...)
    solver: SolverSpec = dataclasses.field(
        default=SolverSpec(), metadata=dict(static=True)
    )

    # ---- construction ------------------------------------------------------

    @staticmethod
    def from_precision(mean, Q: SparseMatrix, solver: SolverSpec = SolverSpec()) -> "GMRF":
        mean = jnp.asarray(mean)
        return GMRF(mean=mean, Q=Q, factor=factorize(Q, solver), solver=solver)

    @staticmethod
    def from_information(info, Q: SparseMatrix, solver: SolverSpec = SolverSpec()) -> "GMRF":
        """Construct from the information vector b = Qμ — solves Qμ = b once
        (reference `InformationVector` constructor, src/gmrf.jl:144-156)."""
        factor = factorize(Q, solver)
        return GMRF(mean=factor.solve(jnp.asarray(info)), Q=Q, factor=factor, solver=solver)

    # ---- distribution interface -------------------------------------------

    def __len__(self):
        return self.Q.shape[0]

    @property
    def n(self):
        return self.Q.shape[0]

    @property
    def dtype(self):
        return self.Q.data.dtype

    def precision_matrix(self) -> SparseMatrix:
        return self.Q

    def information_vector(self) -> jnp.ndarray:
        return self.Q.matvec(self.mean)

    def logdet_precision(self) -> jnp.ndarray:
        return self.factor.logdet()

    def logdetcov(self) -> jnp.ndarray:
        return -self.factor.logdet()

    def sqmahal(self, x: jnp.ndarray) -> jnp.ndarray:
        r = x - self.mean
        return self.Q.quad(r)

    def logpdf(self, x: jnp.ndarray) -> jnp.ndarray:
        return -0.5 * (self.n * _LOG2PI - self.factor.logdet() + self.sqmahal(x))

    def gradlogpdf(self, x: jnp.ndarray) -> jnp.ndarray:
        return -self.Q.matvec(x - self.mean)

    def sample(self, key, shape: tuple = ()) -> jnp.ndarray:
        """x = μ + L⁻ᵀ z, z ~ N(0, I)  (reference: src/gmrf.jl:275-281)."""
        z = jax.random.normal(key, (*shape, self.n), dtype=self.dtype)
        if shape:
            flat = z.reshape(-1, self.n)
            x = jax.vmap(self.factor.backward_solve)(flat).reshape(*shape, self.n)
        else:
            x = self.factor.backward_solve(z)
        return self.mean + x

    def var(self) -> jnp.ndarray:
        return self.factor.selinv_diag()

    def std(self) -> jnp.ndarray:
        return jnp.sqrt(self.var())

    def solve(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.factor.solve(b)

    def cov(self):
        raise NotImplementedError(
            "dense covariance deliberately unavailable (reference src/gmrf.jl:90); "
            "use var()/std()/selinv"
        )

    # ---- elementary arithmetic (reference src/arithmetic/elementary.jl) ----

    def __add__(self, v):
        """Shift by a deterministic vector: (x + v) ~ N(μ + v, Q⁻¹)."""
        return dataclasses.replace(self, mean=self.mean + jnp.asarray(v))

    __radd__ = __add__

    def __sub__(self, v):
        return dataclasses.replace(self, mean=self.mean - jnp.asarray(v))


# Functional aliases (ergonomic for jax.grad / vmap call sites)

def logpdf(g: GMRF, x) -> jnp.ndarray:
    return g.logpdf(x)


def gradlogpdf(g: GMRF, x) -> jnp.ndarray:
    return g.gradlogpdf(x)


def sample(key, g: GMRF, shape: tuple = ()) -> jnp.ndarray:
    return g.sample(key, shape)


def information_vector(g: GMRF) -> jnp.ndarray:
    return g.information_vector()
