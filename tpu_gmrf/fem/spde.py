"""Matérn SPDE discretization (Lindgren, Rue & Lindgren 2011).

Reference spec: ext/GaussianMarkovRandomFieldsFEM/matern_spde.jl:18-448 —
(κ² − Δ)^{α/2} u = 𝒲, α = ν + d/2; K = κ²C̃ + G with lumped mass C̃;
recursion Q₁ = K, Q₂ = KᵀC⁻¹K, Q_α = Kᵀ C⁻¹ Q_{α−2} C⁻¹ K; variance
normalization σ²_nat = Γ(ν)/(Γ(ν+d/2)(4π)^{d/2}κ^{2ν}); κ = √(8ν)/range;
ν = smoothness+1 (even d) or smoothness+½ (odd d); d is the intrinsic
(manifold) dimension.

TPU-native: κ is traced — K's data is κ²·C_diag scattered onto the fixed
diag∪G pattern plus G's data, and every product in the α-recursion runs
through cached fixed-pattern SpGEMM plans, so the κ-invariant structural
pattern (reference issue #183, `_matern_structural_pattern`) holds by
construction and the whole θ ↦ Q map jits.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..gmrf import GMRF
from ..models.base import LatentModel, process_constraint
from ..solvers.base import SolverSpec
from ..sparse.matrix import SparseMatrix, spdiag
from ..sparse.pattern import diag_pattern, union_patterns
from .discretization import FEMDiscretization
from .mesh import generate_mesh

__all__ = ["MaternSPDE", "MaternModel", "range_to_kappa", "smoothness_to_nu"]


def range_to_kappa(range_, nu):
    return jnp.sqrt(8.0 * nu) / range_


def smoothness_to_nu(smoothness: int, d: int) -> float:
    if smoothness < 0:
        raise ValueError("smoothness must be non-negative")
    return smoothness + 1.0 if d % 2 == 0 else smoothness + 0.5


class MaternSPDE:
    """Matérn SPDE on a FEMDiscretization. Configuration object (static);
    `precision(kappa)` is the jittable numeric map."""

    def __init__(
        self,
        disc: FEMDiscretization,
        smoothness: int = 1,
        variance: float = 1.0,
        diffusion_factor=None,
        bc: str = "neumann",
        boundary_noise: float = 1e-4,
    ):
        if bc not in ("neumann", "dirichlet"):
            raise ValueError("bc must be 'neumann' or 'dirichlet'")
        self.bc = bc
        self.boundary_noise = float(boundary_noise)
        self.disc = disc
        self.smoothness = int(smoothness)
        self.variance = float(variance)
        d = disc.intrinsic_dim
        self.d = d
        self.nu = smoothness_to_nu(self.smoothness, d)
        alpha = self.nu + d / 2.0
        if abs(alpha - round(alpha)) > 1e-9:
            raise ValueError(f"non-integer alpha {alpha}")
        self.alpha = int(round(alpha))
        C = disc.mass_matrix(lumped=True)
        self.C_diag = C.diagonal()  # (n,) concrete
        self.G = disc.stiffness_matrix(diffusion=diffusion_factor)
        n = disc.ndofs
        self.K_pattern = union_patterns(diag_pattern(n), self.G.pattern)
        self._G_padded = self.G.pad_to(self.K_pattern)
        self._diag_pos = self.K_pattern.diag_positions
        if self.bc == "dirichlet":
            bnodes = disc.boundary_nodes()
            bmask = np.zeros(n, bool)
            bmask[bnodes] = True
            self._bmask = bmask
            rows, cols = self.K_pattern.rows, self.K_pattern.cols
            # keep entries not touching the boundary; boundary diag handled below
            self._K_keep = np.asarray(
                ~(bmask[rows] | bmask[cols]) | (rows == cols), dtype=bool
            )
            self._b_diag_pos = self._diag_pos[bnodes]
        else:
            self._bmask = None

    @property
    def n(self):
        return self.disc.ndofs

    def K(self, kappa) -> SparseMatrix:
        data = self._G_padded.data.at[self._diag_pos].add(
            jnp.asarray(kappa) ** 2 * self.C_diag
        )
        if self._bmask is not None:
            # soft Dirichlet: decouple boundary dofs (zero row/col, unit diag)
            # — reference _matern_precision_only soft-constraint handling
            data = jnp.where(jnp.asarray(self._K_keep), data, 0.0)
            data = data.at[self._b_diag_pos].set(1.0)
        return self._G_padded.with_data(data)

    def precision(self, kappa) -> SparseMatrix:
        """Q(κ) with the variance normalized to `self.variance`."""
        kappa = jnp.asarray(kappa)
        K = self.K(kappa)
        alpha = self.alpha
        Cinv = spdiag(1.0 / self.C_diag)
        if alpha == 1:
            Q = K
        else:
            if alpha == 2:
                Q_rhs = Cinv
            else:
                Q_inner = self._recursion(K, alpha - 2, Cinv)
                Q_rhs = Cinv @ Q_inner @ Cinv
            Q = K.T @ (Q_rhs @ K)
        if self.nu > 0:
            sigma2_nat = (
                math.gamma(self.nu)
                / (math.gamma(self.nu + self.d / 2.0) * (4.0 * jnp.pi) ** (self.d / 2.0))
            ) * kappa ** (-2.0 * self.nu)
            ratio = sigma2_nat / self.variance
            Q = Q * ratio
        if self._bmask is not None:
            # boundary dofs ~ N(0, boundary_noise²), independent
            rows, cols = Q.pattern.rows, Q.pattern.cols
            keep = ~(self._bmask[rows] | self._bmask[cols]) | (rows == cols)
            data = jnp.where(jnp.asarray(keep), Q.data, 0.0)
            bpos = Q.pattern.diag_positions[np.nonzero(self._bmask)[0]]
            data = data.at[bpos].set(self.boundary_noise ** (-2.0))
            Q = Q.with_data(data)
        return Q.symmetrize() if Q.pattern.is_symmetric else Q

    def _recursion(self, K, alpha, Cinv):
        if alpha == 1:
            return K
        if alpha == 2:
            return K.T @ (Cinv @ K)
        inner = self._recursion(K, alpha - 2, Cinv)
        return K.T @ ((Cinv @ inner @ Cinv) @ K)

    def discretize(self, kappa, solver: SolverSpec = SolverSpec()) -> GMRF:
        Q = self.precision(kappa)
        return GMRF.from_precision(jnp.zeros(self.n), Q, solver)


class MaternModel(LatentModel):
    """Latent Matérn model. Hyperparameters: (tau, range)
    (reference ext/.../matern_model.jl:16-121)."""

    name = "matern"

    def __init__(
        self,
        disc_or_points,
        smoothness: int = 1,
        constraint=None,
        solver=None,
        element_size=None,
        diffusion_factor=None,
        bc: str = "neumann",
        boundary_noise: float = 1e-4,
    ):
        if isinstance(disc_or_points, FEMDiscretization):
            disc = disc_or_points
            self.observation_points = None
        else:
            pts = np.asarray(disc_or_points, dtype=np.float64)
            mesh = generate_mesh(pts, element_size=element_size)
            disc = FEMDiscretization(mesh)
            self.observation_points = pts
        self.disc = disc
        self.spde = MaternSPDE(
            disc,
            smoothness=smoothness,
            diffusion_factor=diffusion_factor,
            bc=bc,
            boundary_noise=boundary_noise,
        )
        self.constraint = process_constraint(constraint, disc.ndofs)
        if solver is not None:
            self.solver = solver

    @property
    def n(self):
        return self.disc.ndofs

    @property
    def hyperparameters(self):
        return ("tau", "range")

    def precision(self, tau, range) -> SparseMatrix:
        kappa = range_to_kappa(jnp.asarray(range), self.spde.nu)
        return self.spde.precision(kappa) * jnp.asarray(tau)

    def constraints(self):
        return self.constraint

    def evaluation_matrix(self, points=None) -> SparseMatrix:
        if points is None:
            if self.observation_points is None:
                raise ValueError("no stored observation points; pass points")
            points = self.observation_points
        return self.disc.evaluation_matrix(points)
