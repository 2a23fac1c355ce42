"""Spatiotemporal GMRFs: implicit-Euler advection-diffusion SSM joints and
Kronecker product space-time models.

Reference specs:
- ext/.../advection_diffusion.jl:18-206 (Clarotto 2024):
  [∂t + 1/c(κ² − ∇·H∇)^α + 1/c γ·∇]X = τ/√c Z, implicit Euler;
- ext/.../linear_ssm.jl:57-116: block-tridiagonal joint precision
  diag = [Q₀+AᵀF⁻¹A, F⁻¹+AᵀF⁻¹A, …, F⁻¹], off-diag = −F⁻¹A with
  F⁻¹ = GᵀΣ⁻¹G, A = G⁻¹M, Σ⁻¹ = M⁻ᵀβ⁻ᵀQ_sβ⁻¹M⁻¹;
- ext/.../product.jl: Q_st = Q_t ⊗ Q_s;
- src/spdes/spatiotemporal/spatiotemporal_gmrf.jl:29-84: per-time-slice API.

All per-step blocks are constant (constant mesh, uniform Δt) so the joint
precision assembles once as a fixed-pattern block-tridiagonal SparseMatrix.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..gmrf import GMRF
from ..solvers.base import SolverSpec
from ..sparse.matrix import SparseMatrix, sp_kron, spdiag
from ..sparse.pattern import SparsePattern
from .discretization import FEMDiscretization
from .spde import MaternSPDE

__all__ = [
    "SpatiotemporalGMRF",
    "AdvectionDiffusionSPDE",
    "kronecker_product_spatiotemporal_model",
    "product_matern",
    "spatial_to_spatiotemporal",
    "sp_block_tridiag",
]


def sp_block_tridiag(diag_blocks, off_blocks) -> SparseMatrix:
    """Symmetric block tridiagonal from Nt diagonal blocks and Nt−1
    sub-diagonal blocks (off at (i+1, i); transpose mirrored)."""
    Ns = diag_blocks[0].shape[0]
    Nt = len(diag_blocks)
    rows, cols, datas = [], [], []
    for i, b in enumerate(diag_blocks):
        rows.append(b.pattern.rows.astype(np.int64) + i * Ns)
        cols.append(b.pattern.cols.astype(np.int64) + i * Ns)
        datas.append(b.data)
    for i, b in enumerate(off_blocks):
        rows.append(b.pattern.rows.astype(np.int64) + (i + 1) * Ns)
        cols.append(b.pattern.cols.astype(np.int64) + i * Ns)
        datas.append(b.data)
        bt = b.T
        rows.append(bt.pattern.rows.astype(np.int64) + i * Ns)
        cols.append(bt.pattern.cols.astype(np.int64) + (i + 1) * Ns)
        datas.append(bt.data)
    pat = SparsePattern(np.concatenate(rows), np.concatenate(cols), (Nt * Ns, Nt * Ns))
    data = jnp.concatenate(datas, axis=-1)[..., pat.sort_order]
    return SparseMatrix(data, pat)


class SpatiotemporalGMRF:
    """GMRF wrapper with per-time-slice statistics (the reference's
    MetaGMRF/AbstractSpatiotemporalGMRF role)."""

    def __init__(self, gmrf: GMRF, N_t: int, disc: FEMDiscretization, ts=None):
        self.gmrf = gmrf
        self.N_t = N_t
        self.disc = disc
        self.ts = ts
        self.N_s = gmrf.n // N_t

    # forwarding
    def __getattr__(self, name):
        return getattr(self.gmrf, name)

    def __len__(self):
        return self.gmrf.n

    def time_means(self):
        return self.gmrf.mean.reshape(self.N_t, self.N_s)

    def time_vars(self):
        return self.gmrf.var().reshape(self.N_t, self.N_s)

    def time_stds(self):
        return jnp.sqrt(self.time_vars())

    def time_rands(self, key, shape=()):
        x = self.gmrf.sample(key, shape)
        return x.reshape(*shape, self.N_t, self.N_s)

    def discretization_at_time(self, t):
        return self.disc


def spatial_to_spatiotemporal(A_spatial: SparseMatrix, t_idx: int, N_t: int) -> SparseMatrix:
    """Lift a spatial observation matrix to the joint space-time vector at
    time index t (reference src/spdes/spatiotemporal/utils.jl:24-28)."""
    m, Ns = A_spatial.shape
    pat = A_spatial.pattern
    cols = pat.cols.astype(np.int64) + t_idx * Ns
    new_pat = SparsePattern(pat.rows, cols, (m, Ns * N_t))
    return SparseMatrix(A_spatial.data[..., new_pat.sort_order], new_pat)


def _decouple_rows_cols(A: SparseMatrix, mask: np.ndarray, diag_value) -> SparseMatrix:
    """Zero every entry whose row or column is constrained; set constrained
    diagonal entries to `diag_value` (Ferrite `apply!` / the symmetric half of
    apply_soft_constraints!, reference fem_utils.jl:239-300)."""
    rows, cols = A.pattern.rows, A.pattern.cols
    keep = ~(mask[rows] | mask[cols])
    data = jnp.where(jnp.asarray(keep), A.data, 0.0)
    dpos = A.pattern.diag_positions[np.nonzero(mask)[0]]
    data = data.at[dpos].set(diag_value)
    return A.with_data(data)


def _zero_rows(A: SparseMatrix, mask: np.ndarray, diag_value=1.0) -> SparseMatrix:
    """Zero constrained *rows* only and set their diagonal to `diag_value` —
    the soft-constraint transform of the propagation operator K=G
    (reference fem_utils.jl:253-262: K[p_dof,:] .= 0; K[p_dof,p_dof] = 1)."""
    keep = ~mask[A.pattern.rows]
    data = jnp.where(jnp.asarray(keep), A.data, 0.0)
    dpos = A.pattern.diag_positions[np.nonzero(mask)[0]]
    data = data.at[dpos].set(diag_value)
    return A.with_data(data)


def _ssm_means(G_dt: SparseMatrix, M_diag, mu0, Nt: int, bnodes, bvals, dense_max: int):
    """Per-step SSM means μᵢ = G⁻¹(M μᵢ₋₁) with Dirichlet rows forced to the
    prescribed values (reference linear_ssm.jl:75-86). Constant blocks ⇒ one
    factorization + a lax.scan. Dense LU for small Ns; Jacobi-preconditioned
    GMRES matvec solves above `dense_max`."""
    import jax
    import jax.scipy.linalg as jsl

    Ns = G_dt.shape[0]
    mu0 = jnp.asarray(mu0)
    has_b = bnodes is not None and len(bnodes) > 0

    if Ns <= dense_max:
        lu, piv = jsl.lu_factor(G_dt.todense())

        def solve(rhs):
            return jsl.lu_solve((lu, piv), rhs)

    else:
        diag = G_dt.diagonal()

        def solve(rhs):
            x, _ = jax.scipy.sparse.linalg.gmres(
                G_dt.matvec, rhs, M=lambda v: v / diag, tol=1e-10, maxiter=400
            )
            return x

    def step(mu, _):
        rhs = M_diag * mu
        if has_b:
            rhs = rhs.at[jnp.asarray(bnodes)].set(jnp.asarray(bvals, rhs.dtype))
        mu_next = solve(rhs)
        return mu_next, mu_next

    _, mus = jax.lax.scan(step, mu0, None, length=Nt - 1)
    return jnp.concatenate([mu0[None], mus], axis=0).reshape(Ns * Nt)


class AdvectionDiffusionSPDE:
    """Advection-diffusion SPDE over a constant spatial mesh.

    Static configuration: kappa, alpha (integer), H, gamma, c, tau are fixed
    at construction (matching the reference's struct fields); `discretize`
    assembles the joint space-time GMRF for given time points, propagating
    per-step means μᵢ = G⁻¹(M μᵢ₋₁) and applying soft Dirichlet constraints
    (reference ext/.../advection_diffusion.jl:104-204, linear_ssm.jl:63-116).
    """

    def __init__(
        self,
        disc: FEMDiscretization,
        gamma,
        kappa: float = 1.0,
        alpha: int = 1,
        H=None,
        c: float = 1.0,
        tau: float = 1.0,
        spatial_smoothness: int = 1,
        initial_smoothness: int = 2,
        bc: str = "neumann",
        constraint_noise: float = 1e-4,
        spatial_kappa: float | None = None,
    ):
        if bc not in ("neumann", "dirichlet"):
            raise ValueError("bc must be 'neumann' or 'dirichlet'")
        self.disc = disc
        self.kappa = float(kappa)
        # the reference decouples the PROPAGATION κ (the (κ²−∇·H∇)^α drift,
        # struct field κ, default 1.0) from the κ of the spatial-noise and
        # initial-condition Matérns (separately passed spatial_spde /
        # initial_spde — the spatiotemporal tutorial uses range-0.2 noise
        # with propagation κ=1, advection_diffusion.jl:18-27)
        self.spatial_kappa = float(kappa if spatial_kappa is None else spatial_kappa)
        self.alpha = int(alpha)
        self.H = H
        self.gamma = np.asarray(gamma, dtype=np.float64)
        self.c = float(c)
        self.tau = float(tau)
        self.bc = bc
        self.constraint_noise = float(constraint_noise)
        # the initial/spatial SPDEs inherit the constraint (the reference's
        # discretization carries the constraint handler into every Matérn
        # assembly, advection_diffusion.jl:162-165) — without this the SSM
        # chain anchors at an unconstrained x₀ and the boundary is never pinned
        self.spatial_spde = MaternSPDE(
            disc, smoothness=spatial_smoothness, diffusion_factor=H,
            bc=bc, boundary_noise=constraint_noise,
        )
        self.initial_spde = MaternSPDE(
            disc, smoothness=initial_smoothness, diffusion_factor=H,
            bc=bc, boundary_noise=constraint_noise,
        )

    def discretize(
        self,
        ts,
        mean_offset: float = 0.0,
        streamline_diffusion: bool = False,
        h: float = 0.1,
        boundary_values=0.0,
        solver: SolverSpec = SolverSpec(),
    ) -> SpatiotemporalGMRF:
        ts = np.asarray(ts, dtype=np.float64)
        dt = float(ts[1] - ts[0])
        disc = self.disc
        Ns = disc.ndofs
        Nt = len(ts)

        M = disc.mass_matrix(lumped=True)  # diagonal
        G = disc.stiffness_matrix(diffusion=self.H)
        B = disc.advection_matrix(self.gamma)
        if float(np.linalg.norm(self.gamma)) == 0.0:
            streamline_diffusion = False  # SD changes nothing for zero advection

        bmask = np.zeros(Ns, dtype=bool)
        bnodes = None
        if self.bc == "dirichlet":
            bnodes = disc.boundary_nodes()
            bmask[bnodes] = True
            # hard-apply to the assembled operators (reference apply!(M/G/B, 0, ch))
            M = _decouple_rows_cols(M, bmask, 1.0)
            G = _decouple_rows_cols(G, bmask, 0.0)
            B = _decouple_rows_cols(B, bmask, 0.0)

        # K = (κ²M + G)^α
        Kbase = spdiag(self.kappa**2 * M.diagonal()) + G
        K = Kbase
        for _ in range(self.alpha - 1):
            K = K @ Kbase
        propagation = K + B
        if streamline_diffusion:
            S = disc.streamline_diffusion_matrix(self.gamma, h=h)
            if self.bc == "dirichlet":
                S = _decouple_rows_cols(S, bmask, 0.0)
            propagation = propagation + S
        G_dt = spdiag(M.diagonal()) + propagation * (dt / self.c)

        x0 = self.initial_spde.discretize(
            self.spatial_kappa, solver=SolverSpec(kind="dense")
        )
        Q_s = self.spatial_spde.precision(self.spatial_kappa)

        # Σ⁻¹ = M⁻ᵀ β⁻ᵀ Q_s β⁻¹ M⁻¹ with β = √dt·(τ/√c)·I and diagonal M
        beta_inv = 1.0 / (np.sqrt(dt) * self.tau / np.sqrt(self.c))
        Minv_diag = beta_inv / M.diagonal()
        D = spdiag(Minv_diag)
        Sigma_inv = D @ Q_s @ D

        if self.bc == "dirichlet":
            # soft constraints: G rows→[0…1…0], Σ⁻¹ decoupled with noise⁻² diag
            G_dt = _zero_rows(G_dt, bmask, 1.0)
            Sigma_inv = _decouple_rows_cols(
                Sigma_inv, bmask, self.constraint_noise ** (-2.0)
            )

        GtS = G_dt.T @ Sigma_inv
        F_inv = GtS @ G_dt
        AtFA = (spdiag(M.diagonal()) @ Sigma_inv) @ spdiag(M.diagonal())
        F_inv_A = GtS @ spdiag(M.diagonal())

        mid = F_inv + AtFA
        diag_blocks = [x0.Q + AtFA] + [mid] * (Nt - 2) + [F_inv]
        off_blocks = [F_inv_A * -1.0] * (Nt - 1)
        Q_joint = sp_block_tridiag(diag_blocks, off_blocks).symmetrize()

        # per-step means μᵢ = G⁻¹(M μᵢ₋₁), μ₀ = mean(x₀) (zero here); only the
        # Dirichlet inhomogeneity can make them nonzero, so skip the scan
        # entirely in the common homogeneous case.
        bvals = np.broadcast_to(
            np.asarray(boundary_values, dtype=np.float64).ravel(),
            (len(bnodes),) if bnodes is not None else (0,),
        )
        mu0_nonzero = bool(np.any(np.asarray(x0.mean) != 0.0))
        if mu0_nonzero or (bnodes is not None and np.any(bvals != 0.0)):
            from ..solvers.base import DENSE_AUTO_MAX

            mean = _ssm_means(
                G_dt, M.diagonal(), x0.mean, Nt, bnodes, bvals, DENSE_AUTO_MAX
            ) + float(mean_offset)
        else:
            mean = jnp.full((Ns * Nt,), float(mean_offset))
        joint = GMRF.from_precision(mean, Q_joint, solver)
        return SpatiotemporalGMRF(joint, Nt, disc, ts=ts)


def kronecker_product_spatiotemporal_model(
    Q_t: SparseMatrix, Q_s: SparseMatrix, disc: FEMDiscretization, solver: SolverSpec = SolverSpec()
) -> SpatiotemporalGMRF:
    """Q_st = Q_t ⊗ Q_s (time ⊗ space, space fastest — R-INLA convention)."""
    Q = sp_kron(Q_t, Q_s)
    N_t = Q_t.shape[0]
    g = GMRF.from_precision(jnp.zeros(Q.shape[0]), Q, solver)
    return SpatiotemporalGMRF(g, N_t, disc)


def product_matern(
    temporal_spde_smoothness: int,
    kappa_t: float,
    N_t: int,
    spatial_spde: MaternSPDE,
    kappa_s: float,
    solver: SolverSpec = SolverSpec(),
) -> SpatiotemporalGMRF:
    """Temporal Matérn on an inflated 1D grid × spatial Matérn (reference
    matern_spde.jl:424-448 `product_matern`: 10% offset padding on the
    temporal grid, then the interior slice of the temporal precision)."""
    from .mesh import interval_mesh

    offset = N_t // 10
    n_temp = N_t + 2 * offset
    tdisc = FEMDiscretization(interval_mesh(0.0, float(n_temp - 1), n_temp))
    tspde = MaternSPDE(tdisc, smoothness=temporal_spde_smoothness)
    Q_t_full = tspde.precision(kappa_t)
    # interior slice (dense is fine: temporal dimension is small)
    Qt_dense = Q_t_full.todense()[offset : offset + N_t, offset : offset + N_t]
    from ..sparse.matrix import from_dense

    Q_t = from_dense(Qt_dense, tol=0.0)
    Q_s = spatial_spde.precision(kappa_s)
    return kronecker_product_spatiotemporal_model(Q_t, Q_s, spatial_spde.disc, solver)
