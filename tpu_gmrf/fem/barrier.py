"""Barrier Matérn model (Bakka et al. 2019).

Reference spec: ext/GaussianMarkovRandomFieldsFEM/barrier_model.jl — a
non-stationary ν=1 Matérn in which correlation does not flow across
designated barrier triangles; barrier triangles get a small fixed range.

Precision (unscaled by τ):
    Q = (2/π) · Aᵀ C̃⁻¹ A
    A  = diag(C) + Σ_k (r_k²/8) G_k     (C = full lumped mass)
    C̃  = diag(Σ_k r_k² c_k)             (range²-weighted lumped mass)
with per-region stiffness G_k and region-restricted lumped mass c_k.
With a uniform range this reduces to the stationary ν=1 Matérn.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.base import LatentModel, process_constraint
from ..sparse.matrix import SparseMatrix, spdiag
from ..sparse.pattern import diag_pattern, union_patterns
from .discretization import FEMDiscretization, assemble_coo

__all__ = ["BarrierModel"]


class BarrierModel(LatentModel):
    """Hyperparameters: (tau, range); barrier triangles use
    `range_fraction * range`."""

    name = "barrier"

    def __init__(
        self,
        disc: FEMDiscretization,
        barrier_elements,
        range_fraction: float = 0.01,
        constraint=None,
        solver=None,
    ):
        if disc.intrinsic_dim != 2:
            raise ValueError("BarrierModel supports 2D discretizations only")
        self.disc = disc
        self.range_fraction = float(range_fraction)
        barrier = np.zeros(disc.mesh.n_elements, bool)
        barrier[np.asarray(barrier_elements, dtype=np.int64)] = True
        self.barrier_mask = barrier
        n = disc.ndofs
        tris = disc.mesh.triangles
        areas = disc.areas
        grads = disc.grads

        def region_matrices(mask):
            if not mask.any():
                G = assemble_coo([0], [0], [0.0], (n, n))
                c = np.zeros(n)
                return G, c
            t = tris[mask]
            A = areas[mask]
            g = grads[mask]
            Ge = np.einsum("mkd,mld->mkl", g, g) * A[:, None, None]
            rows = np.repeat(t, 3, axis=1).ravel()
            cols = np.tile(t, (1, 3)).ravel()
            G = assemble_coo(rows, cols, Ge.ravel(), (n, n))
            c = np.zeros(n)
            for k in range(3):
                np.add.at(c, t[:, k], A / 3.0)
            return G, c

        self.G_normal, self.c_normal = region_matrices(~barrier)
        self.G_barrier, self.c_barrier = region_matrices(barrier)
        self.C_diag = jnp.asarray(self.c_normal + self.c_barrier)
        # fixed A-pattern: diag ∪ G_normal ∪ G_barrier
        self.A_pattern = union_patterns(
            diag_pattern(n), self.G_normal.pattern, self.G_barrier.pattern
        )
        self._Gn = self.G_normal.pad_to(self.A_pattern)
        self._Gb = self.G_barrier.pad_to(self.A_pattern)
        self._diag_pos = self.A_pattern.diag_positions
        self.constraint = process_constraint(constraint, n)
        if solver is not None:
            self.solver = solver

    @property
    def n(self):
        return self.disc.ndofs

    @property
    def hyperparameters(self):
        return ("tau", "range")

    def precision(self, tau, range) -> SparseMatrix:
        r1 = jnp.asarray(range)
        r2 = self.range_fraction * r1
        A_data = (r1**2 / 8.0) * self._Gn.data + (r2**2 / 8.0) * self._Gb.data
        A_data = A_data.at[self._diag_pos].add(self.C_diag)
        A = self._Gn.with_data(A_data)
        ctilde = r1**2 * jnp.asarray(self.c_normal) + r2**2 * jnp.asarray(self.c_barrier)
        Q = A.T @ (spdiag(1.0 / ctilde) @ A)
        Q = Q * ((2.0 / jnp.pi) * jnp.asarray(tau))
        return Q.symmetrize() if Q.pattern.is_symmetric else Q

    def constraints(self):
        return self.constraint
