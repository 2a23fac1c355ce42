"""Besag (ICAR) and BYM2 spatial latent models.

Reference specs: src/latent_models/besag.jl:48-215 (graph-Laplacian intrinsic
precision τ(D−W) with 1e-5 regularization, per-connected-component
sum-to-zero constraints, singleton policy, geometric-mean variance
normalization computed via a constrained-GMRF variance solve at
construction) and src/latent_models/bym2.jl:83-240 (Riebler 2016 2n-dim
stack [u*; v*] with blockdiag [τ/(1−φ)·Q*, τ/φ·I]).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import connected_components

from ..constrained import ConstrainedGMRF
from ..gmrf import GMRF
from ..sparse.matrix import SparseMatrix, from_scipy, sp_block_diag, spdiag
from ..solvers.base import SolverSpec
from .base import LatentModel, process_constraint, stack_constraints
from .rw import geomean

__all__ = ["BesagModel", "BYM2Model"]


class BesagModel(LatentModel):
    """Intrinsic CAR on a graph. Hyperparameter: tau."""

    name = "besag"

    def __init__(
        self,
        adjacency,
        regularization: float = 1e-5,
        normalize_var: bool = True,
        singleton_policy: str = "gaussian",
        additional_constraints=None,
        solver=None,
    ):
        W = sp.csr_matrix(adjacency).astype(np.float64)
        n = W.shape[0]
        if W.shape[1] != n:
            raise ValueError("adjacency must be square")
        if (abs(W - W.T)).nnz != 0:
            raise ValueError("adjacency must be symmetric")
        if W.diagonal().any():
            raise ValueError("adjacency must have zero diagonal")
        if regularization <= 0:
            raise ValueError("regularization must be positive")
        if singleton_policy not in ("gaussian", "degenerate"):
            raise ValueError("singleton_policy must be 'gaussian' or 'degenerate'")
        if additional_constraints == "sumtozero":
            raise ValueError(
                "BesagModel already includes sum-to-zero constraints; "
                "use additional_constraints only for extras"
            )
        self._n = n
        self.regularization = float(regularization)
        self.singleton_policy = singleton_policy
        if solver is not None:
            self.solver = solver
        self.additional = process_constraint(additional_constraints, n)

        ncomp, labels = connected_components(W, directed=False)
        self.components = [np.nonzero(labels == c)[0] for c in range(ncomp)]

        deg = np.asarray(W.sum(axis=1)).ravel()
        Q = sp.diags(deg) - W
        if singleton_policy == "gaussian":
            for comp in self.components:
                if len(comp) == 1:
                    Q = Q.tolil()
                    Q[comp[0], comp[0]] = 1.0
            Q = Q.tocsr()
        # Ensure diagonal entries exist even for degenerate singletons
        from ..sparse.pattern import diag_pattern, union_patterns

        Qm = from_scipy(sp.coo_matrix(Q))
        self._Qbase = Qm.pad_to(union_patterns(Qm.pattern, diag_pattern(n)))
        self._diag_pos = self._Qbase.pattern.diag_positions

        if normalize_var:
            self._norms = np.asarray(self._compute_normalization())
        else:
            self._norms = np.ones(n)

    def _constraint_matrix(self):
        comps = self.components
        if self.singleton_policy == "gaussian":
            comps = [c for c in comps if len(c) > 1]
        A = np.zeros((len(comps), self._n))
        for i, comp in enumerate(comps):
            A[i, comp] = 1.0
        return A

    def _compute_normalization(self):
        """Per-component geomean marginal variance of the constrained
        unscaled model (reference besag.jl `_compute_normalization`)."""
        data = self._Qbase.data.at[self._diag_pos].add(1e-5)
        g = GMRF.from_precision(
            jnp.zeros(self._n), self._Qbase.with_data(data), SolverSpec(kind="dense")
        )
        A = self._constraint_matrix()
        if A.shape[0] > 0:
            var = ConstrainedGMRF.create(g, jnp.asarray(A), jnp.zeros(A.shape[0])).var()
        else:
            var = g.var()
        var = np.asarray(var)
        norms = np.ones(self._n)
        for comp in self.components:
            if len(comp) > 1:
                norms[comp] = float(geomean(jnp.asarray(var[comp])))
        return norms

    @property
    def n(self):
        return self._n

    @property
    def hyperparameters(self):
        return ("tau",)

    def precision(self, tau) -> SparseMatrix:
        rows = self._Qbase.pattern.rows
        data = jnp.asarray(self._norms)[rows] * jnp.asarray(tau) * self._Qbase.data
        data = data.at[self._diag_pos].add(self.regularization)
        return self._Qbase.with_data(data)

    def constraints(self):
        A = self._constraint_matrix()
        builtin = (A, np.zeros(A.shape[0])) if A.shape[0] > 0 else None
        return stack_constraints(builtin, self.additional)


class BYM2Model(LatentModel):
    """Riebler (2016) BYM2: x = [u* (spatial, normalized Besag); v* (iid)].
    Hyperparameters: tau (overall precision), phi (mixing, 0<phi<1)."""

    name = "bym2"

    def __init__(self, adjacency, regularization: float = 1e-5, iid_constraint=None, solver=None, **besag_kw):
        from .iid import IIDModel

        self.besag = BesagModel(adjacency, regularization=regularization, normalize_var=True, **besag_kw)
        self._half = self.besag.n
        self.iid = IIDModel(self._half, constraint=iid_constraint)
        if solver is not None:
            self.solver = solver

    @property
    def n(self):
        return 2 * self._half

    @property
    def hyperparameters(self):
        return ("tau", "phi")

    def precision(self, tau, phi) -> SparseMatrix:
        tau = jnp.asarray(tau)
        phi = jnp.asarray(phi)
        Q_star = self.besag.precision(tau=1.0)
        Q_spatial = Q_star * (tau / (1.0 - phi))
        Q_unstruct = spdiag(jnp.full((self._half,), 1.0) * (tau / phi))
        return sp_block_diag([Q_spatial, Q_unstruct])

    def constraints(self):
        half = self._half
        parts = []
        bc = self.besag.constraints()
        if bc is not None:
            A, e = bc
            A_full = np.zeros((A.shape[0], 2 * half))
            A_full[:, :half] = A
            parts.append((A_full, e))
        ic = self.iid.constraints()
        if ic is not None:
            A, e = ic
            A_full = np.zeros((A.shape[0], 2 * half))
            A_full[:, half:] = A
            parts.append((A_full, e))
        return stack_constraints(*parts)
