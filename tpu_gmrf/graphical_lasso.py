"""Graphical lasso via thresholding + max-det chordal completion
(Zhang, Fattahi & Sojoudi).

Reference spec: src/graphical_lasso/graphical_lasso.jl:25-144 —
soft-threshold the sample covariance, then solve the maximum-determinant
positive-definite completion; the completion's inverse (the GMRF precision)
is supported on a chordal cover of the thresholded pattern and has the
decomposable-MLE closed form

  Q = Σ_cliques E_C (C_C)⁻¹ E_Cᵀ − Σ_separators E_S (C_S)⁻¹ E_Sᵀ

computed here with cliques bucketed by size and batched dense inverses on
the MXU (replacing CliqueTrees.complete!).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .gmrf import GMRF
from .solvers.base import SolverSpec
from .sparse.matrix import SparseMatrix
from .sparse.pattern import SparsePattern, union_patterns

__all__ = ["soft_threshold_cov", "chordal_cover", "graphical_lasso"]


def soft_threshold_cov(X: np.ndarray, threshold, shift: float = 0.0):
    """Soft-thresholded sample covariance (off-diagonals shrunk toward 0 by
    `threshold`; diagonal kept + optional shift). `threshold` may be a scalar
    λ or a sparse/dense per-entry penalty matrix Λ — the *restricted*
    graphical lasso (reference docs graphical_lasso.jl:68-80): entries outside
    Λ's pattern are forced to zero. Returns (C dense masked, pattern, mean)."""
    X = np.asarray(X, dtype=np.float64)
    m, n = X.shape
    mu = X.mean(axis=0)
    Xc = X - mu
    S = (Xc.T @ Xc) / m
    if np.isscalar(threshold):
        lam = float(threshold)
        allowed = None
    else:
        if isinstance(threshold, SparseMatrix):
            lam = np.asarray(threshold.todense())
        elif hasattr(threshold, "toarray"):
            lam = threshold.toarray()
        else:
            lam = np.asarray(threshold, dtype=np.float64)
        allowed = lam != 0.0
    C = np.where(S > lam, S - lam, np.where(S < -lam, S + lam, 0.0))
    if allowed is not None:
        C = np.where(allowed, C, 0.0)
    np.fill_diagonal(C, np.diag(S) + shift)
    pattern = SparsePattern.from_dense_mask(C != 0.0)
    return C, pattern, mu


def chordal_cover(pattern: SparsePattern):
    """Chordal cover by elimination fill (RCM ordering), plus a clique tree:
    returns (cover_pattern, cliques, separators) with cliques/separators as
    lists of original-index arrays."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    n = pattern.shape[0]
    S = pattern.to_scipy_bool()
    S = (S + S.T).tolil()
    perm = np.asarray(reverse_cuthill_mckee(S.tocsr(), symmetric_mode=True))
    inv_perm = np.empty_like(perm)
    inv_perm[perm] = np.arange(n)
    # adjacency in elimination (permuted) order
    adj = [set() for _ in range(n)]
    for i, j in zip(pattern.rows, pattern.cols):
        pi, pj = int(inv_perm[i]), int(inv_perm[j])
        if pi != pj:
            adj[pi].add(pj)
            adj[pj].add(pi)
    # elimination: connect higher neighbors
    higher = [None] * n
    for v in range(n):
        hn = sorted(u for u in adj[v] if u > v)
        higher[v] = hn
        for a_i in range(len(hn)):
            for b_i in range(a_i + 1, len(hn)):
                a, b = hn[a_i], hn[b_i]
                if b not in adj[a]:
                    adj[a].add(b)
                    adj[b].add(a)
    # maximal cliques of the filled (chordal) graph: candidates
    # C_v = {v} ∪ higher(v); C_v is non-maximal iff some earlier u with
    # v ∈ higher(u) has higher(u) ⊇ C_v
    filled_higher = [sorted(u for u in adj[v] if u > v) for v in range(n)]
    cand = [set([v]) | set(filled_higher[v]) for v in range(n)]
    maximal_idx = []
    for v in range(n):
        absorbed = False
        for u in range(n):
            if u != v and cand[v] < cand[u] or (cand[v] == cand[u] and u < v):
                absorbed = True
                break
        if not absorbed:
            maximal_idx.append(v)
    cliques_perm = [sorted(cand[v]) for v in maximal_idx]
    # junction tree = maximum-weight spanning tree of the clique graph with
    # weights |K_i ∩ K_j|; separators are the tree-edge intersections
    p_cl = len(cliques_perm)
    seps_perm = []
    if p_cl > 1:
        import scipy.sparse as _sp
        from scipy.sparse.csgraph import minimum_spanning_tree

        W = np.zeros((p_cl, p_cl))
        sets = [set(c) for c in cliques_perm]
        for i in range(p_cl):
            for j in range(i + 1, p_cl):
                w = len(sets[i] & sets[j])
                W[i, j] = W[j, i] = -w  # negate → max-weight via min spanning tree
        mst = minimum_spanning_tree(_sp.csr_matrix(W))
        ii, jj = mst.nonzero()
        for a, b in zip(ii, jj):
            inter = sorted(sets[a] & sets[b])
            if inter:
                seps_perm.append(inter)
    # cover pattern = all within-clique pairs
    rows, cols = [], []
    for c in cliques_perm:
        c = np.asarray(c)
        rows.append(np.repeat(c, len(c)))
        cols.append(np.tile(c, len(c)))
    allr = np.concatenate(rows)
    allc = np.concatenate(cols)
    uniq = np.unique(np.stack([allr, allc]), axis=1)
    cover_perm = SparsePattern(uniq[0], uniq[1], (n, n))
    # back to original indices
    cover = SparsePattern(perm[cover_perm.rows], perm[cover_perm.cols], (n, n))
    cliques = [np.sort(perm[np.asarray(c)]) for c in cliques_perm]
    separators = [np.sort(perm[np.asarray(s)]) for s in seps_perm]
    return cover, cliques, separators


def _batched_embed_inverses(C: np.ndarray, sets, sign: float, pattern: SparsePattern, data):
    """data += sign * Σ_s embed(inv(C[s, s])) — bucketed batched inverses."""
    pos = pattern.position_map()
    buckets: dict = {}
    for s in sets:
        buckets.setdefault(len(s), []).append(np.asarray(s))
    for size, group in buckets.items():
        idx = np.stack(group)  # (B, size)
        blocks = jnp.asarray(C)[idx[:, :, None], idx[:, None, :]]
        invs = jnp.linalg.inv(blocks)  # (B, size, size)
        positions = np.empty((len(group), size, size), dtype=np.int64)
        for b, s in enumerate(group):
            for a in range(size):
                for c in range(size):
                    positions[b, a, c] = pos[(int(s[a]), int(s[c]))]
        data = data.at[jnp.asarray(positions.ravel())].add(sign * invs.ravel())
    return data


def graphical_lasso(
    X: np.ndarray,
    threshold: float,
    shift: float = 0.0,
    solver: SolverSpec = SolverSpec(),
) -> GMRF:
    """Estimate a sparse-precision Gaussian from samples X (m, n)."""
    C, pattern, mu = soft_threshold_cov(X, threshold, shift)
    cover, cliques, separators = chordal_cover(pattern)
    data = jnp.zeros(cover.nnz)
    data = _batched_embed_inverses(C, cliques, 1.0, cover, data)
    if separators:
        data = _batched_embed_inverses(C, separators, -1.0, cover, data)
    Q = SparseMatrix(data, cover)
    return GMRF.from_precision(jnp.asarray(mu), Q.symmetrize(), solver)
