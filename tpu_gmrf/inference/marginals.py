"""Posterior linear-predictor marginals and pointwise model diagnostics.

Reference specs: src/linear_predictor_marginals.jl:1-195 (per-observation
η mean/variance with hard-constraint correction and selected-inverse
row-diagonals) and src/observation_models/observation_likelihood.jl:106-230
(pointwise_loglik-based WAIC/CPO support).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..constrained import ConstrainedGMRF
from ..observations.composite import CompositeLikelihood
from ..observations.exponential_family import EFLikelihood
from ..observations.linearly_transformed import LinearlyTransformedLikelihood
from ..sparse.matrix import SparseMatrix

__all__ = ["linear_predictor_marginals", "waic", "conditional_predictive_ordinates"]


_PAIR_PLAN_CACHE: dict = {}


def _pair_plan(pat):
    """Vectorized host plan for the per-row quadratic form
    v_p = Σ_{j,k∈row p} A_pj Σ_jk A_pk: for every row of A, all (j,k)
    column pairs, as flat arrays (row_of_pair, va, vb, jj, kk) plus a
    deduplicated Σ-entry pattern and the inverse map onto it. Cached per
    pattern (reference src/workspace/backend.jl:112-177 `selinv_extract_at`
    plays the same role)."""
    import numpy as np

    from ..sparse.pattern import SparsePattern

    plan = _PAIR_PLAN_CACHE.get(pat)
    if plan is not None:
        return plan
    indptr, cols = pat.indptr, pat.cols
    m, n = pat.shape
    c = np.diff(indptr).astype(np.int64)
    P = c * c
    total = int(P.sum())
    row_of_pair = np.repeat(np.arange(m, dtype=np.int64), P)
    start = np.repeat(np.cumsum(P) - P, P)
    t = np.arange(total, dtype=np.int64) - start
    cw = np.maximum(np.repeat(c, P), 1)
    base = np.repeat(indptr[:-1].astype(np.int64), P)
    va = base + t // cw
    vb = base + t % cw
    jj = cols[va].astype(np.int64)
    kk = cols[vb].astype(np.int64)
    key = jj * n + kk
    uniq, inv = np.unique(key, return_inverse=True)
    sig_pat = SparsePattern(uniq // n, uniq % n, (n, n))
    plan = (row_of_pair, va, vb, jj, kk, sig_pat, inv)
    _PAIR_PLAN_CACHE[pat] = plan
    return plan


def _row_diag_ASigmaAt(A, ga):
    """diag(A Σ Aᵀ) via the posterior's inverse restricted to the needed
    entries. For SparseMatrix A the Σ entries come from ONE selected-inverse
    pass over the deduplicated (j,k) pattern (reference `selinv_extract_at`,
    src/workspace/backend.jl:112-177); pairs outside the factor's fill
    envelope fall back to identity-column solves. Dense A uses full rows."""
    base = ga.base if isinstance(ga, ConstrainedGMRF) else ga
    if isinstance(A, SparseMatrix):
        row_of_pair, va, vb, jj, kk, sig_pat, inv = _pair_plan(A.pattern)
        try:
            Sig_uniq = base.factor.selinv(sig_pat).data
        except (ValueError, NotImplementedError):
            Sig_uniq = _inverse_entries(base, sig_pat.rows, sig_pat.cols)
        prod = A.data[va] * A.data[vb] * Sig_uniq[jnp.asarray(inv)]
        v = jax.ops.segment_sum(
            prod, jnp.asarray(row_of_pair), num_segments=A.pattern.shape[0]
        )
    else:
        Sig_rows = base.factor.solve(A.T)  # (n, m) = Σ Aᵀ
        v = jnp.sum(A * Sig_rows.T, axis=1)
    if isinstance(ga, ConstrainedGMRF):
        # subtract diag(A·Ã·L_c⁻ᵀ L_c⁻¹·Ãᵀ·Aᵀ)
        AAt = A.matvec(ga.A_tilde_T) if isinstance(A, SparseMatrix) else A @ ga.A_tilde_T
        B = jsl.solve_triangular(ga.L_c, AAt.T, lower=True)  # (m_c, m)
        v = v - jnp.sum(B * B, axis=0)
    return jnp.maximum(v, 0.0)


def _inverse_entries(base, jj, kk):
    """Σ entries at arbitrary (j, k) positions — exact identity-column
    solves; the fallback when (j, k) lies outside the factor's envelope."""
    import numpy as np

    uniq_cols = np.unique(np.asarray(kk))
    n = base.n
    eye_cols = jnp.zeros((n, len(uniq_cols))).at[jnp.asarray(uniq_cols), jnp.arange(len(uniq_cols))].set(1.0)
    Sig_cols = base.factor.solve(eye_cols.astype(base.dtype))  # (n, u)
    col_pos = {int(c): i for i, c in enumerate(uniq_cols)}
    sel = jnp.asarray(np.asarray([col_pos[int(c)] for c in kk]))
    return Sig_cols[jnp.asarray(jj), sel]


def linear_predictor_marginals(ga, obs_lik):
    """(μ_η, v_η, eta_likelihood): posterior mean/variance of each
    observation's linear predictor, plus a likelihood re-indexed to consume
    μ_η directly."""
    if isinstance(obs_lik, EFLikelihood):
        mu = ga.mean
        v = ga.var()
        if obs_lik.indices is None:
            return mu, v, obs_lik
        idx = obs_lik.indices
        return (
            mu[idx],
            v[idx],
            dataclasses.replace(obs_lik, indices=None),
        )
    if isinstance(obs_lik, LinearlyTransformedLikelihood):
        A = obs_lik.A
        mu_eta = A.matvec(ga.mean) if isinstance(A, SparseMatrix) else A @ ga.mean
        if obs_lik.b is not None:
            mu_eta = mu_eta + obs_lik.b
        v_eta = _row_diag_ASigmaAt(A, ga)
        return mu_eta, v_eta, obs_lik.base
    if isinstance(obs_lik, CompositeLikelihood):
        parts = [linear_predictor_marginals(ga, c) for c in obs_lik.components]
        mu = jnp.concatenate([p[0] for p in parts])
        v = jnp.concatenate([p[1] for p in parts])
        comps = []
        off = 0
        import numpy as np

        for p in parts:
            m = p[0].shape[0]
            lik = p[2]
            if isinstance(lik, EFLikelihood):
                lik = dataclasses.replace(lik, indices=jnp.arange(off, off + m))
            comps.append(lik)
            off += m
        return mu, v, CompositeLikelihood(components=tuple(comps))
    raise TypeError(f"unsupported likelihood type {type(obs_lik)}")


def waic(posterior, obs_lik, key, num_samples: int = 200):
    """Watanabe-Akaike information criterion from posterior samples:
    elpd_i = log E[p(y_i|x)] − Var[log p(y_i|x)]; returns (waic, elpd, p_eff)."""
    xs = posterior.sample(key, (num_samples,))
    lps = jax.vmap(obs_lik.pointwise_loglik)(xs)  # (S, m)
    lppd = jax.scipy.special.logsumexp(lps, axis=0) - jnp.log(num_samples)
    p_eff = jnp.var(lps, axis=0, ddof=1)
    elpd = jnp.sum(lppd - p_eff)
    return -2.0 * elpd, elpd, jnp.sum(p_eff)


def conditional_predictive_ordinates(posterior, obs_lik, key, num_samples: int = 200):
    """CPO_i = (E[1/p(y_i|x)])⁻¹ (harmonic-mean estimator)."""
    xs = posterior.sample(key, (num_samples,))
    lps = jax.vmap(obs_lik.pointwise_loglik)(xs)
    log_cpo = jnp.log(num_samples) - jax.scipy.special.logsumexp(-lps, axis=0)
    return log_cpo
