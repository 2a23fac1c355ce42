"""Laplace / Fisher-scoring gaussian approximation.

Reference spec: src/arithmetic/condition/gaussian_approximation.jl:11-421 —
Newton with backtracking line search (α ← √α on accept, α ← 0.1α on
shrink, force-accept when α‖step‖∞ < tol/1000), KKT constraint projection,
convergence on Newton decrement / mean change, conjugate short-circuit for
Normal-identity likelihoods, final refactorization at the converged mode.

TPU-native architecture:
- the whole Newton iteration is a `lax.while_loop` over fixed-pattern
  refactorizations (the posterior pattern = prior ∪ obs-Hessian union is
  frozen at trace time, so every iteration is the same compiled kernel);
- differentiation splits at the mode: `_newton_mode` carries a
  `jax.custom_jvp` implementing implicit-function-theorem differentiation
  (the math of reference ext/forwarddiff/autodiff_likelihood_ift.jl:1-27:
  primal Newton, then tangent dx* = −Q_post⁻¹·∂score/∂θ·θ̇ with KKT
  projection when constrained). Because the tangent map is linear, JAX
  derives reverse mode by transposition — one rule yields BOTH `jax.jvp`
  (forward-over-reverse Hessians of the θ-posterior) and `jax.vjp` (the
  IFT pullback of reference src/autodiff/gaussian_approximation.jl:95-371).
  The posterior precision `Q_post = Q_prior − H(x*)` differentiates by
  ordinary JAX AD — explicit and implicit θ-paths compose exactly as in
  the reference's A.2 recipe.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..constrained import ConstrainedGMRF
from ..gmrf import GMRF
from ..observations.base import ObservationLikelihood
from ..observations.exponential_family import EFLikelihood
from ..solvers.base import SolverSpec, factorize
from ..sparse.matrix import SparseMatrix, spdiag
from ..sparse.pattern import union_patterns

__all__ = ["gaussian_approximation", "GAOptions"]


@dataclasses.dataclass(frozen=True)
class GAOptions:
    max_iter: int = 50
    mean_change_tol: float = 1e-4
    newton_dec_tol: float = 1e-5
    adaptive_stepsize: bool = True
    max_linesearch_iter: int = 10
    # static flag: per-iteration Newton diagnostics via jax.debug.print
    # (the reference's `verbose=true` path); zero overhead when False
    verbose: bool = False
    # solver for the Newton-iteration factorizations (auto: tridiagonal
    # posteriors use the O(n) scan backend, others batched dense on MXU)
    inner_solver: SolverSpec = SolverSpec()


def _posterior_pair(Q_p: SparseMatrix, H: SparseMatrix):
    """Q_prior − H on the fixed union pattern."""
    pat = union_patterns(Q_p.pattern, H.pattern)
    return Q_p.pad_to(pat) - H.pad_to(pat)


def _loghessian(obs_lik, x) -> SparseMatrix:
    if obs_lik.hessian_kind == "diag":
        return spdiag(obs_lik.loghessian_diag(x))
    return obs_lik.loghessian(x)


def _project_step(step, factor, A, L_c_builder=None):
    """Remove the constraint-normal component: step ← step − Ã(AÃᵀ)⁻¹A·step
    (reference `_constrain_step`, gaussian_approximation.jl:40-58)."""
    At_T = factor.solve(A.T)  # (n, m)
    L_c = jnp.linalg.cholesky(A @ At_T)
    return step - At_T @ jsl.cho_solve((L_c, True), A @ step), (At_T, L_c)




@partial(jax.custom_jvp, nondiff_argnums=(0,))
def _newton_mode(opts: GAOptions, Q_p, mu_p, obs_lik, x0, A):
    return _newton_mode_impl(opts, Q_p, mu_p, obs_lik, x0, A)


def _newton_mode_impl(opts, Q_p, mu_p, obs_lik, x0, A):
    h = Q_p.matvec(mu_p)

    def energy(x):
        return 0.5 * Q_p.quad(x) - h @ x

    def merit(x):
        return energy(x) - obs_lik.loglik(x)

    def line_search(x_k, step, alpha):
        obj_current = merit(x_k)
        inf_step = jnp.max(jnp.abs(step))

        def cond(s):
            it, _, _, accepted, _ = s
            return (~accepted) & (it < opts.max_linesearch_iter)

        def body(s):
            it, alpha, x_new, accepted, alpha_next = s
            candidate = x_k - alpha * step
            good = merit(candidate) <= obj_current
            alpha_shrunk = alpha * 0.1
            tiny = alpha_shrunk * inf_step < opts.newton_dec_tol / 1000.0
            acc = good | tiny
            x_new = jnp.where(acc, candidate, x_new)
            alpha_next = jnp.where(
                good, jnp.sqrt(alpha), jnp.where(tiny, alpha_shrunk, alpha_next)
            )
            return it + 1, alpha_shrunk, x_new, accepted | acc, alpha_next

        # NaN merit at x_k: skip the search entirely (non-finite exit below)
        init = (0, alpha, x_k, ~jnp.isfinite(obj_current), alpha)
        it, alpha_cur, x_new, accepted, alpha_next = jax.lax.while_loop(
            cond, body, init
        )
        x_new = jnp.where(accepted, x_new, x_k - alpha_cur * step)
        alpha_out = jnp.where(accepted, alpha_next, alpha_cur)
        return x_new, alpha_out

    def newton_body(state):
        x_k, alpha, it, _ = state
        H_k = _loghessian(obs_lik, x_k)
        g_l = obs_lik.loggrad(x_k)
        Q_post = _posterior_pair(Q_p, H_k)
        factor = factorize(Q_post, opts.inner_solver)
        neg_score = (Q_p.matvec(x_k) - h) - g_l
        step = factor.solve(neg_score)
        if A is not None:
            step, _ = _project_step(step, factor, A)
        if opts.adaptive_stepsize:
            x_new, alpha = line_search(x_k, step, alpha)
        else:
            x_new = x_k - step
        newton_dec = neg_score @ step
        mean_change = jnp.linalg.norm(x_new - x_k)
        rel_change = mean_change / jnp.maximum(jnp.linalg.norm(x_k), 1e-10)
        converged = (
            (newton_dec < opts.newton_dec_tol)
            | (mean_change < opts.mean_change_tol)
            | (rel_change < opts.mean_change_tol)
        )
        # Non-finite iterates (failed factorization at extreme θ, f32
        # overflow) cannot recover — exit immediately instead of burning the
        # remaining iterations; the NaN posterior is rejected downstream
        # (NUTS treats NaN energy as divergence).
        converged = converged | ~jnp.isfinite(newton_dec) | ~jnp.isfinite(mean_change)
        if opts.verbose:
            jax.debug.print(
                "newton it={it}  dec={dec:.3e}  |dx|={mc:.3e}  alpha={a:.2e}",
                it=it, dec=newton_dec, mc=mean_change, a=alpha,
            )
        return x_new, alpha, it + 1, converged

    def newton_cond(state):
        _, _, it, converged = state
        return (~converged) & (it < opts.max_iter)

    x0 = jnp.asarray(x0)
    init = (x0, jnp.ones((), x0.dtype), 0, jnp.zeros((), bool))
    x_star, _, _, _ = jax.lax.while_loop(newton_cond, newton_body, init)
    return x_star


@_newton_mode.defjvp
def _newton_mode_jvp(opts, primals, tangents):
    """IFT tangent: solve Q_post·dx* = −∂score/∂p·ṗ at the primal mode
    (reference ext/forwarddiff/autodiff_likelihood_ift.jl:1-27, steps 1–3).
    Constrained case: KKT-project the tangent so A·dx* = A·dx0 (e = A·x0).
    The map ṗ ↦ dx* is linear, so `jax.linear_transpose` of this rule IS
    the reverse-mode IFT pullback of the reference
    (src/autodiff/gaussian_approximation.jl:278-347) — one rule, both modes.
    """
    Q_p, mu_p, obs_lik, x0, A = primals
    dQ, dmu, dlik, dx0, _dA = tangents  # A is structural: dA ignored
    x_star = _newton_mode_impl(opts, Q_p, mu_p, obs_lik, x0, A)
    H = _loghessian(obs_lik, x_star)
    Q_post = _posterior_pair(Q_p, H)
    factor = factorize(Q_post, opts.inner_solver)

    def score(Q_p_, mu_p_, obs_lik_):
        return Q_p_.matvec(x_star - mu_p_) - obs_lik_.loggrad(x_star)

    _, dscore = jax.jvp(score, (Q_p, mu_p, obs_lik), (dQ, dmu, dlik))
    # The tangent solve rides lax.custom_linear_solve so reverse mode
    # transposes it as "solve the (symmetric) system again" instead of
    # transposing the backend's internal scans — scan transposition breaks
    # on the banded backend's blocked solves (ValAccum leak), and opacity
    # is the right semantics anyway: the factor is a primal constant here.
    def _opaque_solve(b):
        return jax.lax.custom_linear_solve(
            Q_post.matvec, b, lambda _mv, rhs: factor.solve(rhs), symmetric=True
        )

    dx = _opaque_solve(-dscore)
    if A is not None:
        # KKT tangent system: project so the constraint residual tangent
        # A·dx − A·dx0 vanishes (e-sensitivity enters through x0).
        At_T = factor.solve(A.T)
        L_c = jnp.linalg.cholesky(A @ At_T)
        dx = dx - At_T @ jsl.cho_solve((L_c, True), A @ dx - A @ dx0)
    return x_star, dx


# ---- non-Gaussian latent priors (iterated re-linearization, TMB-style) -----


@partial(jax.custom_jvp, nondiff_argnums=(0,))
def _newton_mode_nl(opts: GAOptions, prior, obs_lik, x0):
    return _newton_mode_nl_impl(opts, prior, obs_lik, x0)


def _newton_mode_nl_impl(opts, prior, obs_lik, x0):
    """Newton with per-iterate prior re-linearization
    (reference `_prior_local` on the LatentPrior adapter,
    src/latent_models/local_quadratic.jl:100-140): the line-search merit
    uses the EXACT prior log-density."""

    def merit(x):
        return -prior.log_density(x) - obs_lik.loglik(x)

    def line_search(x_k, step, alpha):
        obj_current = merit(x_k)
        inf_step = jnp.max(jnp.abs(step))

        def cond(s):
            it, _, _, accepted, _ = s
            return (~accepted) & (it < opts.max_linesearch_iter)

        def body(s):
            it, alpha, x_new, accepted, alpha_next = s
            candidate = x_k - alpha * step
            good = merit(candidate) <= obj_current
            alpha_shrunk = alpha * 0.1
            tiny = alpha_shrunk * inf_step < opts.newton_dec_tol / 1000.0
            acc = good | tiny
            x_new = jnp.where(acc, candidate, x_new)
            alpha_next = jnp.where(
                good, jnp.sqrt(alpha), jnp.where(tiny, alpha_shrunk, alpha_next)
            )
            return it + 1, alpha_shrunk, x_new, accepted | acc, alpha_next

        init = (0, alpha, x_k, ~jnp.isfinite(obj_current), alpha)
        it, alpha_cur, x_new, accepted, alpha_next = jax.lax.while_loop(
            cond, body, init
        )
        x_new = jnp.where(accepted, x_new, x_k - alpha_cur * step)
        return jnp.where(accepted, x_new, x_k - alpha_cur * step), jnp.where(
            accepted, alpha_next, alpha_cur
        )

    def newton_body(state):
        x_k, alpha, it, _ = state
        Q_p, h = prior.local_quadratic(x_k)
        H_k = _loghessian(obs_lik, x_k)
        g_l = obs_lik.loggrad(x_k)
        Q_post = _posterior_pair(Q_p, H_k)
        factor = factorize(Q_post, opts.inner_solver)
        neg_score = (Q_p.matvec(x_k) - h) - g_l
        step = factor.solve(neg_score)
        if opts.adaptive_stepsize:
            x_new, alpha = line_search(x_k, step, alpha)
        else:
            x_new = x_k - step
        newton_dec = neg_score @ step
        mean_change = jnp.linalg.norm(x_new - x_k)
        rel_change = mean_change / jnp.maximum(jnp.linalg.norm(x_k), 1e-10)
        converged = (
            (newton_dec < opts.newton_dec_tol)
            | (mean_change < opts.mean_change_tol)
            | (rel_change < opts.mean_change_tol)
        )
        converged = converged | ~jnp.isfinite(newton_dec) | ~jnp.isfinite(mean_change)
        if opts.verbose:
            jax.debug.print(
                "newton it={it}  dec={dec:.3e}  |dx|={mc:.3e}  alpha={a:.2e}",
                it=it, dec=newton_dec, mc=mean_change, a=alpha,
            )
        return x_new, alpha, it + 1, converged

    def newton_cond(state):
        _, _, it, converged = state
        return (~converged) & (it < opts.max_iter)

    x0 = jnp.asarray(x0)
    init = (x0, jnp.ones((), x0.dtype), 0, jnp.zeros((), bool))
    x_star, _, _, _ = jax.lax.while_loop(newton_cond, newton_body, init)
    return x_star


@_newton_mode_nl.defjvp
def _newton_mode_nl_jvp(opts, primals, tangents):
    """IFT tangent for the re-linearized (non-Gaussian prior) Newton mode;
    linear in tangents, so reverse mode falls out by transposition."""
    prior, obs_lik, x0 = primals
    dprior, dlik, _dx0 = tangents  # mode is independent of the seed x0
    x_star = _newton_mode_nl_impl(opts, prior, obs_lik, x0)
    Q_p, _ = prior.local_quadratic(x_star)
    H = _loghessian(obs_lik, x_star)
    Q_post = _posterior_pair(Q_p, H)
    factor = factorize(Q_post, opts.inner_solver)

    def score(prior_, obs_lik_):
        return -jax.grad(prior_.log_density)(x_star) - obs_lik_.loggrad(x_star)

    _, dscore = jax.jvp(score, (prior, obs_lik), (dprior, dlik))
    return x_star, factor.solve(-dscore)


def _is_conjugate_normal(obs_lik) -> bool:
    return (
        isinstance(obs_lik, EFLikelihood)
        and obs_lik.family == "normal"
        and obs_lik.link == "identity"
        and obs_lik.offset is None
    )


def gaussian_approximation(
    prior,
    obs_lik: ObservationLikelihood,
    x0=None,
    options: GAOptions = GAOptions(),
    solver: SolverSpec | None = None,
):
    """Gaussian (Laplace) approximation to p(x | y) for a GMRF /
    ConstrainedGMRF / non-Gaussian LatentPrior prior and any observation
    likelihood. Fully jittable; reverse-mode differentiable w.r.t. prior and
    likelihood hyperparameters via IFT."""
    from ..models.nongaussian import LatentPrior

    if isinstance(prior, LatentPrior):
        solver = solver if solver is not None else SolverSpec()
        if x0 is None:
            x0 = jnp.zeros(prior.n)
        x_star = _newton_mode_nl(options, prior, obs_lik, x0)
        Q_p, _ = prior.local_quadratic(x_star)
        H = _loghessian(obs_lik, x_star)
        Q_post = _posterior_pair(Q_p, H)
        return GMRF.from_precision(x_star, Q_post, solver)

    constrained = isinstance(prior, ConstrainedGMRF)
    base = prior.base if constrained else prior
    A = prior.A if constrained else None
    solver = solver if solver is not None else base.solver

    from ..observations.linearly_transformed import LinearlyTransformedLikelihood

    if not constrained and _is_conjugate_normal(obs_lik):
        from .linear_condition import linear_condition

        # conjugate short-circuit (reference gaussian_approximation.jl:323-415)
        sigma = obs_lik.params["sigma"]
        prec = jnp.broadcast_to(1.0 / sigma**2, jnp.shape(obs_lik.y))
        return linear_condition(
            base,
            y=obs_lik.y,
            Q_eps=prec,
            indices=None if obs_lik.indices is None else obs_lik.indices,
        )
    if (
        not constrained
        and isinstance(obs_lik, LinearlyTransformedLikelihood)
        and _is_conjugate_normal(obs_lik.base)
        and obs_lik.base.indices is None
    ):
        from .linear_condition import linear_condition

        sigma = obs_lik.base.params["sigma"]
        prec = jnp.broadcast_to(1.0 / sigma**2, jnp.shape(obs_lik.base.y))
        return linear_condition(
            base, y=obs_lik.base.y, Q_eps=prec, A=obs_lik.A, b=obs_lik.b
        )

    if x0 is None:
        x0 = prior.mean if constrained else base.mean
    x_star = _newton_mode(options, base.Q, base.mean, obs_lik, x0, A)
    H = _loghessian(obs_lik, x_star)
    Q_post = _posterior_pair(base.Q, H)
    post = GMRF.from_precision(x_star, Q_post, solver)
    if constrained:
        return ConstrainedGMRF.create(post, prior.A, prior.e)
    return post
