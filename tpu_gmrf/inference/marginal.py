"""Laplace marginal likelihood and latent-model entry points.

Reference spec: src/latent_models/gaussian_approximation.jl:16-27 —
log p(y|θ) ≈ log p(x*|θ) + log p(y|x*,θ) − log p_Laplace(x*|y,θ) at the
converged mode x*; constraint corrections enter through the constrained
logpdfs on both sides.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.base import LatentModel
from ..observations.base import ObservationLikelihood, ObservationModel
from .gaussian_approximation import GAOptions, gaussian_approximation

__all__ = ["marginal_loglikelihood", "laplace_marginal"]


def marginal_loglikelihood(prior, obs_lik: ObservationLikelihood, posterior=None, options: GAOptions = GAOptions()):
    """Laplace log p(y | θ) given a materialized prior GMRF and likelihood."""
    from ..models.nongaussian import LatentPrior

    if posterior is None:
        posterior = gaussian_approximation(prior, obs_lik, options=options)
    x_star = posterior.mean
    prior_lp = (
        prior.log_density(x_star)
        if isinstance(prior, LatentPrior)
        else prior.logpdf(x_star)
    )
    return prior_lp + obs_lik.loglik(x_star) - posterior.logpdf(x_star)


def laplace_marginal(
    model: LatentModel,
    obs_model: ObservationModel,
    y,
    theta: dict,
    options: GAOptions = GAOptions(),
):
    """End-to-end θ ↦ log p(y | θ): materialize the latent prior and the
    observation likelihood at θ, run the Laplace approximation, and return
    the marginal log-likelihood. Jittable and reverse-differentiable w.r.t.
    every θ entry (latent and observation hyperparameters alike) — the
    INLA/TMB/HMC objective function.

    θ entries are routed by name: latent-model hyperparameters go to the
    model, the rest to the observation model factory.
    """
    latent_names = set(model.hyperparameters)
    theta_latent = {k: v for k, v in theta.items() if k in latent_names}
    theta_obs = {k: v for k, v in theta.items() if k not in latent_names}
    prior = model(**theta_latent)
    obs_lik = obs_model(y, **theta_obs)
    posterior = gaussian_approximation(prior, obs_lik, options=options)
    return marginal_loglikelihood(prior, obs_lik, posterior=posterior)
