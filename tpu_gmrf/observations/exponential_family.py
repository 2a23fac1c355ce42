"""Exponential-family observation models.

Families Normal/Poisson/Bernoulli/Binomial/NegativeBinomial/Gamma/StudentT ×
links Identity/Log/Logit. Canonical-link gradients/Hessians use the closed
forms of reference src/observation_models/exponential_family/
canonical_implementations.jl:145-345 (table reproduced in SURVEY.md §A.1);
non-canonical links use exact JAX AD of the pointwise log-likelihood
(replacing the reference's chain-rule fallbacks,
fallback_implementations.jl:19-60 — XLA emits equivalent fused code).

Supports observation-index subsets (`indices`) and log-exposure offsets for
Poisson/NegBin (reference exponential_family.jl:239-270).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .base import ObservationLikelihood, ObservationModel

__all__ = [
    "ExponentialFamily",
    "IdentityLink",
    "LogLink",
    "LogitLink",
    "PoissonObservations",
    "BinomialObservations",
    "NegativeBinomialObservations",
    "EFLikelihood",
    "Predictive",
    "apply_link",
    "apply_invlink",
]

_LOG2PI = 1.8378770664093453


# ---- link functions --------------------------------------------------------


class Link:
    name: str

    @staticmethod
    def inv(eta):  # mu = g⁻¹(eta)
        raise NotImplementedError


class IdentityLink(Link):
    name = "identity"
    inv = staticmethod(lambda eta: eta)


class LogLink(Link):
    name = "log"
    inv = staticmethod(jnp.exp)


class LogitLink(Link):
    name = "logit"
    inv = staticmethod(jax.nn.sigmoid)


_LINKS = {"identity": IdentityLink, "log": LogLink, "logit": LogitLink}


def apply_invlink(link, eta):
    """μ = g⁻¹(η) for a link name or Link class (reference `apply_invlink`)."""
    if isinstance(link, str):
        link = _LINKS[link]
    return link.inv(eta)


def apply_link(link, mu):
    """η = g(μ) for a link name or Link class (reference `apply_link`)."""
    name = link if isinstance(link, str) else link.name
    if name == "identity":
        return mu
    if name == "log":
        return jnp.log(mu)
    if name == "logit":
        return jnp.log(mu) - jnp.log1p(-mu)
    raise ValueError(f"unknown link {name}")

_CANONICAL = {
    "normal": "identity",
    "poisson": "log",
    "bernoulli": "logit",
    "binomial": "logit",
    "negativebinomial": "log",
    "gamma": "log",
    "studentt": "identity",
}


# ---- observation containers ------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoissonObservations:
    """Counts with optional exposure (offset = log exposure)."""

    counts: Any
    logexposure: Any = None

    @staticmethod
    def create(counts, exposure=None):
        counts = jnp.asarray(counts)
        le = None if exposure is None else jnp.log(jnp.asarray(exposure))
        return PoissonObservations(counts, le)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BinomialObservations:
    successes: Any
    trials: Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NegativeBinomialObservations:
    counts: Any
    logexposure: Any = None

    @staticmethod
    def create(counts, exposure=None):
        counts = jnp.asarray(counts)
        le = None if exposure is None else jnp.log(jnp.asarray(exposure))
        return NegativeBinomialObservations(counts, le)


# ---- materialized likelihood ----------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EFLikelihood(ObservationLikelihood):
    """One class for all families; `family`/`link` are static so every
    family-specific branch resolves at trace time."""

    y: Any  # observations (counts / successes / values)
    params: Any  # dict of traced family parameters (sigma, r, phi, nu, trials)
    offset: Any  # log-exposure offset or None
    indices: Any  # int array (subset of latent) or None
    family: str = dataclasses.field(metadata=dict(static=True))
    link: str = dataclasses.field(metadata=dict(static=True))

    # -- plumbing --

    @property
    def canonical(self) -> bool:
        return _CANONICAL[self.family] == self.link

    def _eta(self, x):
        eta = x[self.indices] if self.indices is not None else x
        if self.offset is not None:
            eta = eta + self.offset
        return eta

    def _embed(self, g_obs, x):
        if self.indices is None:
            return g_obs
        return jnp.zeros_like(x).at[self.indices].add(g_obs)

    def _mu(self, eta):
        return _LINKS[self.link].inv(eta)

    # -- pointwise log-likelihood in eta (closed forms) --

    def _pointwise_eta(self, eta):
        y = self.y
        mu = self._mu(eta)
        f = self.family
        if f == "normal":
            sigma = self.params["sigma"]
            return -0.5 * _LOG2PI - jnp.log(sigma) - 0.5 * ((y - mu) / sigma) ** 2
        if f == "poisson":
            log_mu = eta if self.link == "log" else jnp.log(mu)
            return y * log_mu - mu - gammaln(y + 1.0)
        if f == "bernoulli":
            eta_l = eta if self.link == "logit" else jnp.log(mu) - jnp.log1p(-mu)
            return y * eta_l - jax.nn.softplus(eta_l)
        if f == "binomial":
            n = self.params["trials"]
            eta_l = eta if self.link == "logit" else jnp.log(mu) - jnp.log1p(-mu)
            return (
                y * eta_l
                - n * jax.nn.softplus(eta_l)
                + gammaln(n + 1.0)
                - gammaln(y + 1.0)
                - gammaln(n - y + 1.0)
            )
        if f == "negativebinomial":
            r = self.params["r"]
            return (
                gammaln(y + r)
                - gammaln(r)
                - gammaln(y + 1.0)
                + r * jnp.log(r)
                + y * jnp.log(mu)
                - (r + y) * jnp.log(r + mu)
            )
        if f == "gamma":
            phi = self.params["phi"]
            return (
                phi * jnp.log(phi)
                - gammaln(phi)
                + (phi - 1.0) * jnp.log(y)
                - phi * jnp.log(mu)
                - phi * y / mu
            )
        if f == "studentt":
            # unit-variance parameterization (reference canonical_implementations.jl:120-145)
            sigma, nu = self.params["sigma"], self.params["nu"]
            w = sigma**2 * (nu - 2.0)
            return (
                gammaln((nu + 1.0) / 2)
                - gammaln(nu / 2)
                - 0.5 * jnp.log(jnp.pi * (nu - 2.0))
                - jnp.log(sigma)
                - (nu + 1.0) / 2 * jnp.log1p((y - mu) ** 2 / w)
            )
        raise ValueError(f"unknown family {f}")

    # -- public API --

    def pointwise_loglik(self, x):
        return self._pointwise_eta(self._eta(x))

    def loglik(self, x):
        return jnp.sum(self._pointwise_eta(self._eta(x)))

    def _grad_hess_eta(self, eta):
        """(dℓ/dη, d²ℓ/dη²) per observation. Canonical links use the SURVEY
        §A.1 closed forms; otherwise exact per-element AD."""
        y, f = self.y, self.family
        if self.canonical:
            mu = self._mu(eta)
            if f == "normal":
                inv_s2 = 1.0 / self.params["sigma"] ** 2
                return (y - eta) * inv_s2, -inv_s2 * jnp.ones_like(eta)
            if f == "poisson":
                return y - mu, -mu
            if f == "bernoulli":
                return y - mu, -mu * (1.0 - mu)
            if f == "binomial":
                n = self.params["trials"]
                return y - n * mu, -n * mu * (1.0 - mu)
            if f == "negativebinomial":
                r = self.params["r"]
                return r * (y - mu) / (r + mu), -r * mu * (r + y) / (r + mu) ** 2
            if f == "gamma":
                phi = self.params["phi"]
                return phi * (y / mu - 1.0), -phi * y / mu
            if f == "studentt":
                sigma, nu = self.params["sigma"], self.params["nu"]
                w = sigma**2 * (nu - 2.0)
                resid = y - eta
                denom = w + resid**2
                return (nu + 1.0) * resid / denom, (nu + 1.0) * (
                    resid**2 - w
                ) / denom**2
        # non-canonical: exact per-observation AD, vectorized
        params_b = {
            k: jnp.broadcast_to(jnp.asarray(v), jnp.shape(self.y))
            for k, v in self.params.items()
        }

        def ll_i(e, yi, pi):
            sub = dataclasses.replace(self, y=yi, params=pi)
            return sub._pointwise_eta(e)

        g = jax.vmap(jax.grad(ll_i))(eta, self.y, params_b)
        h = jax.vmap(jax.grad(jax.grad(ll_i)))(eta, self.y, params_b)
        return g, h

    def loggrad(self, x):
        g, _ = self._grad_hess_eta(self._eta(x))
        return self._embed(g, x)

    def loghessian_diag(self, x):
        _, h = self._grad_hess_eta(self._eta(x))
        return self._embed(h, x)


# ---- predictive (conditional) distribution ---------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Predictive:
    """Predictive distribution p(y | x) at a fixed linear predictor — the
    reference's `conditional_distribution` return value
    (src/observation_models/exponential_family/exponential_family.jl:214-274,
    a Distributions.jl product distribution). TPU-native: a pytree with
    vectorized `mean`/`var`/`sample`/`logpdf` so predictions stay jittable.
    """

    eta: Any  # linear predictor, offset already applied
    params: Any  # family parameter dict (sigma, r, phi, nu, trials)
    family: str = dataclasses.field(metadata=dict(static=True))
    link: str = dataclasses.field(metadata=dict(static=True))

    def _lik(self, y) -> "EFLikelihood":
        return EFLikelihood(
            y=jnp.asarray(y),
            params=self.params,
            offset=None,
            indices=None,
            family=self.family,
            link=self.link,
        )

    @property
    def mu(self):
        return _LINKS[self.link].inv(self.eta)

    def mean(self):
        mu, f = self.mu, self.family
        if f == "binomial":
            return self.params["trials"] * mu
        return mu

    def var(self):
        mu, f = self.mu, self.family
        if f == "normal":
            return jnp.broadcast_to(self.params["sigma"] ** 2, jnp.shape(mu))
        if f == "poisson":
            return mu
        if f == "bernoulli":
            return mu * (1.0 - mu)
        if f == "binomial":
            return self.params["trials"] * mu * (1.0 - mu)
        if f == "negativebinomial":
            return mu + mu**2 / self.params["r"]
        if f == "gamma":
            return mu**2 / self.params["phi"]
        if f == "studentt":
            # unit-variance parameterization: Var = sigma² by construction
            return jnp.broadcast_to(self.params["sigma"] ** 2, jnp.shape(mu))
        raise ValueError(f"unknown family {f}")

    def std(self):
        return jnp.sqrt(self.var())

    def logpdf(self, y):
        """Pointwise log p(yᵢ | ηᵢ) — same closed forms as the likelihood."""
        return self._lik(y)._pointwise_eta(self.eta)

    def sample(self, key):
        mu, f = self.mu, self.family
        if f == "normal":
            return mu + self.params["sigma"] * jax.random.normal(
                key, jnp.shape(mu), mu.dtype
            )
        if f == "poisson":
            return jax.random.poisson(key, mu).astype(mu.dtype)
        if f == "bernoulli":
            return jax.random.bernoulli(key, mu).astype(mu.dtype)
        if f == "binomial":
            n = jnp.broadcast_to(self.params["trials"], jnp.shape(mu))
            return jax.random.binomial(key, n, mu).astype(mu.dtype)
        if f == "negativebinomial":
            # Gamma-Poisson mixture: λ ~ Gamma(r, μ/r), y ~ Poisson(λ)
            k1, k2 = jax.random.split(key)
            r = self.params["r"]
            lam = jax.random.gamma(k1, jnp.broadcast_to(r, jnp.shape(mu))) * mu / r
            return jax.random.poisson(k2, lam).astype(mu.dtype)
        if f == "gamma":
            phi = self.params["phi"]
            g = jax.random.gamma(key, jnp.broadcast_to(phi, jnp.shape(mu)))
            return g * mu / phi
        if f == "studentt":
            sigma, nu = self.params["sigma"], self.params["nu"]
            sigma_eff = sigma * jnp.sqrt((nu - 2.0) / nu)
            return mu + sigma_eff * jax.random.t(key, nu, jnp.shape(mu), mu.dtype)
        raise ValueError(f"unknown family {f}")


def conditional_distribution(obs_model, x, **params):
    """Predictive distribution of y given latent x under `obs_model`
    (reference src/observation_models/observation_model.jl:119-154).

    Dispatches on the model type: ExponentialFamily evaluates the inverse
    link at η = x[indices] (+ offset); LinearlyTransformed forwards η = Ax+b
    to its base; NonlinearLeastSquares returns Normal(f(x), σ).
    """
    return obs_model.conditional_distribution(x, **params)


# ---- factory ---------------------------------------------------------------


_FAMILY_ALIASES = {
    "normal": "normal",
    "gaussian": "normal",
    "poisson": "poisson",
    "bernoulli": "bernoulli",
    "binomial": "binomial",
    "negativebinomial": "negativebinomial",
    "negbin": "negativebinomial",
    "gamma": "gamma",
    "studentt": "studentt",
    "tdist": "studentt",
}

_FAMILY_PARAMS = {
    "normal": ("sigma",),
    "poisson": (),
    "bernoulli": (),
    "binomial": (),
    "negativebinomial": ("r",),
    "gamma": ("phi",),
    "studentt": ("sigma", "nu"),
}


class ExponentialFamily(ObservationModel):
    """`ExponentialFamily('poisson')(y)` → Poisson likelihood with log link.

    kwarg aliases (reference exponential_family.jl:113-122): pass e.g.
    `sigma='obs_sigma'` to rename a family parameter for the θ interface.
    """

    def __init__(self, family: str, link: str | None = None, indices=None, **aliases):
        family = _FAMILY_ALIASES[family.lower()]
        self.family = family
        self.link = link if link is not None else _CANONICAL[family]
        if self.link not in _LINKS:
            raise ValueError(f"unknown link {self.link}")
        self.indices = None if indices is None else jnp.asarray(indices)
        for k in aliases:
            if k not in _FAMILY_PARAMS[family]:
                raise ValueError(f"unknown parameter alias {k} for family {family}")
        self.aliases = aliases  # inner name -> outer kwarg name

    @property
    def hyperparameters(self):
        return tuple(
            self.aliases.get(p, p) for p in _FAMILY_PARAMS[self.family]
        )

    def conditional_distribution(self, x, **theta) -> Predictive:
        """Predictive p(y | x): η = x[indices] (+ offset), μ = g⁻¹(η)
        (reference exponential_family.jl:214-274)."""
        params = {}
        for p in _FAMILY_PARAMS[self.family]:
            outer = self.aliases.get(p, p)
            if outer in theta:
                params[p] = jnp.asarray(theta[outer])
            elif p != "trials":
                raise ValueError(f"missing family parameter: {outer}")
        if self.family == "binomial":
            if "trials" in theta:
                params["trials"] = jnp.asarray(theta["trials"])
            else:
                raise ValueError("binomial predictive requires trials=")
        eta = jnp.asarray(x)
        if self.indices is not None:
            eta = eta[self.indices]
        offset = theta.get("offset")
        if offset is not None:
            if self.link != "log":
                raise ValueError("offset only supported with log link")
            eta = eta + jnp.asarray(offset)
        return Predictive(eta=eta, params=params, family=self.family, link=self.link)

    def __call__(self, y, **theta) -> EFLikelihood:
        fam = self.family
        params = {}
        for p in _FAMILY_PARAMS[fam]:
            outer = self.aliases.get(p, p)
            if outer not in theta:
                raise ValueError(f"missing family parameter: {outer}")
            params[p] = jnp.asarray(theta[outer])
        offset = None
        if fam == "poisson":
            if isinstance(y, PoissonObservations):
                offset, y = y.logexposure, y.counts
            elif "offset" in theta:
                offset = jnp.asarray(theta["offset"])
        elif fam == "negativebinomial":
            if isinstance(y, NegativeBinomialObservations):
                offset, y = y.logexposure, y.counts
            elif "offset" in theta:
                offset = jnp.asarray(theta["offset"])
        elif fam == "binomial":
            if isinstance(y, BinomialObservations):
                params["trials"] = jnp.asarray(y.trials)
                y = y.successes
            elif "trials" in theta:
                params["trials"] = jnp.asarray(theta["trials"])
            else:
                raise ValueError("binomial requires BinomialObservations or trials=")
        if offset is not None and self.link != "log":
            raise ValueError("offset only supported with log link")
        return EFLikelihood(
            y=jnp.asarray(y),
            params=params,
            offset=offset,
            indices=self.indices,
            family=fam,
            link=self.link,
        )
