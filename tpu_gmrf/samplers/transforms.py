"""Unconstraining transforms for hyperparameter sampling: map named
parameters with domain constraints to ℝᵈ (with log-Jacobian corrections) so
NUTS/HMC/VI run on unconstrained space."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["Transform", "LogTransform", "LogitTransform", "IdentityTransform", "ParamSpec", "make_logdensity"]


class Transform:
    """z (unconstrained) ↦ x (constrained), with log|dx/dz|."""

    def forward(self, z):
        raise NotImplementedError

    def log_jac(self, z):
        raise NotImplementedError

    def inverse(self, x):
        raise NotImplementedError


class IdentityTransform(Transform):
    forward = staticmethod(lambda z: z)
    inverse = staticmethod(lambda x: x)
    log_jac = staticmethod(lambda z: jnp.zeros(()))


class LogTransform(Transform):
    """x = exp(z) > 0."""

    forward = staticmethod(jnp.exp)
    inverse = staticmethod(jnp.log)
    log_jac = staticmethod(lambda z: z)


class LogitTransform(Transform):
    """x = lo + (hi-lo)·sigmoid(z) ∈ (lo, hi)."""

    def __init__(self, lo=0.0, hi=1.0):
        self.lo, self.hi = lo, hi

    def forward(self, z):
        return self.lo + (self.hi - self.lo) * jax.nn.sigmoid(z)

    def inverse(self, x):
        p = (x - self.lo) / (self.hi - self.lo)
        return jnp.log(p) - jnp.log1p(-p)

    def log_jac(self, z):
        return (
            jnp.log(self.hi - self.lo)
            + jax.nn.log_sigmoid(z)
            + jax.nn.log_sigmoid(-z)
        )


class ParamSpec:
    """Ordered named parameters with transforms and optional log-priors
    (evaluated on the constrained value)."""

    def __init__(self, **params):
        """params: name -> Transform | (Transform, log_prior_fn)."""
        self.names = tuple(params.keys())
        self.transforms = []
        self.log_priors = []
        for v in params.values():
            if isinstance(v, tuple):
                t, lp = v
            else:
                t, lp = v, None
            self.transforms.append(t)
            self.log_priors.append(lp)

    @property
    def dim(self):
        return len(self.names)

    def constrain(self, z):
        """z (dim,) → dict of constrained params."""
        return {
            name: t.forward(z[i])
            for i, (name, t) in enumerate(zip(self.names, self.transforms))
        }

    def unconstrain(self, theta: dict):
        return jnp.stack(
            [
                jnp.asarray(t.inverse(jnp.asarray(theta[name])))
                for name, t in zip(self.names, self.transforms)
            ]
        )

    def log_jac(self, z):
        return sum(t.log_jac(z[i]) for i, t in enumerate(self.transforms))

    def log_prior(self, z):
        out = jnp.zeros(())
        theta = self.constrain(z)
        for i, (name, lp) in enumerate(zip(self.names, self.log_priors)):
            if lp is not None:
                out = out + lp(theta[name])
        return out


def make_logdensity(loglik_fn: Callable, spec: ParamSpec):
    """Build the unconstrained log-density z ↦ loglik(θ(z)) + logprior(θ(z))
    + log|J(z)| for NUTS/VI/SMC."""

    def logdensity(z):
        theta = spec.constrain(z)
        return loglik_fn(theta) + spec.log_prior(z) + spec.log_jac(z)

    return logdensity
