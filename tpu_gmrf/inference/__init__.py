from .gaussian_approximation import gaussian_approximation, GAOptions
from .linear_condition import linear_condition
from .marginal import marginal_loglikelihood, laplace_marginal
from .joint import joint_gmrf, sp_bmat
from .marginals import linear_predictor_marginals, waic, conditional_predictive_ordinates

__all__ = [
    "gaussian_approximation",
    "GAOptions",
    "linear_condition",
    "marginal_loglikelihood",
    "laplace_marginal",
    "joint_gmrf",
    "sp_bmat",
    "linear_predictor_marginals",
    "waic",
    "conditional_predictive_ordinates",
]
