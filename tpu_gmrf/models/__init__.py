from .base import LatentModel, process_constraint
from .ar import ARModel, AR1Model
from .rw import RWModel, RW1Model, RW2Model
from .iid import IIDModel, FixedEffectsModel
from .besag import BesagModel, BYM2Model
from .combined import CombinedModel
from .separable import SeparableModel
from .car import CARModel, generate_car_model
from .nongaussian import LatentPrior, AutoDiffLatentPrior, StructuredLatentPrior, FactorGroup, detect_hessian_pattern

__all__ = [
    "LatentModel",
    "process_constraint",
    "ARModel",
    "AR1Model",
    "RWModel",
    "RW1Model",
    "RW2Model",
    "IIDModel",
    "FixedEffectsModel",
    "BesagModel",
    "BYM2Model",
    "CombinedModel",
    "SeparableModel",
    "CARModel",
    "generate_car_model",
    "LatentPrior",
    "AutoDiffLatentPrior",
    "detect_hessian_pattern",
    "StructuredLatentPrior",
    "FactorGroup",
]
