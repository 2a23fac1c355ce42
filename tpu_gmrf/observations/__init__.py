from .base import ObservationModel, ObservationLikelihood
from .exponential_family import (
    ExponentialFamily,
    EFLikelihood,
    Predictive,
    apply_invlink,
    apply_link,
    conditional_distribution,
    IdentityLink,
    LogLink,
    LogitLink,
    PoissonObservations,
    BinomialObservations,
    NegativeBinomialObservations,
)
from .linearly_transformed import (
    LinearlyTransformedObservationModel,
    LinearlyTransformedLikelihood,
    ParameterizedMatrix,
    ParameterizedOffset,
)
from .autodiff import (
    AutoDiffObservationModel,
    AutoDiffLikelihood,
    NonlinearLeastSquaresModel,
    ZeroLikelihood,
)
from .composite import CompositeObservationModel, CompositeLikelihood
from .structured import StructuredObservationModel, StructuredLikelihood, ObsFactorGroup

__all__ = [
    "ObservationModel",
    "ObservationLikelihood",
    "ExponentialFamily",
    "EFLikelihood",
    "Predictive",
    "apply_link",
    "apply_invlink",
    "conditional_distribution",
    "IdentityLink",
    "LogLink",
    "LogitLink",
    "PoissonObservations",
    "BinomialObservations",
    "NegativeBinomialObservations",
    "LinearlyTransformedObservationModel",
    "LinearlyTransformedLikelihood",
    "ParameterizedMatrix",
    "ParameterizedOffset",
    "AutoDiffObservationModel",
    "AutoDiffLikelihood",
    "NonlinearLeastSquaresModel",
    "ZeroLikelihood",
    "CompositeObservationModel",
    "CompositeLikelihood",
    "StructuredObservationModel",
    "StructuredLikelihood",
    "ObsFactorGroup",
]
