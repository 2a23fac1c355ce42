from .base import ObservationModel, ObservationLikelihood
from .exponential_family import (
    ExponentialFamily,
    EFLikelihood,
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
    "IdentityLink",
    "LogLink",
    "LogitLink",
    "PoissonObservations",
    "BinomialObservations",
    "NegativeBinomialObservations",
    "LinearlyTransformedObservationModel",
    "LinearlyTransformedLikelihood",
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
