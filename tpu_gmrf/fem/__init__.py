from .mesh import (
    TriangleMesh,
    IntervalMesh,
    generate_mesh,
    create_inflated_rectangle,
    interval_mesh,
    icosphere,
)
from .discretization import FEMDiscretization, assemble_coo
from .spde import MaternSPDE, MaternModel, range_to_kappa, smoothness_to_nu
from .barrier import BarrierModel
from .obs_models import (
    PointDerivativeObsModel,
    PointEvaluationObsModel,
    PointSecondDerivativeObsModel,
)
from .spatiotemporal import (
    SpatiotemporalGMRF,
    AdvectionDiffusionSPDE,
    kronecker_product_spatiotemporal_model,
    product_matern,
    spatial_to_spatiotemporal,
    sp_block_tridiag,
)

__all__ = [
    "TriangleMesh",
    "IntervalMesh",
    "generate_mesh",
    "create_inflated_rectangle",
    "interval_mesh",
    "icosphere",
    "FEMDiscretization",
    "PointEvaluationObsModel",
    "PointDerivativeObsModel",
    "PointSecondDerivativeObsModel",
    "assemble_coo",
    "MaternSPDE",
    "MaternModel",
    "BarrierModel",
    "range_to_kappa",
    "smoothness_to_nu",
    "SpatiotemporalGMRF",
    "AdvectionDiffusionSPDE",
    "kronecker_product_spatiotemporal_model",
    "product_matern",
    "spatial_to_spatiotemporal",
    "sp_block_tridiag",
]
