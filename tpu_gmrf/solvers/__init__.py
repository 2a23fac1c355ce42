from .base import SolverSpec, factorize
from .dense import DenseFactor, dense_factorize
from .tridiag import TridiagFactor, tridiag_factorize
from .banded import BandedFactor, banded_factorize, banded_plan
from .supernodal import SupernodalFactor, supernodal_factorize, supernodal_plan
from .rbmc import rbmc_var
from .cg import cg_solve, jacobi_preconditioner, block_jacobi_preconditioner, temporal_block_gauss_seidel_preconditioner

__all__ = [
    "SolverSpec",
    "factorize",
    "DenseFactor",
    "dense_factorize",
    "TridiagFactor",
    "tridiag_factorize",
    "BandedFactor",
    "banded_factorize",
    "banded_plan",
    "SupernodalFactor",
    "supernodal_factorize",
    "supernodal_plan",
    "rbmc_var",
    "cg_solve",
    "jacobi_preconditioner",
    "block_jacobi_preconditioner",
    "temporal_block_gauss_seidel_preconditioner",
]
