from .base import SolverSpec, factorize
from .dense import DenseFactor, dense_factorize
from .tridiag import TridiagFactor, tridiag_factorize

__all__ = [
    "SolverSpec",
    "factorize",
    "DenseFactor",
    "dense_factorize",
    "TridiagFactor",
    "tridiag_factorize",
]
