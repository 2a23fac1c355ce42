from .pattern import SparsePattern, union_patterns, spgemm_pattern, diag_pattern
from .matrix import (
    SparseMatrix,
    from_dense,
    from_scipy,
    speye,
    spdiag,
    sp_block_diag,
    sp_kron,
)

__all__ = [
    "SparsePattern",
    "union_patterns",
    "spgemm_pattern",
    "diag_pattern",
    "SparseMatrix",
    "from_dense",
    "from_scipy",
    "speye",
    "spdiag",
    "sp_block_diag",
    "sp_kron",
]
