"""Multi-chip distributed solvers (shard_map + XLA collectives over ICI).

The reference is single-process (SURVEY §2.K): its only handling of the
time axis of spatiotemporal models is *structural* (block-tridiagonal joint
precisions, reference ext/.../linear_ssm.jl:93-101). Here the time axis is
additionally *distributed*: block-tridiagonal systems are partitioned
across a device mesh and solved with neighbor collectives — the GMRF
analogue of sequence parallelism.
"""

from .pbtridiag import (
    pbtridiag_logdet,
    pbtridiag_solve,
    sharded_block_tridiag_solver,
)

__all__ = [
    "pbtridiag_solve",
    "pbtridiag_logdet",
    "sharded_block_tridiag_solver",
]
