from .hmc import hmc_kernel, hmc_init, HMCState, leapfrog
from .nuts import nuts_kernel, NUTSInfo
from .adaptation import da_init, da_update, welford_init, welford_update, welford_variance
from .run import run_nuts, run_hmc, NUTSResult
from .transforms import (
    Transform,
    LogTransform,
    LogitTransform,
    IdentityTransform,
    ParamSpec,
    make_logdensity,
)
from .vi import run_advi, ADVIResult
from .smc import run_smc, SMCResult
from .checkpoint import run_nuts_checkpointed

__all__ = [
    "hmc_kernel",
    "hmc_init",
    "HMCState",
    "leapfrog",
    "nuts_kernel",
    "NUTSInfo",
    "run_nuts",
    "run_hmc",
    "NUTSResult",
    "Transform",
    "LogTransform",
    "LogitTransform",
    "IdentityTransform",
    "ParamSpec",
    "make_logdensity",
    "run_advi",
    "ADVIResult",
    "run_smc",
    "run_nuts_checkpointed",
    "SMCResult",
]
