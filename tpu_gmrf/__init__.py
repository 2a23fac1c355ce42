"""tpu-gmrf: TPU-native Gaussian Markov Random Field inference in JAX.

A from-scratch accelerator-first engine with the capabilities of
GaussianMarkovRandomFields.jl: sparse-precision Gaussian distributions,
latent model zoo (AR/RW/IID/Besag/BYM2/Combined/Separable/Matérn SPDE),
exponential-family observation models, Laplace `gaussian_approximation`,
marginal likelihoods with exact gradients, and native NUTS/HMC/VI/SMC
samplers sharded across TPU meshes.
"""

from .sparse import (
    SparseMatrix,
    SparsePattern,
    from_dense,
    from_scipy,
    sp_block_diag,
    sp_kron,
    spdiag,
    speye,
)
from .hoist import hoist_jit
from .solvers import SolverSpec, factorize
from .gmrf import GMRF, logpdf, sample
from .constrained import ConstrainedGMRF
from .metagmrf import GMRFMetadata, MetaGMRF
from .linear_maps import (
    ADJacobianMap,
    CholeskySqrtMap,
    OuterProductMap,
    SSMBidiagonalMap,
    SymmetricBlockTridiagonalMap,
    ZeroMap,
    block_tridiag_to_sparse,
    sparse_jacobian_map,
    sparse_hessian_map,
)
from .workspace import (
    GMRFWorkspace,
    WorkspacePool,
    make_workspace,
    make_workspace_pool,
)
from .geo import adjacency_from_shapefile, contiguity_adjacency, read_shapefile_polygons
from .models import (
    AR1Model,
    ARModel,
    BYM2Model,
    BesagModel,
    CARModel,
    CombinedModel,
    FixedEffectsModel,
    IIDModel,
    LatentModel,
    RW1Model,
    RW2Model,
    RWModel,
    SeparableModel,
    generate_car_model,
)
from .models.nongaussian import (
    AutoDiffLatentPrior,
    detect_hessian_pattern,
    FactorGroup,
    LatentPrior,
    StructuredLatentPrior,
)
from .observations import (
    AutoDiffObservationModel,
    BinomialObservations,
    CompositeObservationModel,
    conditional_distribution,
    ExponentialFamily,
    LinearlyTransformedObservationModel,
    NegativeBinomialObservations,
    NonlinearLeastSquaresModel,
    ObservationLikelihood,
    ParameterizedMatrix,
    ParameterizedOffset,
    ObservationModel,
    PoissonObservations,
    ZeroLikelihood,
)
from .inference import (
    GAOptions,
    gaussian_approximation,
    joint_gmrf,
    laplace_marginal,
    linear_condition,
    marginal_loglikelihood,
)
from .inference.marginals import (
    conditional_predictive_ordinates,
    linear_predictor_marginals,
    waic,
)
from .solvers.rbmc import rbmc_var
from .solvers.cg import cg_solve
from .kl_cholesky import approximate_gmrf_kl, reverse_maximin_ordering
from .graphical_lasso import graphical_lasso
from .fem import (
    AdvectionDiffusionSPDE,
    FEMDiscretization,
    IntervalMesh,
    MaternModel,
    MaternSPDE,
    SpatiotemporalGMRF,
    TriangleMesh,
    create_inflated_rectangle,
    generate_mesh,
    interval_mesh,
    kronecker_product_spatiotemporal_model,
    product_matern,
    spatial_to_spatiotemporal,
)
from .parallel import (
    pbtridiag_logdet,
    pbtridiag_solve,
    sharded_block_tridiag_solver,
)
from .samplers import (
    IdentityTransform,
    LogitTransform,
    LogTransform,
    ParamSpec,
    make_logdensity,
    run_advi,
    run_hmc,
    run_nuts,
    run_smc,
)

__version__ = "0.1.0"
