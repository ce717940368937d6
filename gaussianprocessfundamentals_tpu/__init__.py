"""gaussianprocessfundamentals_tpu — a TPU-native Gaussian-process engine.

A from-scratch JAX/XLA/Pallas redesign with the capabilities of the reference
``gpbasics`` library (Bernsai/GaussianProcessFundamentals): composable
kernel/mean expression grammars, exact and approximate GP inference,
hyperparameter fitting, model-selection metrics — plus TPU-first additions the
reference lacks (Pallas Gram kernels, sharded multi-chip covariance algebra,
HMC/NUTS, SVGP).

Quick start::

    import gaussianprocessfundamentals_tpu as gpf
    k = gpf.SquaredExponentialKernel(scaled=True)
    gp = gpf.GaussianProcess(k)
    gp.fit(x, y, optimize_noise=True)
    mu, mean_mu, post_mu = gp.predict(x_test)
"""
from gaussianprocessfundamentals_tpu.config import (
    ChangePointGate,
    DEFAULT_CONFIG,
    GPConfig,
    enable_x64,
)
from gaussianprocessfundamentals_tpu.kernels.base import Kernel, kernel_from_dict
from gaussianprocessfundamentals_tpu.kernels.leaves import (
    ConstantKernel,
    LinearKernel,
    Matern32Kernel,
    Matern52Kernel,
    PeriodicKernel,
    RBFKernel,
    RationalQuadraticKernel,
    SquaredExponentialKernel,
    WhiteNoiseKernel,
)
from gaussianprocessfundamentals_tpu.kernels.operators import (
    ChangePoint,
    Product,
    Sum,
)
from gaussianprocessfundamentals_tpu.means.functions import (
    ConstantMean,
    ExponentialMean,
    LinearMean,
    LogitMean,
    MeanChangePoint,
    MeanFunction,
    MeanProduct,
    MeanSum,
    ZeroMean,
    mean_from_dict,
)
from gaussianprocessfundamentals_tpu.models.exact import (
    GaussianProcess,
    Posterior,
    posterior,
    sample_posterior,
    sample_prior,
)
from gaussianprocessfundamentals_tpu.fit.fit import (
    FitResult,
    fit,
    fit_batch_independent,
    make_nll,
)
from gaussianprocessfundamentals_tpu.models.rff import (
    pathwise_posterior_samples,
    rff_features,
    rff_init,
    rff_prior_sample,
)
from gaussianprocessfundamentals_tpu.models.search import greedy_kernel_search
from gaussianprocessfundamentals_tpu.kernels.partition import (
    BoxPartitioning,
    DistancePartitioning,
    Partition,
)
from gaussianprocessfundamentals_tpu.models.segmented import (
    BlockwiseGP,
    PartitionedGP,
)
from gaussianprocessfundamentals_tpu.models.svgp import (
    SVGPParams,
    collapsed_elbo,
    fit_svgp,
    svgp_elbo,
    svgp_predict,
)
from gaussianprocessfundamentals_tpu.models.iterative import (
    fit_iterative,
    iterative_nll_and_grad,
    iterative_posterior_mean,
)
from gaussianprocessfundamentals_tpu.mcmc.hmc import hmc, hmc_chains
from gaussianprocessfundamentals_tpu.mcmc.nuts import (
    nuts,
    nuts_chains,
    nuts_chains_resume,
    nuts_resume,
)
from gaussianprocessfundamentals_tpu.data.datasets import (
    DataInput,
    MinMaxNormalization,
    load_csv,
    load_named,
    synth_mauna_loa,
    synth_se,
)

__version__ = "0.1.0"
