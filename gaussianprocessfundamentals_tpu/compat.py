"""Reference-shaped compatibility surface.

Users of the reference (``gpbasics``) drive it through strategy enums and a
metric factory (``Metrics/MatrixHandlingTypes.py:4-36``,
``Metrics/Auxiliary.py:13-51``) after calling ``global_parameters.init()``.
This module provides that vocabulary on top of the functional core so a
gpbasics user can switch with minimal re-learning:

  * :func:`init` — accepted for source compatibility; returns a
    :class:`~gaussianprocessfundamentals_tpu.config.GPConfig` instead of
    mutating module globals (the reference hard-exits when init is missing,
    ``global_parameters.py:24-28``; here nothing needs initialising).
  * the strategy enums ``MetricType`` / ``MatrixApproximations`` /
    ``NumericalMatrixHandlingType`` / ``SubsetOfDataApproaches`` /
    ``FitterType``;
  * :func:`get_metric` — the factory mapping (metric, approximation, solver)
    to a callable, mirroring ``get_metric_by_type``.
"""
from __future__ import annotations

import enum
from functools import partial
from typing import Callable

from gaussianprocessfundamentals_tpu.config import DEFAULT_CONFIG, GPConfig


def init(tf_parallel: int = 0, worker: bool = False, **overrides) -> GPConfig:
    """Source-compatible stand-in for ``global_parameters.init()``
    (``global_parameters.py:31-76``). Thread-pool and worker arguments are
    accepted and ignored (XLA manages its own threading); returns an immutable
    config carrying the reference defaults."""
    known = {f for f in GPConfig.__dataclass_fields__}
    return GPConfig(**{k: v for k, v in overrides.items() if k in known})


class MetricType(enum.Enum):
    """Reference ``Metrics.py:17-23``."""

    LL = "log_likelihood"
    MSE = "mean_squared_error"
    BIC = "bayesian_information_criterion"


class MatrixApproximations(enum.Enum):
    """Reference ``MatrixHandlingTypes.py:8-18``."""

    NONE = "none"
    SKC_LOWER_BOUND = "skc_lower"
    SKC_UPPER_BOUND = "skc_upper"
    BASIC_NYSTROEM = "nystroem"
    SKI = "ski"


class SubsetOfDataApproaches(enum.Enum):
    """Reference ``MatrixHandlingTypes.py:21-26``."""

    RANDOM = "random"
    GRID = "grid"
    SMOOTHED_GRID = "smoothed_grid"


class NumericalMatrixHandlingType(enum.Enum):
    """Reference ``MatrixHandlingTypes.py:29-36``. CHOLESKY_BASED is the
    default production path; STRICT_INVERSE/PSEUDO_INVERSE exist in the
    reference as explicit-inverse strategies (a documented defect — solves are
    used here in all cases)."""

    STRICT_INVERSE = "strict_inverse"
    PSEUDO_INVERSE = "pseudo_inverse"
    CHOLESKY_BASED = "cholesky"
    LINEAR_CONJUGATE_GRADIENT = "cg"


class FitterType(enum.Enum):
    """Reference ``Optimizer/FitterType.py:4-6``."""

    GRADIENT = "gradient"
    NON_GRADIENT = "non_gradient"


def get_metric(
    metric_type: MetricType,
    approximation: MatrixApproximations = MatrixApproximations.NONE,
    handling: NumericalMatrixHandlingType = NumericalMatrixHandlingType.CHOLESKY_BASED,
    config: GPConfig = DEFAULT_CONFIG,
    subset: "SubsetOfDataApproaches" = None,
    subset_ratio: float = 0.1,
    blockwise: bool = False,
) -> Callable:
    """Factory mapping strategy enums to a metric callable
    (reference ``get_metric_by_type``, ``Metrics/Auxiliary.py:13-51``).

    Returned callables share the signature
    ``fn(kernel, params, x, y, noise, **kw)`` (MSE additionally takes
    ``x_test``/``y_test``; Nyström/SKC/SKI take inducing inputs ``z``/grid).

    ``blockwise=True`` routes to the blockwise metric family for segmented
    (change-point / partitioned) models — the reference's standard→blockwise
    MetricType mapping (``Metrics/Auxiliary.py:54-66``). Blockwise callables
    take per-segment sequences: ``fn(kernel_segments, params_segments, xs,
    ys, noise)`` (MSE: train/test segment pair lists).
    """
    if blockwise:
        from gaussianprocessfundamentals_tpu.objectives import metrics as M

        if approximation is not MatrixApproximations.NONE:
            raise ValueError(
                "blockwise metrics are exact per-segment (reference "
                "BlockwiseLogLikelihood has no approximation path)"
            )
        return {
            MetricType.LL: partial(M.blockwise_neg_log_likelihood, config=config),
            MetricType.MSE: partial(M.blockwise_mse, config=config),
            MetricType.BIC: partial(M.blockwise_bic, config=config),
        }[metric_type]
    from gaussianprocessfundamentals_tpu.linalg.nystroem import nystroem_nll
    from gaussianprocessfundamentals_tpu.linalg.ski import ski_mll
    from gaussianprocessfundamentals_tpu.objectives import metrics as M
    from gaussianprocessfundamentals_tpu.objectives.skc import (
        skc_lower_bound,
        skc_upper_bound,
    )

    def with_subset(fn):
        """Auto subset-of-data reduction before metric evaluation (reference
        ``Metrics.py:54-68``: subset_size defaults to 0.1·n, random or grid
        per ``SubsetOfDataApproaches``)."""
        if subset is None:
            return fn

        def wrapped(kernel, params, x, y, *a, **k):
            import numpy as _np

            n = x.shape[0]
            size = max(20, int(subset_ratio * n))
            if subset is SubsetOfDataApproaches.RANDOM:
                idx = _np.sort(
                    _np.random.default_rng(0).permutation(n)[:size]
                )
            else:  # GRID / SMOOTHED_GRID
                idx = _np.unique(
                    _np.linspace(0, n - 1, size).round().astype(int)
                )
            if subset is SubsetOfDataApproaches.SMOOTHED_GRID:
                # the reference declares but never implements this approach
                # (AbstractDataInput.py:138; DataInput.get_subset raises) —
                # here: Nadaraya-Watson smoothing via DataInput
                from gaussianprocessfundamentals_tpu.data.datasets import (
                    DataInput as _DI,
                )

                di = _DI(x, y, x, y).subset_smoothed_grid(size)
                return fn(kernel, params, di.x_train, di.y_train, *a, **k)
            return fn(kernel, params, x[idx], y[idx], *a, **k)

        return wrapped

    if metric_type is MetricType.MSE:
        return partial(M.mean_squared_error, config=config)
    if metric_type is MetricType.BIC:
        return with_subset(partial(M.bic, config=config))
    # LL family
    if approximation is MatrixApproximations.NONE:
        if handling is NumericalMatrixHandlingType.LINEAR_CONJUGATE_GRADIENT:
            def nll_cg(kernel, params, x, y, noise, **kw):
                import jax.numpy as jnp

                from gaussianprocessfundamentals_tpu.linalg import cholesky as chol
                from gaussianprocessfundamentals_tpu.linalg.cg import cg_solve_dense

                K = kernel.gram(params, x, x)
                Kn = chol.noised(K, noise, config.jitter)
                alpha = cg_solve_dense(Kn, y, tol=1e-10, max_iters=4 * x.shape[0])
                # logdet still needs a factorisation; CG covers the solve path
                L = jnp.linalg.cholesky(Kn)
                logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
                return 0.5 * jnp.sum(y * alpha) + 0.5 * logdet + 0.5 * y.shape[-1] * chol.LOG_2PI

            return nll_cg
        return with_subset(partial(M.neg_log_likelihood, config=config))
    if approximation is MatrixApproximations.BASIC_NYSTROEM:
        return partial(nystroem_nll, jitter=config.jitter)
    if approximation is MatrixApproximations.SKC_LOWER_BOUND:
        return lambda *a, **k: -skc_lower_bound(*a, jitter=config.jitter, **k)
    if approximation is MatrixApproximations.SKC_UPPER_BOUND:
        return lambda *a, **k: -skc_upper_bound(*a, jitter=config.jitter, **k)
    if approximation is MatrixApproximations.SKI:
        return lambda *a, **k: -ski_mll(*a, jitter=config.jitter, **k)
    raise ValueError((metric_type, approximation, handling))
