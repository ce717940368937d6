"""Model-selection metrics: NLL, MSE, BIC (+ blockwise) and k-fold CV.

Reference: ``main/gpbasics/Metrics/`` — the ``Metric`` strategy hierarchy
(``Metrics.py:35-154``), ``LogLikelihood`` (``LogLikelihood.py:21-104``),
``MeanSquaredError`` (``MeanSquaredError.py:18-81``), ``BIC``
(``BayesianInformationCriterion.py:18-63``), ``CrossValidation``
(``CrossValidation.py:47-134``). Strategy enums (approximation × solver) are
replaced by passing an explicit ``gram_fn``/solver choice; blockwise variants
sum per-segment metrics computed on independent (block-diagonal) segments
(``Metrics/LogLikelihood.py:68-104``).
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import jax.random as jr
import numpy as np

from gaussianprocessfundamentals_tpu.config import DEFAULT_CONFIG, GPConfig
from gaussianprocessfundamentals_tpu.linalg import cholesky as chol
from gaussianprocessfundamentals_tpu.means.functions import MeanFunction, ZeroMean
from gaussianprocessfundamentals_tpu.models.exact import posterior


def _detrend(mean, mean_params, x, y):
    mean = mean if mean is not None else ZeroMean(dim=x.shape[-1])
    mp = mean_params if mean_params is not None else {}
    return y - mean.mean(mp, x)


def neg_log_likelihood(
    kernel, kernel_params, x, y, noise,
    config: GPConfig = DEFAULT_CONFIG,
    mean: Optional[MeanFunction] = None, mean_params: Any = None,
) -> jnp.ndarray:
    """Negative log marginal likelihood (reference minimisation form,
    ``LogLikelihood.py:65``)."""
    resid = _detrend(mean, mean_params, x, y)
    K = kernel.gram(kernel_params, x, x)
    return chol.nll(K, resid, noise, config.jitter)


def mean_squared_error(
    kernel, kernel_params, x_train, y_train, x_test, y_test, noise,
    config: GPConfig = DEFAULT_CONFIG,
    mean: Optional[MeanFunction] = None, mean_params: Any = None,
) -> jnp.ndarray:
    """mean((μ* − y_test)²) on the detrended test targets
    (reference ``MeanSquaredError.py:26-42``)."""
    post = posterior(
        kernel, kernel_params, x_train, y_train, x_test, noise, config.jitter,
        mean, mean_params,
    )
    return jnp.mean((post.mean - y_test) ** 2, axis=-1)


def bic(
    kernel, kernel_params, x, y, noise,
    config: GPConfig = DEFAULT_CONFIG,
    mean: Optional[MeanFunction] = None, mean_params: Any = None,
) -> jnp.ndarray:
    """BIC = −2·LL + |hyp|·log n (reference
    ``BayesianInformationCriterion.py:25-39``)."""
    nll = neg_log_likelihood(kernel, kernel_params, x, y, noise, config, mean, mean_params)
    k = kernel.num_params(kernel_params)
    n = x.shape[-2]
    return 2.0 * nll + k * jnp.log(jnp.asarray(float(n), x.dtype))


def blockwise_neg_log_likelihood(
    kernel_segments: Sequence, params_segments: Sequence,
    xs: Sequence[jnp.ndarray], ys: Sequence[jnp.ndarray], noise,
    config: GPConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """Σ of per-segment NLLs over independent blocks (reference
    ``BlockwiseLogLikelihood``, ``LogLikelihood.py:68-104``). Segments are the
    reference's 'scalability by independence': t blocks cost Σ O(nᵢ³) ≪ O(n³).
    """
    total = 0.0
    for k, p, x, y in zip(kernel_segments, params_segments, xs, ys):
        total = total + neg_log_likelihood(k, p, x, y, noise, config)
    return total


def blockwise_mse(
    kernel_segments, params_segments, train_segs, test_segs, noise,
    config: GPConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """Concatenate per-segment posteriors before the mean
    (reference ``MeanSquaredError.py:56-81``)."""
    errs = []
    for k, p, (xtr, ytr), (xte, yte) in zip(
        kernel_segments, params_segments, train_segs, test_segs
    ):
        post = posterior(k, p, xtr, ytr, xte, noise, config.jitter)
        errs.append((post.mean - yte) ** 2)
    return jnp.mean(jnp.concatenate(errs, axis=-1), axis=-1)


def blockwise_bic(
    kernel_segments, params_segments, xs, ys, noise,
    config: GPConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    nll = blockwise_neg_log_likelihood(
        kernel_segments, params_segments, xs, ys, noise, config
    )
    k = sum(ks.num_params(p) for ks, p in zip(kernel_segments, params_segments))
    n = sum(x.shape[-2] for x in xs)
    return 2.0 * nll + k * np.log(float(n))


def kfold_indices(n: int, k: int, key) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Shuffled k-fold split (reference ``CrossValidation.py:16-44``:
    k = ⌊1/test_ratio⌋, random permutation, equal folds)."""
    perm = np.asarray(jr.permutation(key, n))
    folds = np.array_split(perm, k)
    out = []
    for i in range(k):
        test = folds[i]
        train = np.concatenate([folds[j] for j in range(k) if j != i])
        out.append((train, test))
    return out


def cross_validate(
    kernel, kernel_params, x, y, noise, k: int, key,
    metric: str = "mse",
    config: GPConfig = DEFAULT_CONFIG,
    mean: Optional[MeanFunction] = None, mean_params: Any = None,
) -> jnp.ndarray:
    """k-fold CV of a fixed-hyperparameter model; returns the mean fold metric
    (reference evaluates each fold with a deep-copied GP,
    ``CrossValidation.py:71-94`` — here folds are pure function calls).

    Folds have equal sizes (shapes must be static under jit), so the fold
    dimension vmaps: all k folds run as one batched Cholesky.
    """
    n = x.shape[0]
    m = (n // k) * k
    perm = jr.permutation(key, n)[:m]
    folds = perm.reshape(k, m // k)

    def one_fold(i):
        test_idx = folds[i]
        # train = all folds except i: roll fold i to the end, take the rest
        rolled = jnp.roll(folds, -i - 1, axis=0)[: k - 1].reshape(-1)
        xtr, ytr = x[rolled], y[rolled]
        xte, yte = x[test_idx], y[test_idx]
        if metric == "mse":
            return mean_squared_error(
                kernel, kernel_params, xtr, ytr, xte, yte, noise, config, mean, mean_params
            )
        return neg_log_likelihood(
            kernel, kernel_params, xtr, ytr, noise, config, mean, mean_params
        )

    vals = jnp.stack([one_fold(i) for i in range(k)])
    return jnp.mean(vals, axis=0)


def cross_validate_partitioned(
    kernel_segments, params_segments, segments, noise, k: int, key,
    metric: str = "mse", config: GPConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """Partition-aware k-fold CV: folds are drawn *inside* each partition and
    results reconcatenated (reference ``CrossValidation.py:96-134``). With
    independent segments this equals the size-weighted mean of per-segment
    CVs."""
    total = sum(int(x.shape[0]) for x, _ in segments)
    acc = 0.0
    for i, (ks, ps, (x, y)) in enumerate(
        zip(kernel_segments, params_segments, segments)
    ):
        w = x.shape[0] / total
        acc = acc + w * cross_validate(
            ks, ps, x, y, noise, k, jr.fold_in(key, i), metric, config
        )
    return acc
