"""Exact GP regression: functional core + a facade mirroring the reference.

Reference: ``main/gpbasics/Statistics/GaussianProcess.py:20-137``
(``AbstractGaussianProcess.predict`` returns the triple
(mean_mu + posterior_mu, mean_mu, posterior_mu), ``:42-85``; prior/posterior
sampling ``:87-110``) and ``Statistics/Auxiliary.py`` for the posterior math.
The functional layer is what jits/shards; the :class:`GaussianProcess` class
is a thin stateful convenience wrapper in the reference's shape.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import jax.random as jr

from gaussianprocessfundamentals_tpu.config import DEFAULT_CONFIG, GPConfig
from gaussianprocessfundamentals_tpu.fit.fit import FitResult, fit as _fit
from gaussianprocessfundamentals_tpu.linalg import cholesky as chol
from gaussianprocessfundamentals_tpu.means.functions import MeanFunction, ZeroMean

# posterior() dense→iterative routing threshold: above this the [n, n] K
# build + Cholesky becomes memory-prohibitive (40 GB at n=100k) and the
# matrix-free preconditioned mBCG moments take over. Deliberately HIGHER
# than fit()'s 8k crossover: prediction is usually a one-off where the
# dense factorisation's exactness is worth its cost while it still fits.
_AUTO_ITERATIVE_POST_N = 20_000


class Posterior(NamedTuple):
    """Posterior moments at the test inputs (already including the mean
    function, i.e. the reference's "full" μ)."""

    mean: jnp.ndarray  # [..., m]
    var: jnp.ndarray  # [..., m] marginal variances
    sd: jnp.ndarray  # [..., m]
    mean_fn_mu: jnp.ndarray  # mean-function contribution (reference's 2nd output)
    posterior_mu: jnp.ndarray  # GP residual posterior (reference's 3rd output)


def posterior(
    kernel,
    kernel_params: Any,
    x_train: jnp.ndarray,
    y_train: jnp.ndarray,
    x_test: jnp.ndarray,
    noise,
    jitter: float = DEFAULT_CONFIG.jitter,
    mean: Optional[MeanFunction] = None,
    mean_params: Any = None,
    full_cov: bool = False,
    method: str = "auto",
):
    """Posterior moments. Detrends y by the mean function (reference
    ``DataInput.get_detrended_y_train``, ``DataHandling/DataInput.py:77-124``),
    computes μ* = K_sᵀα and Σ* = K_ss − vᵀv via triangular solves, and re-adds
    the mean at test inputs.

    ``method``: "auto" (dense below ``_AUTO_ITERATIVE_POST_N`` rows,
    matrix-free chunked mBCG above — mirrors ``fit(method="auto")``),
    "dense" (force the exact Cholesky path regardless of n — the caller owns
    the O(n²) memory), or "iterative" (force the matrix-free route at any n).

    PLAIN-PYTHON router (deliberately not jitted): the large-n branch must
    run its test-point chunks as SEPARATE device programs — under jit the
    host chunk loop would unroll into one giant fused program, re-entering
    the large-program class that crashes the TPU worker (r4 review finding;
    the dense implementation below is jitted on its own).
    """
    if method not in ("auto", "dense", "iterative"):
        raise ValueError(
            f"posterior(method={method!r}): one of 'auto', 'dense', 'iterative'"
        )
    mean = mean if mean is not None else ZeroMean(dim=x_train.shape[-1])
    mean_params = mean_params if mean_params is not None else {}

    n = x_train.shape[-2]
    want_iterative = method == "iterative" or (
        method == "auto" and n >= _AUTO_ITERATIVE_POST_N
    )
    if want_iterative and (
        isinstance(x_train, jax.core.Tracer)
        or isinstance(x_test, jax.core.Tracer)
        or isinstance(y_train, jax.core.Tracer)
    ):
        # the chunked route is a HOST-level loop of separate device programs;
        # under an outer jit it would unroll into one giant program (the
        # TPU-worker-crash class). Surface that instead of compiling it.
        raise ValueError(
            "posterior(): the large-n iterative route cannot run under an "
            "outer jit (its host-level test-point chunking would unroll "
            "into one giant program). Call posterior() un-jitted, or force "
            "method='dense' if the [n, n] dense program is intended."
        )
    if method == "iterative" and (full_cov or x_train.ndim != 2):
        raise ValueError(
            "posterior(method='iterative') supports marginal variances on "
            "unbatched inputs only (full_cov=False, x_train [n, d])"
        )
    if not full_cov and x_train.ndim == 2 and want_iterative:
        # large-n route: matrix-free preconditioned mBCG posterior — the
        # dense path below materialises the [n, n] K and factors it (40 GB
        # at n=100k); the iterative moments match it to solver tolerance
        # (tests) and are what fit(method="auto") trained against
        from gaussianprocessfundamentals_tpu.models.iterative import (
            iterative_posterior_chunked,
        )

        resid = y_train - mean.mean(mean_params, x_train)
        post_mu, var = iterative_posterior_chunked(
            kernel, kernel_params, x_train, resid, x_test,
            jnp.asarray(noise, x_train.dtype) + jitter,
        )
        mean_mu = mean.mean(mean_params, x_test)
        return Posterior(
            mean_mu + post_mu, var, jnp.sqrt(var), mean_mu, post_mu
        )
    return _posterior_dense(
        kernel, kernel_params, x_train, y_train, x_test, noise, jitter,
        mean, mean_params, full_cov,
    )


@partial(jax.jit, static_argnames=("kernel", "mean", "full_cov"))
def _posterior_dense(
    kernel, kernel_params, x_train, y_train, x_test, noise, jitter,
    mean, mean_params, full_cov,
):
    resid = y_train - mean.mean(mean_params, x_train)
    K = kernel.gram(kernel_params, x_train, x_train)
    state = chol.factor(K, resid, noise, jitter)
    K_s = kernel.gram(kernel_params, x_train, x_test)

    post_mu = chol.posterior_mean(state, K_s)
    mean_mu = mean.mean(mean_params, x_test)
    if full_cov:
        K_ss = kernel.gram(kernel_params, x_test, x_test)
        cov = chol.posterior_cov(state, K_s, K_ss)
        var = jnp.diagonal(cov, axis1=-2, axis2=-1)
        sd = jnp.sqrt(jnp.maximum(var, 0.0))
        return Posterior(mean_mu + post_mu, var, sd, mean_mu, post_mu), cov
    K_ss_diag = kernel.diag(kernel_params, x_test)
    var = chol.posterior_var(state, K_s, K_ss_diag)
    var = jnp.maximum(var, 0.0)
    return Posterior(mean_mu + post_mu, var, jnp.sqrt(var), mean_mu, post_mu)


@partial(jax.jit, static_argnames=("kernel", "num_samples"))
def sample_prior(
    kernel,
    kernel_params: Any,
    x: jnp.ndarray,
    key,
    num_samples: int = 1,
    jitter: float = DEFAULT_CONFIG.jitter,
):
    """f ~ N(0, K(x,x)); reference ``GaussianProcess.py:87-95`` (chol·N(0,I))."""
    K = kernel.gram(kernel_params, x, x)
    L = jnp.linalg.cholesky(chol.add_diag(K, jitter))
    z = jr.normal(key, (num_samples, x.shape[-2]), x.dtype)
    return jnp.einsum("nm,sm->sn", L, z)


def sample_posterior(
    kernel,
    kernel_params: Any,
    x_train: jnp.ndarray,
    y_train: jnp.ndarray,
    x_test: jnp.ndarray,
    noise,
    key,
    num_samples: int = 1,
    jitter: float = DEFAULT_CONFIG.jitter,
    mean: Optional[MeanFunction] = None,
    mean_params: Any = None,
):
    """f* ~ N(μ*, Σ*) via chol(Σ* + jitter·I)·N(0,I)
    (reference ``GaussianProcess.py:97-110``)."""
    post, cov = posterior(
        kernel, kernel_params, x_train, y_train, x_test, noise, jitter,
        mean, mean_params, full_cov=True,
    )
    L = jnp.linalg.cholesky(chol.add_diag(cov, jitter))
    z = jr.normal(key, (num_samples, x_test.shape[-2]), x_test.dtype)
    return post.mean + jnp.einsum("nm,sm->sn", L, z)


@dataclasses.dataclass
class GaussianProcess:
    """Stateful facade in the reference's shape (``GaussianProcess.py:116-125``):
    holds kernel + mean + fitted params, exposes fit/predict/sample."""

    kernel: Any
    mean: Optional[MeanFunction] = None
    config: GPConfig = DEFAULT_CONFIG
    kernel_params: Any = None
    mean_params: Any = None
    noise: Any = None
    x_train: Any = None
    y_train: Any = None
    # set when fit() used an approximation objective: fitted inducing inputs
    # and the approximation name — posterior() then routes to the O(nm²)
    # projected-process predictive instead of the dense Cholesky
    inducing: Any = None
    approximation: Optional[str] = None

    def __post_init__(self):
        if self.mean is None:
            self.mean = ZeroMean()

    def set_data(self, x_train, y_train):
        self.x_train, self.y_train = x_train, y_train
        return self

    def fit(self, x_train=None, y_train=None, **kwargs) -> FitResult:
        if x_train is not None:
            self.set_data(x_train, y_train)
        if kwargs.get("method") == "iterative":
            # factorisation-free large-N path (models.iterative)
            import jax.random as jr

            from gaussianprocessfundamentals_tpu.models.iterative import (
                fit_iterative,
            )

            kwargs.pop("method")
            key = kwargs.pop("key", jr.PRNGKey(0))
            mean = None if type(self.mean) is ZeroMean else self.mean
            out = fit_iterative(
                self.kernel, self.x_train, self.y_train, key,
                config=self.config, mean=mean, **kwargs,
            )
            if mean is not None:
                kp, mp, noise, hist = out
            else:
                (kp, noise, hist), mp = out, {}
            self.kernel_params, self.noise = kp, noise
            self.mean_params = mp
            return FitResult(kp, mp, noise, float(hist[0]), float(hist[-1]), hist)
        res = _fit(
            self.kernel, self.x_train, self.y_train,
            mean=self.mean, config=self.config, **kwargs,
        )
        self.kernel_params, self.mean_params = res.kernel_params, res.mean_params
        self.noise = res.noise
        self.approximation = kwargs.get("approximation")
        self.inducing = res.inducing
        return res

    def _ensure_params(self):
        if self.x_train is None:
            raise ValueError(
                "no training data attached: call set_data(x, y) or "
                "fit(x, y) before predict/posterior/sample"
            )
        if self.kernel_params is None:
            xr = jnp.stack(
                [self.x_train.min(axis=0), self.x_train.max(axis=0)], axis=-1
            )
            n = self.x_train.shape[0]
            self.kernel_params = self.kernel.init_params(xr, n, dtype=self.x_train.dtype)
            self.mean_params = self.mean.init_params(xr, n, dtype=self.x_train.dtype)
        if self.noise is None:
            # reference: predict-time noise defaults to the jitter
            # (GaussianProcess.py:48-49)
            self.noise = jnp.asarray(self.config.jitter, self.x_train.dtype)

    def posterior(self, x_test, full_cov: bool = False, method: str = "auto"):
        self._ensure_params()
        if self.approximation is not None and not full_cov:
            # projected-process predictive through the fitted inducing set —
            # O(nm²) like the training objective (full_cov requests fall back
            # to the dense exact posterior below)
            from gaussianprocessfundamentals_tpu.linalg.nystroem import (
                nystroem_posterior,
            )

            resid = self.y_train - self.mean.mean(self.mean_params, self.x_train)
            mu, var = nystroem_posterior(
                self.kernel, self.kernel_params, self.x_train, resid,
                self.inducing, x_test, self.noise, self.config.jitter,
            )
            mean_mu = self.mean.mean(self.mean_params, x_test)
            return Posterior(mean_mu + mu, var, jnp.sqrt(var), mean_mu, mu)
        return posterior(
            self.kernel, self.kernel_params, self.x_train, self.y_train, x_test,
            self.noise, self.config.jitter, self.mean, self.mean_params,
            full_cov=full_cov, method=method,
        )

    def predict(self, x_test):
        """Reference-compatible triple: (full μ, mean-function μ, posterior μ)
        (``GaussianProcess.py:42-85``)."""
        post = self.posterior(x_test)
        return post.mean, post.mean_fn_mu, post.posterior_mu

    def sample_prior(self, x, key, num_samples: int = 1):
        self._ensure_params()
        return sample_prior(
            self.kernel, self.kernel_params, x, key, num_samples, self.config.jitter
        )

    def sample_posterior(self, x_test, key, num_samples: int = 1):
        self._ensure_params()
        return sample_posterior(
            self.kernel, self.kernel_params, self.x_train, self.y_train, x_test,
            self.noise, key, num_samples, self.config.jitter,
            self.mean, self.mean_params,
        )

    def log_marginal_likelihood(self) -> jnp.ndarray:
        self._ensure_params()
        resid = self.y_train - self.mean.mean(self.mean_params, self.x_train)
        K = self.kernel.gram(self.kernel_params, self.x_train, self.x_train)
        return chol.mll(K, resid, self.noise, self.config.jitter)
