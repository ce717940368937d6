"""RFF feature-map and pathwise-sampling tests."""
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.linalg import cholesky as chol
from gaussianprocessfundamentals_tpu.models.rff import (
    pathwise_posterior_samples,
    rff_features,
    rff_init,
    rff_prior_sample,
)


@pytest.mark.parametrize(
    "kernel,params",
    [
        (gpf.SquaredExponentialKernel(), {"lengthscale": jnp.asarray(0.3)}),
        (gpf.Matern32Kernel(), {"lengthscale": jnp.asarray(0.3)}),
        (gpf.Matern52Kernel(), {"lengthscale": jnp.asarray(0.3)}),
    ],
    ids=["SE", "M32", "M52"],
)
def test_rff_gram_approximation(kernel, params, key):
    x = jnp.linspace(0, 1, 40)[:, None]
    st = rff_init(kernel, params, 1, 8192, key)
    phi = rff_features(st, x)
    K_hat = np.asarray(phi @ phi.T)
    K = np.asarray(kernel.gram(params, x, x))
    assert np.max(np.abs(K_hat - K)) < 0.08, np.max(np.abs(K_hat - K))


def test_rff_prior_sample_moments(key):
    x = jnp.linspace(0, 1, 30)[:, None]
    k = gpf.SquaredExponentialKernel()
    p = {"lengthscale": jnp.asarray(0.25)}
    st = rff_init(k, p, 1, 4096, key)
    s = np.asarray(rff_prior_sample(st, x, jr.fold_in(key, 1), 4000))
    emp = np.cov(s.T)
    np.testing.assert_allclose(emp, np.asarray(k.gram(p, x, x)), atol=0.12)


def test_pathwise_posterior_moments(key):
    x, y = gpf.synth_se(n=120, lengthscale=0.25, noise_sd=0.2, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(y)
    xs = jnp.linspace(0, 1, 25)[:, None].astype(x.dtype)
    k = gpf.SquaredExponentialKernel()
    p = {"lengthscale": jnp.asarray(0.25)}
    noise = 0.04
    samples = np.asarray(
        pathwise_posterior_samples(
            k, p, x, y, xs, noise, key,
            num_samples=600, num_features=4096, max_iters=200,
        )
    )
    st = chol.factor(k.gram(p, x, x), y, noise, 1e-8)
    mu = np.asarray(chol.posterior_mean(st, k.gram(p, x, xs)))
    var = np.asarray(chol.posterior_var(st, k.gram(p, x, xs), k.diag(p, xs)))
    np.testing.assert_allclose(samples.mean(0), mu, atol=0.08)
    np.testing.assert_allclose(samples.var(0), var, atol=0.05)


def test_rff_unsupported_kernel_raises(key):
    with pytest.raises(NotImplementedError):
        rff_init(gpf.PeriodicKernel(), {"lengthscale": jnp.asarray(0.3),
                                        "period": jnp.asarray(0.3)}, 1, 16, key)
