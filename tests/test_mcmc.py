"""HMC tests: exact sampling of a known Gaussian + GP hyperparameter posterior."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.fit.fit import init_uparams, make_nll
from gaussianprocessfundamentals_tpu.mcmc.hmc import (
    effective_sample_size,
    hmc,
    hmc_chains,
    potential_scale_reduction,
)


def test_hmc_samples_standard_normal(key):
    logprob = lambda q: -0.5 * jnp.sum(q["x"] ** 2)
    res = hmc(
        logprob, {"x": jnp.zeros(3)}, key,
        num_samples=2000, num_warmup=500, num_leapfrog=8,
    )
    s = np.asarray(res.samples["x"])
    assert 0.5 < res.accept_prob.mean() < 1.0
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(s.std(0), 1.0, atol=0.15)


def test_hmc_chains_and_diagnostics(key):
    logprob = lambda q: -0.5 * jnp.sum((q["x"] - 2.0) ** 2) / 0.25
    q0s = {"x": jnp.stack([jnp.zeros(2), jnp.ones(2), -jnp.ones(2), 2 * jnp.ones(2)])}
    res = hmc_chains(
        logprob, q0s, jr.split(key, 4),
        num_samples=500, num_warmup=300, num_leapfrog=8,
    )
    trace = res.samples["x"][..., 0]  # [chains, samples]
    rhat = float(potential_scale_reduction(trace))
    assert rhat < 1.2, rhat
    ess = float(effective_sample_size(trace))
    assert ess > 50
    np.testing.assert_allclose(np.asarray(trace).mean(), 2.0, atol=0.2)


def test_hmc_gp_hyperposterior_covers_truth(key):
    x, y = gpf.synth_se(n=150, lengthscale=0.2, noise_sd=0.1, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(y)
    kern = gpf.Matern52Kernel(scaled=True)
    nll = make_nll(kern, gpf.ZeroMean(), x, y, optimize_noise=True)
    prior_sd = 3.0
    logprob = lambda u: -nll(u) - 0.5 * sum(
        jnp.sum(l**2) for l in jax.tree_util.tree_leaves(u)
    ) / prior_sd**2
    q0 = init_uparams(
        kern, gpf.ZeroMean(), [[0.0, 1.0]], 150, optimize_noise=True,
        dtype=x.dtype,
    )
    res = hmc(logprob, q0, key, num_samples=300, num_warmup=200, num_leapfrog=8)
    assert 0.4 < float(res.accept_prob.mean()) <= 1.0
    ls = np.exp(np.asarray(res.samples["kernel"]["lengthscale"]))
    assert 0.03 < ls.mean() < 1.0, ls.mean()
    noise = np.exp(np.asarray(res.samples["log_noise"]))
    assert np.isfinite(res.log_probs).all()
    assert 1e-4 < noise.mean() < 0.3
