"""NUTS tests: exact Gaussian sampling, adaptivity, GP hyperposterior."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.fit.fit import init_uparams, make_nll
from gaussianprocessfundamentals_tpu.mcmc.nuts import nuts, nuts_chains
from gaussianprocessfundamentals_tpu.mcmc.hmc import potential_scale_reduction


def test_nuts_standard_normal(key):
    logprob = lambda q: -0.5 * jnp.sum(q["x"] ** 2)
    res = nuts(
        logprob, {"x": jnp.zeros(4)}, key,
        num_samples=1500, num_warmup=500, max_depth=6,
    )
    s = np.asarray(res.samples["x"])
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(s.std(0), 1.0, atol=0.15)
    assert float(res.diverging.mean()) < 0.05
    # trajectory lengths should adapt beyond single steps
    assert float(res.num_steps.mean()) > 2.0


def test_nuts_anisotropic_gaussian(key):
    scales = jnp.array([0.1, 1.0, 10.0])
    logprob = lambda q: -0.5 * jnp.sum((q["x"] / scales) ** 2)
    res = nuts(
        logprob, {"x": jnp.zeros(3)}, key,
        num_samples=2500, num_warmup=800, max_depth=8,
    )
    s = np.asarray(res.samples["x"])
    np.testing.assert_allclose(s.std(0), np.asarray(scales), rtol=0.35)


def test_nuts_chains_gp_hyperposterior(key):
    x, y = gpf.synth_se(n=120, lengthscale=0.2, noise_sd=0.1, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(y)
    kern = gpf.Matern52Kernel(scaled=True)
    nll = make_nll(kern, gpf.ZeroMean(), x, y, optimize_noise=True)
    logprob = lambda u: -nll(u) - 0.5 * sum(
        jnp.sum(l**2) for l in jax.tree_util.tree_leaves(u)
    ) / 9.0
    q0s = jax.tree_util.tree_map(
        lambda *l: jnp.stack(l),
        *[
            init_uparams(
                kern, gpf.ZeroMean(), [[0.0, 1.0]], 120,
                key=jr.PRNGKey(i), optimize_noise=True, dtype=x.dtype,
            )
            for i in range(2)
        ],
    )
    res = nuts_chains(
        logprob, q0s, jr.split(key, 2),
        num_samples=250, num_warmup=400, max_depth=6,
    )
    assert np.isfinite(np.asarray(res.log_probs)).all()
    assert float(res.diverging.mean()) < 0.2
    ls = np.exp(np.asarray(res.samples["kernel"]["lengthscale"]))
    assert 0.02 < ls.mean() < 1.5
    rhat = float(potential_scale_reduction(np.log(ls)))
    assert rhat < 1.45, rhat


def test_nuts_resume_continues_chain(key):
    """Segmented sampling: warmup once, then resumed segments with frozen
    step_size/inv_mass match a single long run statistically (same target
    moments), enabling long chains within the TPU worker's program-size
    limit and chain checkpoint/continue (SURVEY 5.4)."""
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from gaussianprocessfundamentals_tpu.mcmc.nuts import nuts, nuts_resume

    logprob = lambda q: -0.5 * jnp.sum(q["z"] ** 2 / jnp.asarray([1.0, 4.0]))
    res = nuts(logprob, {"z": jnp.zeros(2)}, key, num_samples=300,
               num_warmup=200, max_depth=6)
    q_last = jax.tree_util.tree_map(lambda l: l[-1], res.samples)
    segs = [res.samples["z"]]
    for i in range(2):
        res2 = nuts_resume(logprob, q_last, jr.fold_in(key, 10 + i),
                           num_samples=300, step_size=res.step_size,
                           inv_mass=res.inv_mass, max_depth=6)
        segs.append(res2.samples["z"])
        q_last = jax.tree_util.tree_map(lambda l: l[-1], res2.samples)
    z = np.concatenate([np.asarray(s) for s in segs], axis=0)  # [900, 2]
    assert z.shape == (900, 2)
    np.testing.assert_allclose(z.mean(0), [0.0, 0.0], atol=0.35)
    np.testing.assert_allclose(z.std(0), [1.0, 2.0], rtol=0.25)
