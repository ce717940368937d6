"""Coverage for profiling utils, gram_fn override, full-cov posterior."""
import json

import jax.numpy as jnp
import numpy as np

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.fit.fit import init_uparams, make_nll
from gaussianprocessfundamentals_tpu.utils.profiling import StepLogger, timed


def test_step_logger_emits_json():
    records = []
    log = StepLogger(every=2, sink=records.append)
    for i in range(5):
        log(i, loss=1.0 / (i + 1), grad_norm=0.5)
    assert len(records) == 3  # steps 0, 2, 4
    rec = json.loads(records[-1])
    assert rec["step"] == 4 and "loss" in rec and "grad_norm" in rec


def test_timed_context():
    with timed("noop"):
        pass


def test_make_nll_gram_fn_override_pallas_interpret():
    """The Pallas fused SE Gram slots into the fit objective via gram_fn and
    reproduces the XLA builder's NLL (interpret mode on CPU; compiled on TPU)."""
    from gaussianprocessfundamentals_tpu.ops.pallas_gram import se_gram

    x, y = gpf.synth_se(n=96, lengthscale=0.2, noise_sd=0.1, seed=0)
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    k = gpf.SquaredExponentialKernel()

    def pallas_gram_fn(params, x1, x2):
        return se_gram(x1, x2, params["lengthscale"], interpret=True)

    nll_default = make_nll(k, gpf.ZeroMean(), x, y, fixed_noise=0.01)
    nll_pallas = make_nll(
        k, gpf.ZeroMean(), x, y, fixed_noise=0.01, gram_fn=pallas_gram_fn
    )
    u = init_uparams(k, gpf.ZeroMean(), [[0.0, 1.0]], 96, dtype=x.dtype)
    a, b = float(nll_default(u)), float(nll_pallas(u))
    # the tile kernels use EXACT d=1 differences while the XLA builder uses
    # the matmul norm-expansion — their f32 Grams differ by the expansion's
    # cancellation error, which the Cholesky/logdet amplifies a little
    np.testing.assert_allclose(a, b, rtol=1e-3)


def test_posterior_full_cov_consistency():
    x, y = gpf.synth_se(n=60, seed=1)
    x, y = jnp.asarray(x), jnp.asarray(y)
    k = gpf.SquaredExponentialKernel()
    p = {"lengthscale": jnp.asarray(0.2)}
    xs = x[:20]
    post_diag = gpf.posterior(k, p, x, y, xs, 0.05)
    post_full, cov = gpf.posterior(k, p, x, y, xs, 0.05, full_cov=True)
    np.testing.assert_allclose(
        np.asarray(post_full.mean), np.asarray(post_diag.mean), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.diag(np.asarray(cov)), np.asarray(post_diag.var), atol=1e-8
    )
    # full covariance PSD
    w = np.linalg.eigvalsh(np.asarray(cov) + 1e-9 * np.eye(20))
    assert w.min() > -1e-7
