"""Plot smoke tests (reference ``DataHandling/Illustration.py`` parity)."""
import os

import jax.numpy as jnp
import jax.random as jr
import numpy as np

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.viz.plots import (
    plot_posterior,
    plot_prior_samples,
)


def test_posterior_plot_svg(tmp_path):
    x = np.linspace(0, 1, 50)
    mu, sd = np.sin(6 * x), 0.1 + 0.05 * x
    path = str(tmp_path / "post.svg")
    out = plot_posterior(
        x, mu, sd, x_train=x[:30], y_train=mu[:30], changepoints=[0.5],
        path=path,
    )
    assert os.path.getsize(out) > 1000


def test_prior_samples_plot(tmp_path, key):
    x = jnp.linspace(0, 1, 40)[:, None]
    k = gpf.SquaredExponentialKernel()
    s = gpf.sample_prior(k, {"lengthscale": jnp.asarray(0.2)}, x, key, 3)
    path = str(tmp_path / "prior.svg")
    assert os.path.getsize(plot_prior_samples(x, s, path=path)) > 1000
