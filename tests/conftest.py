"""Test configuration: CPU backend with 8 virtual devices, float64 numerics.

Per SURVEY.md §4.4: all distributed/pjit logic is tested on a fake CPU mesh
(``--xla_force_host_platform_device_count``) so the same code paths run
unmodified on a real TPU slice. Env vars must be set before jax initialises.
"""
import os

# The axon sitecustomize force-registers the TPU tunnel backend regardless of
# JAX_PLATFORMS in the environment, so the env var alone is not enough — the
# config update below is what actually pins tests to CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    import jax.random as jr

    return jr.PRNGKey(0)
