"""Golden tests for the mean-function grammar (reference
``MeanFunctionBasics/BaseMeanFunctions.py``)."""
import math

import jax.numpy as jnp
import numpy as np

import gaussianprocessfundamentals_tpu as gpf

X = jnp.array([[0.0], [0.5], [1.0]])


def test_zero_and_constant():
    np.testing.assert_allclose(np.asarray(gpf.ZeroMean().mean({}, X)), 0.0)
    m = gpf.ConstantMean()
    np.testing.assert_allclose(
        np.asarray(m.mean({"c": jnp.asarray(2.5)}, X)), 2.5
    )


def test_linear():
    m = gpf.LinearMean()
    got = np.asarray(m.mean({"slope": jnp.asarray([3.0])}, X))
    np.testing.assert_allclose(got, [0.0, 1.5, 3.0])


def test_exponential():
    m = gpf.ExponentialMean()
    p = {
        "scale": jnp.asarray([2.0]),
        "shift": jnp.asarray([0.5]),
        "base": jnp.asarray(math.e),
    }
    got = np.asarray(m.mean(p, X))
    expected = np.exp(2.0 * np.array([0.0, 0.5, 1.0]) - 0.5)
    np.testing.assert_allclose(got, expected, rtol=1e-7)


def test_logit():
    m = gpf.LogitMean()
    p = {
        "steepness": jnp.asarray([-1.0]),
        "shift": jnp.asarray([0.0]),
        "max_value": jnp.asarray(2.0),
    }
    got = np.asarray(m.mean(p, X))
    expected = 2.0 / (1.0 + np.exp(-np.array([0.0, 0.5, 1.0])))
    np.testing.assert_allclose(got, expected, rtol=1e-7)


def test_mean_operators():
    a, b = gpf.ConstantMean(), gpf.LinearMean()
    s = a + b
    p = {
        "children": (
            {"c": jnp.asarray(1.0)},
            {"slope": jnp.asarray([2.0])},
        )
    }
    np.testing.assert_allclose(np.asarray(s.mean(p, X)), [1.0, 2.0, 3.0])
    m = a * b
    np.testing.assert_allclose(np.asarray(m.mean(p, X)), [0.0, 1.0, 2.0])


def test_mean_serialization_roundtrip():
    m = (gpf.ConstantMean() + gpf.LinearMean()) * gpf.LogitMean()
    assert gpf.mean_from_dict(m.to_dict()) == m


def test_detrending_in_posterior():
    """Mean function is subtracted before GP inference and re-added at test
    points (reference DataInput.py:77-124 + GaussianProcess.py:63-85)."""
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 1, (40, 1)), axis=0)
    y = 5.0 + np.sin(8 * x[:, 0])
    gp = gpf.GaussianProcess(
        gpf.SquaredExponentialKernel(), mean=gpf.ConstantMean()
    )
    gp.set_data(jnp.asarray(x), jnp.asarray(y))
    gp.kernel_params = {"lengthscale": jnp.asarray(0.2)}
    gp.mean_params = {"c": jnp.asarray(5.0)}
    gp.noise = 1e-6
    full_mu, mean_mu, post_mu = gp.predict(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mean_mu), 5.0)
    np.testing.assert_allclose(np.asarray(full_mu), y, atol=1e-3)
    np.testing.assert_allclose(np.asarray(full_mu), np.asarray(mean_mu + post_mu))


def test_mean_changepoint():
    """CP mean operator (declared but unimplemented in the reference —
    MeanFunctionBasics/MeanFunction.py:15-28)."""
    m = gpf.MeanChangePoint(children=(gpf.ConstantMean(), gpf.ConstantMean()))
    p = m.init_params([[0.0, 1.0]], 10)
    p["children"] = ({"c": jnp.asarray(-1.0)}, {"c": jnp.asarray(2.0)})
    p["locations"] = jnp.asarray([0.5])
    x = jnp.array([[0.1], [0.9]])
    got = np.asarray(m.mean(p, x))
    np.testing.assert_allclose(got, [-1.0, 2.0])
