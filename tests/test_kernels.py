"""Golden-value and property tests for the kernel grammar (SURVEY.md §4.1-4.2).

Golden values are NumPy f64 re-derivations of the reference formulas
(``main/gpbasics/KernelBasics/BaseKernels.py``); properties: PSD-ness, ADD/MUL
algebra, diag consistency, serialization round-trip.
"""
import math

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.kernels.operators import changepoint_weights
from gaussianprocessfundamentals_tpu.config import ChangePointGate

ALL_LEAVES = [
    gpf.ConstantKernel(),
    gpf.WhiteNoiseKernel(),
    gpf.LinearKernel(),
    gpf.SquaredExponentialKernel(),
    gpf.PeriodicKernel(),
    gpf.Matern32Kernel(),
    gpf.Matern52Kernel(),
    gpf.RationalQuadraticKernel(),
]
XR = [[0.0, 1.0]]


def _x(n=7, d=1, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, size=(n, d)))


def test_se_golden():
    k = gpf.SquaredExponentialKernel()
    x = jnp.array([[0.0], [1.0], [2.5]])
    p = {"lengthscale": jnp.asarray(0.7)}
    K = k.gram(p, x, x)
    d2 = (np.array([0.0, 1.0, 2.5])[:, None] - np.array([0.0, 1.0, 2.5])[None, :]) ** 2
    expected = np.exp(-0.5 * d2 / 0.49)
    np.testing.assert_allclose(np.asarray(K), expected, atol=1e-7)


def test_periodic_golden():
    k = gpf.PeriodicKernel()
    x = jnp.array([[0.0], [0.3]])
    p = {"lengthscale": jnp.asarray(0.9), "period": jnp.asarray(0.5)}
    K = np.asarray(k.gram(p, x, x))
    d = 0.3
    expected = math.exp(-2 * math.sin(math.pi * d / 0.5) ** 2 / 0.81)
    assert abs(K[0, 1] - expected) < 1e-7
    assert abs(K[0, 0] - 1.0) < 1e-7


def test_matern_golden():
    x = jnp.array([[0.0], [0.4]])
    p = {"lengthscale": jnp.asarray(0.6)}
    d = 0.4
    k32 = np.asarray(gpf.Matern32Kernel().gram(p, x, x))[0, 1]
    f = math.sqrt(3) * d / 0.6
    assert abs(k32 - (1 + f) * math.exp(-f)) < 1e-7
    k52 = np.asarray(gpf.Matern52Kernel().gram(p, x, x))[0, 1]
    f = math.sqrt(5) * d / 0.6
    assert abs(k52 - (1 + f + 5 * d * d / (3 * 0.36)) * math.exp(-f)) < 1e-7


def test_linear_golden():
    k = gpf.LinearKernel()
    x = jnp.array([[1.0], [2.0]])
    p = {"offset": jnp.asarray([0.5])}
    K = np.asarray(k.gram(p, x, x))
    np.testing.assert_allclose(K, [[0.25, 0.75], [0.75, 2.25]], atol=1e-7)


def test_white_noise_cross_block_zero():
    k = gpf.WhiteNoiseKernel()
    xtr = jnp.array([[0.0], [1.0]])
    xte = jnp.array([[0.5], [1.0]])
    K = np.asarray(k.gram({}, xtr, xte))
    np.testing.assert_allclose(K, [[0.0, 0.0], [0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(k.gram({}, xtr, xtr)), np.eye(2))


@pytest.mark.parametrize("k", ALL_LEAVES, ids=lambda k: type(k).__name__)
def test_leaf_psd_and_diag(k, key):
    x = _x(20)
    p = k.init_params(XR, 20)
    K = np.asarray(k.gram(p, x, x))
    np.testing.assert_allclose(K, K.T, atol=1e-7)
    w = np.linalg.eigvalsh(K + 1e-8 * np.eye(20))
    assert w.min() > -1e-8, f"{k} not PSD: min eig {w.min()}"
    np.testing.assert_allclose(np.diag(K), np.asarray(k.diag(p, x)), atol=1e-7)


@pytest.mark.parametrize("k", ALL_LEAVES, ids=lambda k: type(k).__name__)
def test_leaf_random_init_within_bounds(k, key):
    p = k.init_params(XR, 50, key=key)
    lo, hi = k.bounds(XR, 50)
    for name, v in p.items():
        l, h = np.asarray(lo[name]), np.asarray(hi[name])
        v = np.asarray(v)
        assert np.all(v >= np.where(np.isfinite(l), l, -np.inf) - 1e-12)
        assert np.all(v <= np.where(np.isfinite(h), h, np.inf) + 1e-12)


def test_sum_product_algebra():
    se, per = gpf.SquaredExponentialKernel(), gpf.PeriodicKernel()
    x = _x(9)
    ks = se + per
    kp = se * per
    ps = ks.init_params(XR, 9)
    pp = kp.init_params(XR, 9)
    Kse = se.gram(ps["children"][0], x, x)
    Kper = per.gram(ps["children"][1], x, x)
    np.testing.assert_allclose(np.asarray(ks.gram(ps, x, x)), np.asarray(Kse + Kper), atol=1e-7)
    np.testing.assert_allclose(np.asarray(kp.gram(pp, x, x)), np.asarray(Kse * Kper), atol=1e-7)


def test_operator_flattening():
    a, b, c = gpf.SquaredExponentialKernel(), gpf.PeriodicKernel(), gpf.LinearKernel()
    k = a + b + c
    assert isinstance(k, gpf.Sum) and len(k.children) == 3
    k2 = a * b * c
    assert isinstance(k2, gpf.Product) and len(k2.children) == 3


def test_changepoint_weights_partition_of_unity():
    x = _x(50)
    for gate in ChangePointGate:
        w = np.asarray(changepoint_weights(x, jnp.array([0.3, 0.7]), gate))
        assert w.shape == (50, 3)
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)


def test_changepoint_gram_indicator_blocks():
    se1, se2 = gpf.SquaredExponentialKernel(), gpf.SquaredExponentialKernel()
    cp = gpf.ChangePoint(children=(se1, se2), gate=ChangePointGate.INDICATOR)
    x = jnp.linspace(0, 1, 10)[:, None]
    p = cp.init_params(XR, 10)
    K = np.asarray(cp.gram(p, x, x))
    # cross-segment covariance must vanish under the hard gate
    loc = float(np.asarray(p["locations"])[0])
    left = np.asarray(x[:, 0]) < loc
    assert np.all(K[np.ix_(left, ~left)] == 0)
    # within-segment equals the child kernel
    pse = p["children"][0]
    Kse = np.asarray(se1.gram(pse, x, x))
    np.testing.assert_allclose(K[np.ix_(left, left)], Kse[np.ix_(left, left)], atol=1e-7)
    np.testing.assert_allclose(np.diag(K), np.asarray(cp.diag(p, x)), atol=1e-7)


def test_batched_gram_matches_loop():
    k = gpf.SquaredExponentialKernel() + gpf.LinearKernel()
    p = k.init_params(XR, 8)
    xb = jnp.stack([_x(8, seed=1), _x(8, seed=2)])
    Kb = np.asarray(k.gram(p, xb, xb))
    for i in range(2):
        Ki = np.asarray(k.gram(p, xb[i], xb[i]))
        np.testing.assert_allclose(Kb[i], Ki, atol=1e-7)


def test_kernel_serialization_roundtrip():
    k = (gpf.SquaredExponentialKernel(scaled=True) + gpf.PeriodicKernel()) * gpf.LinearKernel()
    d = k.to_dict()
    k2 = gpf.kernel_from_dict(d)
    assert k == k2
    cp = gpf.ChangePoint(children=(gpf.SquaredExponentialKernel(), gpf.Matern52Kernel()))
    assert gpf.kernel_from_dict(cp.to_dict()) == cp


def test_num_params():
    k = gpf.SquaredExponentialKernel() + gpf.PeriodicKernel()
    p = k.init_params(XR, 10)
    assert k.num_params(p) == 3  # SE ℓ + PER (ℓ, p)


def test_canonical_str_commutative():
    a, b = gpf.SquaredExponentialKernel(), gpf.PeriodicKernel()
    assert (a + b).canonical_str() == (b + a).canonical_str()
    assert (a * b).canonical_str() == (b * a).canonical_str()
    assert (a + b).canonical_str() != (a * b).canonical_str()
    assert gpf.SquaredExponentialKernel(scaled=True).canonical_str() != a.canonical_str()


def test_periodic_matern_use_manhattan_in_2d():
    """Reference PER/Matérn use the MANHATTAN distance (Distances.py:10-12,
    BaseKernels.py:445,707,866) — distinguishable from Euclidean only at d>1."""
    x1 = jnp.array([[0.0, 0.0]])
    x2 = jnp.array([[0.3, 0.4]])  # L1 = 0.7, L2 = 0.5
    p = {"lengthscale": jnp.asarray(0.6), "period": jnp.asarray(0.9)}
    got = float(gpf.PeriodicKernel(dim=2).gram(p, x1, x2)[0, 0])
    d = 0.7
    expected = math.exp(-2 * math.sin(math.pi * d / 0.9) ** 2 / 0.36)
    assert abs(got - expected) < 1e-7
    got32 = float(gpf.Matern32Kernel(dim=2).gram({"lengthscale": jnp.asarray(0.6)}, x1, x2)[0, 0])
    f = math.sqrt(3) * 0.7 / 0.6
    assert abs(got32 - (1 + f) * math.exp(-f)) < 1e-7


def test_rq_limits_to_se():
    """RQ → SE as α → ∞ (scale-mixture sanity)."""
    x = jnp.linspace(0, 1, 12)[:, None]
    se = gpf.SquaredExponentialKernel().gram({"lengthscale": jnp.asarray(0.3)}, x, x)
    rq = gpf.RationalQuadraticKernel().gram(
        {"lengthscale": jnp.asarray(0.3), "alpha": jnp.asarray(1e6)}, x, x
    )
    np.testing.assert_allclose(np.asarray(rq), np.asarray(se), atol=1e-4)


def test_x_rescale_invariance():
    """Rescaled fitted params on ORIGINAL x reproduce the Gram computed with
    the fitted params on NORMALISED x (reference
    get_last_hyper_parameter(scaling_x_param), BaseKernels.py:259-264,
    417-422, 617-622)."""
    rng = np.random.default_rng(0)
    x_orig = jnp.asarray(rng.uniform(3.0, 11.0, (20, 1)))
    shift, scale = 3.0, 8.0
    x_norm = (x_orig - shift) / scale

    kern = (
        gpf.SquaredExponentialKernel(scaled=True) * gpf.PeriodicKernel()
        + gpf.Matern52Kernel()
        + gpf.RationalQuadraticKernel()
    )
    p_fit = kern.init_params([[0.0, 1.0]], 20)
    K_norm = kern.gram(p_fit, x_norm, x_norm)
    p_orig = kern.x_rescale(p_fit, shift, scale)
    K_orig = kern.gram(p_orig, x_orig, x_orig)
    np.testing.assert_allclose(np.asarray(K_orig), np.asarray(K_norm),
                               rtol=2e-6, atol=2e-6)

    # linear: offset maps affinely (reference BaseKernels.py:259-264); the
    # gram then scales by scale² — the kernel's output carries x units, so
    # value invariance is definitionally impossible without a variance param
    lin = gpf.LinearKernel()
    pl = {"offset": jnp.asarray([0.4])}
    pl2 = lin.x_rescale(pl, shift, scale)
    np.testing.assert_allclose(np.asarray(pl2["offset"]), [0.4 * scale + shift])
    K_l_norm = lin.gram(pl, x_norm, x_norm)
    K_l_orig = lin.gram(pl2, x_orig, x_orig)
    np.testing.assert_allclose(np.asarray(K_l_orig),
                               np.asarray(K_l_norm) * scale**2, rtol=2e-6)


def test_x_rescale_changepoint_locations():
    """CP locations are x-positions: affine map under rescaling (deliberate
    fix of the reference's pass-through, Operators.py:617-628)."""
    cp = gpf.ChangePoint(
        children=(gpf.SquaredExponentialKernel(), gpf.Matern32Kernel())
    )
    p = cp.init_params([[0.0, 1.0]], 50)
    p2 = cp.x_rescale(p, 3.0, 8.0)
    np.testing.assert_allclose(
        np.asarray(p2["locations"]), np.asarray(p["locations"]) * 8.0 + 3.0
    )
    # invariance of the full CP gram under the rescale
    rng = np.random.default_rng(1)
    x_orig = jnp.asarray(np.sort(rng.uniform(3.0, 11.0, (30, 1)), 0))
    x_norm = (x_orig - 3.0) / 8.0
    K_norm = cp.gram(p, x_norm, x_norm)
    K_orig = cp.gram(p2, x_orig, x_orig)
    np.testing.assert_allclose(np.asarray(K_orig), np.asarray(K_norm),
                               rtol=2e-6, atol=2e-6)
