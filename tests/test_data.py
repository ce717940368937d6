"""Data-layer tests (reference ``DataHandling/``)."""
import numpy as np

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.data.datasets import DataInput, MinMaxNormalization
from gaussianprocessfundamentals_tpu.objectives.metrics import kfold_indices


def test_minmax_roundtrip():
    v = np.array([[1.0, -2.0], [3.0, 4.0], [2.0, 0.0]])
    nz = MinMaxNormalization.fit(v)
    w = nz.normalize(v)
    assert w.min() == 0.0 and w.max() == 1.0
    np.testing.assert_allclose(nz.denormalize(w), v, atol=1e-12)


def test_datainput_split_and_ranges():
    x = np.linspace(0, 10, 100)
    y = np.sin(x)
    di = DataInput.from_arrays(x, y, test_ratio=0.2, seed=0)
    assert di.x_train.shape == (80, 1) and di.x_test.shape == (20, 1)
    xr = np.asarray(di.xrange())
    assert xr.shape == (1, 2) and xr[0, 0] >= 0.0 and xr[0, 1] <= 1.0  # normalized
    assert di.n_inducing() == 20  # max(20, 0.1·80)


def test_no_split_means_test_equals_train():
    di = DataInput.from_arrays(np.arange(10.0), np.arange(10.0), test_ratio=0.0)
    np.testing.assert_allclose(np.asarray(di.x_train), np.asarray(di.x_test))


def test_subsets():
    di = DataInput.from_arrays(np.arange(100.0), np.arange(100.0), test_ratio=0.0)
    assert di.subset_random(30).n_train == 30
    sg = di.subset_grid(30)
    assert sg.n_train == 30
    # grid subset keeps order and endpoints
    xg = np.asarray(sg.x_train[:, 0])
    assert xg[0] == di.x_train[0, 0] and xg[-1] == di.x_train[-1, 0]


def test_changepoint_split():
    x = np.linspace(0, 1, 50)
    di = DataInput.from_arrays(x, x, test_ratio=0.2, normalize_x=False, normalize_y=False)
    segs = di.split_at_changepoints([0.5])
    assert len(segs) == 2
    total = sum(s.n_train for s in segs)
    assert total == di.n_train
    assert np.all(np.asarray(segs[0].x_train[:, 0]) < 0.5)
    assert np.all(np.asarray(segs[1].x_train[:, 0]) >= 0.5)


def test_named_dataset_synthetic_fallback():
    di = gpf.load_named("mauna_loa")
    assert di.n_train > 100 and di.x_train.shape[1] == 1


def test_all_named_datasets_have_fallbacks():
    """Every reference-named dataset (DatasetHandler.py:138-172) loads even
    without its CSV; power_plant keeps the reference's 4-D input shape."""
    dims = {"solar_irradiance": 1, "mauna_loa": 1, "power_plant": 4,
            "gefcom": 1, "temperature": 1, "births": 1}
    for name, d in dims.items():
        di = gpf.load_named(name)
        assert di.x_train.shape[1] == d, name
        assert di.n_train > 100, name
        assert np.all(np.isfinite(np.asarray(di.y_train))), name


def test_kfold(key):
    folds = kfold_indices(50, 5, key)
    assert len(folds) == 5
    all_test = np.sort(np.concatenate([t for _, t in folds]))
    np.testing.assert_array_equal(all_test, np.arange(50))
    for train, test in folds:
        assert len(np.intersect1d(train, test)) == 0


def test_subset_smoothed_grid():
    """Smoothed-grid SOD: grid x positions, y Nadaraya-Watson-smoothed.
    (The reference declares but never implements this approach —
    AbstractDataInput.py:138, DataInput.get_subset raises.)"""
    import jax.numpy as jnp

    from gaussianprocessfundamentals_tpu.data.datasets import DataInput

    n = 200
    x = np.linspace(0, 1, n)[:, None]
    rng = np.random.default_rng(0)
    y = np.sin(6 * x[:, 0]) + 0.3 * rng.standard_normal(n)
    di = DataInput(jnp.asarray(x), jnp.asarray(y), jnp.asarray(x), jnp.asarray(y))
    sub = di.subset_smoothed_grid(40)
    assert sub.x_train.shape == (40, 1)
    # smoothing reduces residual noise vs the raw grid subset
    truth = np.sin(6 * np.asarray(sub.x_train)[:, 0])
    raw = di.subset_grid(40)
    err_smooth = np.mean((np.asarray(sub.y_train) - truth) ** 2)
    err_raw = np.mean((np.asarray(raw.y_train) - np.sin(6 * np.asarray(raw.x_train)[:, 0])) ** 2)
    assert err_smooth < err_raw


def test_subset_smoothed_grid_anisotropic_and_params_default():
    """ADVICE r1: (a) default bandwidth is per-dimension (ARD) so anisotropic
    inputs smooth correctly; (b) passing a smoothing_kernel without params
    builds defaults instead of crashing."""
    import jax.numpy as jnp

    from gaussianprocessfundamentals_tpu.data.datasets import DataInput
    from gaussianprocessfundamentals_tpu.kernels.leaves import (
        SquaredExponentialKernel,
    )

    n = 300
    rng = np.random.default_rng(1)
    # dim 0 spans [0, 1], dim 1 spans [0, 1000] — wildly anisotropic
    x = np.stack([rng.uniform(0, 1, n), rng.uniform(0, 1000, n)], axis=1)
    y = np.sin(6 * x[:, 0]) + np.cos(x[:, 1] / 200.0) + 0.3 * rng.standard_normal(n)
    di = DataInput(jnp.asarray(x), jnp.asarray(y), jnp.asarray(x), jnp.asarray(y))
    sub = di.subset_smoothed_grid(50)
    assert sub.x_train.shape[0] == 50
    # with an isotropic mean-span bandwidth (~10), dim 0 would be smoothed
    # to mush; the ARD default keeps per-point y variation alive
    assert float(jnp.std(sub.y_train)) > 0.3

    # kernel given, params omitted → defaults, no crash
    sub2 = di.subset_smoothed_grid(50, smoothing_kernel=SquaredExponentialKernel())
    assert sub2.y_train.shape == (50,)
    assert np.all(np.isfinite(np.asarray(sub2.y_train)))


def test_rescale_kernel_params_roundtrip():
    """DataInput.rescale_kernel_params maps fitted lengthscales back to the
    original x units via the stored min-max normalisation."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.uniform(100.0, 300.0, (50, 1))
    y = np.sin(x[:, 0] / 30.0)
    di = gpf.DataInput.from_arrays(x, y, test_ratio=0.0)
    k = gpf.SquaredExponentialKernel()
    p = {"lengthscale": jnp.asarray(0.1, jnp.float32)}
    p_orig = di.rescale_kernel_params(k, p)
    span = float(x.max() - x.min())
    np.testing.assert_allclose(float(p_orig["lengthscale"]), 0.1 * span,
                               rtol=1e-4)
