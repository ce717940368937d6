"""Checkpoint round-trip tests (the loader the reference lacks, SURVEY.md §5.4)."""
import jax.numpy as jnp
import numpy as np

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.utils import checkpoint as ckpt


def test_save_load_roundtrip(tmp_path):
    k = gpf.SquaredExponentialKernel(scaled=True) * gpf.PeriodicKernel() + gpf.LinearKernel()
    m = gpf.ConstantMean() + gpf.LinearMean()
    kp = k.init_params([[0.0, 2.0]], 50)
    mp = m.init_params([[0.0, 2.0]], 50)
    path = str(tmp_path / "model")
    ckpt.save(path, k, kp, m, mp, noise=0.123)
    k2, kp2, m2, mp2, noise = ckpt.load(path)
    assert k2 == k and m2 == m and abs(noise - 0.123) < 1e-12
    import jax

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        kp, kp2,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        mp, mp2,
    )
    # loaded model predicts identically
    x, y = gpf.synth_se(n=40, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(y)
    xs = x[:10]
    p1 = gpf.posterior(k, kp, x, y, xs, 0.1, mean=m, mean_params=mp)
    p2 = gpf.posterior(k2, kp2, x, y, xs, 0.1, mean=m2, mean_params=mp2)
    np.testing.assert_allclose(np.asarray(p1.mean), np.asarray(p2.mean))


def test_orbax_roundtrip(tmp_path):
    state = {"a": jnp.arange(5.0), "nested": {"b": jnp.ones((2, 2))}}
    path = str(tmp_path / "orbax_ckpt")
    ckpt.save_orbax(path, state)
    restored = ckpt.load_orbax(path)
    np.testing.assert_allclose(np.asarray(restored["a"]), np.arange(5.0))
    np.testing.assert_allclose(np.asarray(restored["nested"]["b"]), np.ones((2, 2)))
