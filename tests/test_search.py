"""Greedy kernel-structure search tests."""
import jax.numpy as jnp
import numpy as np

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.models.search import (
    default_base_kernels,
    greedy_kernel_search,
)


def test_search_improves_over_single_base(key):
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 1, (150, 1)), axis=0)
    # periodic signal on a linear trend — needs a composite to model well
    y = np.sin(2 * np.pi * x[:, 0] / 0.25) + 2.0 * x[:, 0] + 0.05 * rng.standard_normal(150)
    res = greedy_kernel_search(
        jnp.asarray(x), jnp.asarray(y),
        max_depth=1, key=key, fit_kwargs={"steps": 120},
    )
    assert np.isfinite(res.score)
    base_scores = [s for name, s in res.history[: len(default_base_kernels())]]
    # the search never returns something worse than the best base kernel
    assert res.score <= min(base_scores) + 1e-6
    # one full expansion round was evaluated (add & multiply per base)
    assert len(res.history) >= len(default_base_kernels()) * 3
    # and composites were competitive on this composite-structured data
    comp_scores = [s for name, s in res.history if "+" in name or "*" in name]
    assert min(comp_scores) < min(base_scores) + 5.0
