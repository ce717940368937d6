"""Warm N=10k fit wall-clock: fit(method="auto") routed to the iterative
objective vs the r3 dense L-BFGS number (84 s, ~200 iterations).

r4 VERDICT item 6 target: < 30 s warm. "Warm" = second run of the same
program (XLA persistent cache + loaded tunnel); the cold number is dominated
by remote compile.

Run on TPU: python benchmarks/bench_fit_auto.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    import gaussianprocessfundamentals_tpu as gpf
    from gaussianprocessfundamentals_tpu.fit.fit import fit
    from gaussianprocessfundamentals_tpu.utils.profiling import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    n = 10_000
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0, 1, (n, 1)), 0), jnp.float32)
    y = jnp.asarray(
        np.sin(8 * np.asarray(x)[:, 0]) + 0.1 * rng.standard_normal(n),
        jnp.float32,
    )
    k = gpf.SquaredExponentialKernel(scaled=True)

    def run(steps=120):
        t0 = time.perf_counter()
        res = fit(
            k, x, y, key=jr.PRNGKey(0), method="auto",
            optimize_noise=True, noise=1e-2, steps=steps, lr=0.05,
        )
        dt = time.perf_counter() - t0
        return dt, res

    dt_cold, res = run()
    dt_warm, res = run()
    print(
        f"fit_auto n={n} cold={dt_cold:.1f}s warm={dt_warm:.1f}s "
        f"nll_post={res.nll_post:.1f} ls={float(res.kernel_params['lengthscale']):.4f} "
        f"noise={float(res.noise):.4f} frozen={res.diagnostics['frozen_frac']:.2f} "
        f"backend={jax.default_backend()}",
        flush=True,
    )


if __name__ == "__main__":
    main()
