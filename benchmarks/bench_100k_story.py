"""N=100k end-to-end user story through the public facade, r5 edition:
mean-bearing exact-GP fit on the streaming route + df32 posterior moments.

r4 measured: zero-mean fit 108 s (60 steps) + posterior over 1000 points 8 s
warm, with variances FLOORED at ~1e-3*k_ii. r5 adds: a Constant+Linear mean
in the 100k optimisation pytree (r4 VERDICT missing #2 — this exact call
used to bail to a 40 GB dense program), and f64-grade variances with the
resolution-floor honesty warning.

Run on TPU: python benchmarks/bench_100k_story.py [--n=100000] [--steps=60]
"""
from __future__ import annotations

import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n, steps = 100_000, 60
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        if a.startswith("--steps="):
            steps = int(a.split("=", 1)[1])

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    import gaussianprocessfundamentals_tpu as gpf
    from gaussianprocessfundamentals_tpu.utils.profiling import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    xs_np = np.sort(rng.uniform(0, 1, (n, 1)), 0)
    f_true = np.sin(8 * xs_np[:, 0])
    trend = 2.0 + 3.0 * xs_np[:, 0]
    x = jnp.asarray(xs_np, jnp.float32)
    y = jnp.asarray(trend + f_true + 0.1 * rng.standard_normal(n),
                    jnp.float32)

    gp = gpf.GaussianProcess(
        gpf.SquaredExponentialKernel(scaled=True),
        mean=gpf.ConstantMean() + gpf.LinearMean(dim=1),
    )
    t0 = time.perf_counter()
    res = gp.fit(
        x, y, method="auto", key=jr.PRNGKey(0), optimize_noise=True,
        noise=1e-2, steps=steps, lr=0.05,
        iterative_kwargs={"max_iters": 25, "block": 4096, "precond_m": 256,
                          "tol": 3e-3, "early_exit": False,
                          "scan_chunk": 10},
    )
    t_fit = time.perf_counter() - t0
    mp = res.mean_params
    const = float(mp["children"][0]["c"])
    slope = float(mp["children"][1]["slope"][0])
    print(f"fit: {t_fit:.1f}s  noise={float(res.noise):.4f} "
          f"mean const={const:.3f} (true 2.0) slope={slope:.3f} (true 3.0) "
          f"frozen={res.diagnostics['frozen_frac']:.2f}", flush=True)

    xt_np = np.linspace(0.01, 0.99, 1000)[:, None]
    xt = jnp.asarray(xt_np, jnp.float32)
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        t0 = time.perf_counter()
        post = gp.posterior(xt)
        jax.device_get(post.mean)
        t_post_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        post = gp.posterior(xt)
        jax.device_get(post.mean)
        t_post = time.perf_counter() - t0
    floor_warned = any("resolution" in str(w.message) for w in wlist)
    mu = np.asarray(post.mean, np.float64)
    truth = 2.0 + 3.0 * xt_np[:, 0] + np.sin(8 * xt_np[:, 0])
    rmse = float(np.sqrt(np.mean((mu - truth) ** 2)))
    sd = np.asarray(post.sd, np.float64)
    print(f"posterior(1000 pts): cold {t_post_cold:.1f}s warm {t_post:.1f}s "
          f"mean-RMSE vs truth {rmse:.4f} sd range [{sd.min():.2e}, "
          f"{sd.max():.2e}] floor_warned={floor_warned}", flush=True)
    print(json.dumps({
        "config": "story_100k_mean", "n": n, "steps": steps,
        "fit_s": round(t_fit, 1), "s_per_step": round(t_fit / steps, 2),
        "noise": round(float(res.noise), 4),
        "mean_const": round(const, 3), "mean_slope": round(slope, 3),
        "frozen_frac": res.diagnostics["frozen_frac"],
        "posterior_warm_s": round(t_post, 1),
        "mean_rmse_vs_truth": round(rmse, 4),
        "sd_min": float(sd.min()), "sd_max": float(sd.max()),
        "floor_warned": floor_warned,
    }), flush=True)


if __name__ == "__main__":
    main()
