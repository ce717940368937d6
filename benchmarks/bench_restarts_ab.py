"""Vmapped vs sequential iterative-fit restarts A/B (r4 VERDICT weak #4:
restarts used to run as r sequential fits, costing r× wall).

Usage: python benchmarks/bench_restarts_ab.py [--n=10000] [--restarts=3] [--steps=30]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n, restarts, steps = 10_000, 3, 30
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        if a.startswith("--restarts="):
            restarts = int(a.split("=", 1)[1])
        if a.startswith("--steps="):
            steps = int(a.split("=", 1)[1])

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    import gaussianprocessfundamentals_tpu as gpf
    from gaussianprocessfundamentals_tpu.models.iterative import fit_iterative
    from gaussianprocessfundamentals_tpu.utils.profiling import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0, 1, (n, 1)), 0), jnp.float32)
    y = jnp.asarray(np.sin(8 * np.asarray(x)[:, 0])
                    + 0.1 * rng.standard_normal(n), jnp.float32)
    k = gpf.SquaredExponentialKernel(scaled=True)
    kw = dict(steps=steps, lr=0.05, num_probes=8, max_iters=25, block=4096,
              precond_m=128, tol=3e-3, resid_guard=0.5,
              return_diagnostics=True)

    def run_vmapped():
        return fit_iterative(k, x, y, jr.PRNGKey(0), restarts=restarts, **kw)

    def run_sequential():
        outs = []
        for i in range(restarts + 1):
            outs.append(fit_iterative(
                k, x, y, jr.PRNGKey(0),
                init_key=None if i == 0 else jr.fold_in(jr.PRNGKey(0),
                                                        0xA110 + i),
                **kw,
            ))
        # force completion
        jax.device_get(outs[-1][2])
        return outs

    # warm both programs once (compile), then time
    out_v = run_vmapped()
    jax.device_get(out_v[2])
    t0 = time.perf_counter()
    out_v = run_vmapped()
    jax.device_get(out_v[2])
    t_v = time.perf_counter() - t0

    out_s = run_sequential()
    t0 = time.perf_counter()
    out_s = run_sequential()
    t_s = time.perf_counter() - t0

    print(json.dumps({
        "config": "restarts_ab", "n": n, "restarts": restarts, "steps": steps,
        "vmapped_s": round(t_v, 2), "sequential_s": round(t_s, 2),
        "speedup": round(t_s / t_v, 2),
        "vmapped_final_nll": round(float(out_v[2][-1]), 1),
        "frozen_frac": out_v[3]["frozen_frac"],
    }), flush=True)


if __name__ == "__main__":
    main()
