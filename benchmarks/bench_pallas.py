"""Pallas fused Gram tiles vs the XLA-native Gram builder on the TPU.

SURVEY.md §7 build step 3 / r2 VERDICT weak #3: measure the fused
[bm, bn]-tile kernels (``ops.pallas_gram``) against ``kernel.gram`` +
``linalg.cholesky.add_diag`` (the unfused XLA path) at production sizes, with
GFLOP/s and a speed-of-light analysis, so the default path is chosen by data.

Timing through the tunnel: ``jax.device_get`` of a scalar is the only honest
sync (CLAUDE.md); every candidate therefore reduces K to one scalar inside the
jitted program — the reduction cost is identical across candidates.

Run: python benchmarks/bench_pallas.py  (TPU; ~min for first compiles)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 5

# v5e single-chip roofline constants (public spec): HBM ~819 GB/s.
HBM_GBPS = 819.0


def timed_scalar(fn):
    import jax

    out = fn()
    jax.device_get(out)  # warm compile + sync
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.device_get(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    import gaussianprocessfundamentals_tpu as gpf
    from gaussianprocessfundamentals_tpu.linalg.cholesky import add_diag
    from gaussianprocessfundamentals_tpu.ops.pallas_gram import (
        matern_gram,
        se_gram,
    )
    from gaussianprocessfundamentals_tpu.utils.profiling import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    rng = np.random.default_rng(0)
    se = gpf.SquaredExponentialKernel(scaled=True)
    m52 = gpf.Matern52Kernel(scaled=True)

    for n in (10_000, 50_000):
        x = jnp.asarray(np.sort(rng.uniform(0, 1, (n, 1)), 0), jnp.float32)
        p = {"lengthscale": jnp.asarray(0.1, jnp.float32),
             "variance": jnp.asarray(1.3, jnp.float32)}
        diag = 0.01 + 1e-6

        @jax.jit
        def xla_se(x=x, p=p):
            return jnp.sum(add_diag(se.gram(p, x, x), diag))

        @jax.jit
        def pl_se(x=x, p=p):
            return jnp.sum(se_gram(x, x, p["lengthscale"], p["variance"], diag))

        @jax.jit
        def xla_m52(x=x, p=p):
            return jnp.sum(add_diag(m52.gram(p, x, x), diag))

        @jax.jit
        def pl_m52(x=x, p=p):
            return jnp.sum(
                matern_gram(x, x, p["lengthscale"], p["variance"], diag, "52")
            )

        # correctness cross-check before timing
        a, b = jax.device_get((xla_se(), pl_se()))
        rel = abs(float(a) - float(b)) / abs(float(a))
        assert rel < 1e-4, ("pallas SE mismatch", rel)
        a, b = jax.device_get((xla_m52(), pl_m52()))
        rel_m = abs(float(a) - float(b)) / abs(float(a))
        assert rel_m < 1e-4, ("pallas M52 mismatch", rel_m)

        sol_ms = 4.0 * n * n / (HBM_GBPS * 1e9) * 1e3  # write K once
        for name, fn in (("se_xla", xla_se), ("se_pallas", pl_se),
                         ("m52_xla", xla_m52), ("m52_pallas", pl_m52)):
            dt = timed_scalar(fn)
            print(json.dumps({
                "config": f"gram_{name}", "n": n, "ms": round(dt * 1e3, 2),
                "transcendental_G_per_s": round(n * n / dt / 1e9, 1),
                "hbm_sol_ms": round(sol_ms, 2),
                "x_sol": round(dt * 1e3 / sol_ms, 1),
            }), flush=True)

    # ---- fused Gram·V matvec (the iterative-fit hot op) vs streamed XLA ----
    from gaussianprocessfundamentals_tpu.ops.gram_matvec import (
        streamed_gram_matvec,
    )
    from gaussianprocessfundamentals_tpu.ops.pallas_gram import (
        fused_gram_matvec,
    )

    se_plain = gpf.SquaredExponentialKernel()
    for n in (50_000, 100_000):
        x = jnp.asarray(np.sort(rng.uniform(0, 1, (n, 1)), 0), jnp.float32)
        V = jnp.asarray(rng.standard_normal((n, 9)), jnp.float32)
        p1 = {"lengthscale": jnp.asarray(0.1, jnp.float32)}

        @jax.jit
        def mv_stream(x=x, V=V, p1=p1):
            return jnp.sum(streamed_gram_matvec(se_plain, p1, x, V, 4096))

        @jax.jit
        def mv_fused(x=x, V=V, p1=p1):
            return jnp.sum(fused_gram_matvec(x, V, p1["lengthscale"]))

        a, b = jax.device_get((mv_stream(), mv_fused()))
        rel = abs(float(a) - float(b)) / max(abs(float(a)), 1e-30)
        for name, fn in (("stream_xla", mv_stream), ("fused_pallas", mv_fused)):
            dt = timed_scalar(fn)
            # traffic model: streamed writes+reads each K panel (2·4·n² bytes)
            print(json.dumps({
                "config": f"matvec_{name}", "n": n, "r": 9,
                "ms": round(dt * 1e3, 2), "rel_err_vs_other": round(rel, 7),
                "hbm_gb_touched_streamed_model": round(8.0 * n * n / 1e9, 1),
            }), flush=True)

    # ---- COMPOSITE matvec A/B (config 2's kernel; r4 VERDICT item 4):
    # in-tile AST engine vs streamed XLA for SE·PER + SE + LIN + WN ----
    from gaussianprocessfundamentals_tpu.ops.pallas_expr import (
        expr_matvec_for,
    )

    mauna = (
        gpf.SquaredExponentialKernel(scaled=True) * gpf.PeriodicKernel()
        + gpf.SquaredExponentialKernel()
        + gpf.LinearKernel()
        + gpf.WhiteNoiseKernel(scaled=True)
    )
    for n in (50_000, 100_000):
        x = jnp.asarray(np.sort(rng.uniform(0, 1, (n, 1)), 0), jnp.float32)
        V = jnp.asarray(rng.standard_normal((n, 9)), jnp.float32)
        pm = mauna.init_params([[0.0, 1.0]], n, dtype=jnp.float32)
        mv_expr = expr_matvec_for(mauna, pm, x)
        assert mv_expr is not None, "composite failed to route to pallas_expr"

        @jax.jit
        def mvc_stream(x=x, V=V, pm=pm):
            return jnp.sum(streamed_gram_matvec(mauna, pm, x, V, 4096))

        @jax.jit
        def mvc_expr(V=V):
            return jnp.sum(mv_expr(V))

        a, b = jax.device_get((mvc_stream(), mvc_expr()))
        rel = abs(float(a) - float(b)) / max(abs(float(a)), 1e-30)
        for name, fn in (("stream_xla", mvc_stream), ("expr_pallas", mvc_expr)):
            dt = timed_scalar(fn)
            print(json.dumps({
                "config": f"composite_matvec_{name}", "n": n, "r": 9,
                "ms": round(dt * 1e3, 2), "rel_err_vs_other": round(rel, 7),
            }), flush=True)


if __name__ == "__main__":
    main()
