"""r5 block-cyclic Cholesky performance: unrolled fast path vs the r4
fori_loop body vs dense XLA Cholesky, single chip (r4 VERDICT weak #2 —
warm factor was 4.7 s at n=16,384/block 256, ~20x the dense extrapolation;
target <= 1 s).

Usage: python benchmarks/bench_blockchol_unrolled.py [--n=16384] [--blocks=512,1024]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    import jax

    return float(jax.device_get(x))


def main() -> None:
    n = 16384
    blocks = [512, 1024]
    run_fori = False
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        if a.startswith("--blocks="):
            blocks = [int(v) for v in a.split("=", 1)[1].split(",")]
        if a == "--fori":
            run_fori = True

    import jax
    import jax.numpy as jnp

    import gaussianprocessfundamentals_tpu as gpf
    from gaussianprocessfundamentals_tpu.linalg import cholesky as chol
    from gaussianprocessfundamentals_tpu.parallel.block_cholesky import (
        distributed_chol_solve_inv,
        distributed_cholesky,
        distributed_cholesky_factor,
    )
    from gaussianprocessfundamentals_tpu.parallel.meshes import (
        single_axis_mesh,
    )
    from gaussianprocessfundamentals_tpu.utils.profiling import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0, 1, (n, 1)), 0), jnp.float32)
    k = gpf.SquaredExponentialKernel()
    K = k.gram({"lengthscale": jnp.float32(0.1)}, x, x)
    K = K + 0.05 * jnp.eye(n, dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal(n), jnp.float32)
    sync(K[0, 0])
    print("gram built", flush=True)

    # dense XLA reference on the same chip
    dense = jax.jit(jnp.linalg.cholesky)
    Ld = dense(K)
    sync(Ld[0, 0])
    t0 = time.perf_counter()
    Ld = dense(K)
    sync(Ld[0, 0])
    t_dense = time.perf_counter() - t0
    want_logdet = 2.0 * sync(jnp.sum(jnp.log(jnp.diagonal(Ld))))
    print(f"dense XLA cholesky warm {t_dense:.3f}s logdet={want_logdet:.2f}",
          flush=True)

    mesh = single_axis_mesh("tp", devices=jax.devices()[:1])
    rows = []
    for blk in blocks:
        with mesh:
            t0 = time.perf_counter()
            L, Linv, logdet = distributed_cholesky_factor(K, mesh, "tp", blk)
            ld = sync(logdet)
            t_cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            L, Linv, logdet = distributed_cholesky_factor(K, mesh, "tp", blk)
            ld = sync(logdet)
            t_warm = time.perf_counter() - t0
            al = distributed_chol_solve_inv(L, Linv, y, mesh, "tp", blk)
            a0 = sync(al[0])  # compile
            t0 = time.perf_counter()
            al = distributed_chol_solve_inv(L, Linv, y, mesh, "tp", blk)
            a0 = sync(al[0])
            t_solve = time.perf_counter() - t0
            err = abs(ld - want_logdet) / abs(want_logdet)
            print(f"UNROLLED block={blk}: factor cold {t_cold:.2f}s warm "
                  f"{t_warm:.3f}s solve {t_solve:.3f}s logdet rel err "
                  f"{err:.2e}", flush=True)
            rows.append({"path": "unrolled", "block": blk,
                         "factor_warm_s": round(t_warm, 3),
                         "solve_warm_s": round(t_solve, 3),
                         "logdet_rel_err": err})
            if run_fori:
                t0 = time.perf_counter()
                L2, ld2 = distributed_cholesky(K, mesh, "tp", blk)
                sync(ld2)
                t0 = time.perf_counter()
                L2, ld2 = distributed_cholesky(K, mesh, "tp", blk)
                sync(ld2)
                t_fori = time.perf_counter() - t0
                print(f"FORI     block={blk}: factor warm {t_fori:.2f}s",
                      flush=True)
                rows.append({"path": "fori", "block": blk,
                             "factor_warm_s": round(t_fori, 3)})
    print(json.dumps({"config": "blockchol_unrolled", "n": n,
                      "dense_warm_s": round(t_dense, 3), "rows": rows}))


if __name__ == "__main__":
    main()
