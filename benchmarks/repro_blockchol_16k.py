"""Minimal repro harness for the r3 single-chip axon segfault:
``distributed_nll`` (block-cyclic shard_map Cholesky) at n=16,384 on a
1-device TPU mesh crashed the axon worker (BENCHMARKS.md row 5 note).

Runs the program in stages with increasing size/scope and prints a marker
after each, so the crashing stage is identified even when the process dies.
Block-size sweep distinguishes "program too large" (nb=n/block sequential
panel steps unrolled... actually rolled via fori, but each step slices) from
a size-independent Mosaic/runtime bug.

Usage: python benchmarks/repro_blockchol_16k.py [--n 16384] [--blocks 256,512,1024]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n = 16384
    blocks = [1024, 512, 256]
    for a in sys.argv[1:]:
        if a.startswith("--n"):
            n = int(a.split("=", 1)[1])
        if a.startswith("--blocks"):
            blocks = [int(v) for v in a.split("=", 1)[1].split(",")]

    import jax
    import jax.numpy as jnp

    import gaussianprocessfundamentals_tpu as gpf
    from gaussianprocessfundamentals_tpu.parallel.block_cholesky import (
        distributed_chol_solve,
        distributed_cholesky,
    )
    from gaussianprocessfundamentals_tpu.parallel.meshes import (
        single_axis_mesh,
    )
    from gaussianprocessfundamentals_tpu.utils.profiling import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0, 1, (n, 1)), 0), jnp.float32)
    k = gpf.SquaredExponentialKernel()
    K = k.gram({"lengthscale": jnp.float32(0.1)}, x, x)
    K = K + 0.05 * jnp.eye(n, dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal(n), jnp.float32)
    jax.device_get(K[0, 0])
    print(f"STAGE gram n={n} ok", flush=True)

    mesh = single_axis_mesh("tp", devices=jax.devices()[:1])
    for blk in blocks:
        with mesh:
            t0 = time.perf_counter()
            L, logdet = distributed_cholesky(K, mesh, "tp", blk)
            ld = float(jax.device_get(logdet))
            t1 = time.perf_counter()
            print(f"STAGE factor n={n} block={blk} ok "
                  f"logdet={ld:.2f} t={t1-t0:.1f}s", flush=True)
            a = distributed_chol_solve(L, y, mesh, "tp", blk)
            a0 = float(jax.device_get(a[0]))
            print(f"STAGE solve n={n} block={blk} ok a0={a0:.4f} "
                  f"t={time.perf_counter()-t1:.1f}s", flush=True)
    print("ALL STAGES OK (no segfault)", flush=True)


if __name__ == "__main__":
    main()
