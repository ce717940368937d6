"""Block-cyclic distributed Cholesky scaling on the fake CPU mesh.

BASELINE config 5's first measured numbers (r4 VERDICT item 5): wall-clock
for ``parallel.block_cholesky.distributed_cholesky`` (+solve) at n=8k/16k on
4- vs 8-device CPU meshes. A CPU mesh has no ICI — absolute times mean
little — but the 4→8 ratio validates the panel-pipeline model: the trailing
GEMM update is the parallel bulk, so doubling devices should cut wall-clock
once n is large enough for compute to dominate the per-panel collectives.

Also doubles as the single-process stress harness for the (previously
unexplained) n=16k single-chip axon segfault: the same program and sizes,
minus the tunnel.

Usage: python benchmarks/bench_block_cholesky.py [--n 8192,16384] [--devs 4,8]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 8 virtual CPU devices BEFORE jax init (the axon sitecustomize ignores the
# env var, so pin in Python as well)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    ns = [8192, 16384]
    devs = [4, 8]
    for a in sys.argv[1:]:
        if a.startswith("--n"):
            ns = [int(v) for v in a.split("=", 1)[1].split(",")]
        if a.startswith("--devs"):
            devs = [int(v) for v in a.split("=", 1)[1].split(",")]

    from gaussianprocessfundamentals_tpu.parallel.block_cholesky import (
        distributed_chol_solve,
        distributed_cholesky,
    )
    from gaussianprocessfundamentals_tpu.parallel.meshes import (
        single_axis_mesh,
    )

    import gaussianprocessfundamentals_tpu as gpf

    block = 256
    results = {}
    for n in ns:
        x, y = gpf.synth_se(n=n, lengthscale=0.2, noise_sd=0.1, seed=0)
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        k = gpf.SquaredExponentialKernel()
        K = k.gram({"lengthscale": jnp.float32(0.2)}, x, x)
        K = K + 0.01 * jnp.eye(n, dtype=jnp.float32)
        for P in devs:
            mesh = single_axis_mesh("tp", devices=jax.devices()[:P])
            with mesh:
                L, logdet = distributed_cholesky(K, mesh, "tp", block)
                a = distributed_chol_solve(L, y, mesh, "tp", block)
                jax.device_get((logdet, a[:1]))  # compile + sync
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    L, logdet = distributed_cholesky(K, mesh, "tp", block)
                    a = distributed_chol_solve(L, y, mesh, "tp", block)
                    jax.device_get((logdet, a[:1]))
                    times.append(time.perf_counter() - t0)
            t = float(np.median(times))
            results[(n, P)] = t
            # O(n³/3) factor + O(n²) solves; per-device share
            gflops = (n**3 / 3.0) / t / 1e9
            print(
                f"n={n:6d} P={P} chol+solve={t*1e3:8.1f} ms "
                f"({gflops:6.1f} GFLOP/s total)",
                flush=True,
            )
    for n in ns:
        if (n, 4) in results and (n, 8) in results:
            print(
                f"n={n}: 4->8 device speedup "
                f"{results[(n,4)]/results[(n,8)]:.2f}x"
            )


if __name__ == "__main__":
    main()
