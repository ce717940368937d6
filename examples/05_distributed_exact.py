"""BASELINE config 5: exact GP via distributed block-cyclic Cholesky over a
device mesh (multi-host ready: jax.distributed.initialize + the same code).

On a single-chip or CPU host, fake the mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python examples/05_distributed_exact.py --n 4096 --block 128
"""
import argparse
import time

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.parallel.block_cholesky import (
    distributed_chol_solve,
    distributed_cholesky,
    distributed_nll,
)
from gaussianprocessfundamentals_tpu.parallel.distributed_fit import fit_distributed
from gaussianprocessfundamentals_tpu.parallel.meshes import single_axis_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--fit-steps", type=int, default=30)
    args = ap.parse_args()

    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].platform}")
    mesh = single_axis_mesh("tp")

    x, y = gpf.synth_se(n=args.n, lengthscale=0.2, noise_sd=0.1, seed=0)
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    k = gpf.SquaredExponentialKernel()
    p = {"lengthscale": jnp.asarray(0.2, jnp.float32)}

    with mesh:
        K = k.gram(p, x, x)
        t0 = time.perf_counter()
        nll = float(distributed_nll(K, y, 0.01, 1e-6, mesh, block=args.block))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        nll = float(distributed_nll(K, y, 0.01, 1e-6, mesh, block=args.block))
        t2 = time.perf_counter() - t0
    print(f"distributed NLL n={args.n} (block={args.block}, "
          f"{len(devs)} devices): {nll:.1f}; compile+run {t1:.1f}s, "
          f"steady {t2*1e3:.0f}ms")

    # r5 fast path: statically-unrolled factor + EXACT distributed posterior
    # (matmul-only multi-RHS substitutions; 0.145 s factor at n=16,384 on a
    # v5e vs 4.7 s for the fori_loop form — BENCHMARKS.md r5)
    from gaussianprocessfundamentals_tpu.parallel.block_cholesky import (
        distributed_posterior,
    )

    xs = jnp.linspace(0.05, 0.95, 64, dtype=jnp.float32)[:, None]
    with mesh:
        t0 = time.perf_counter()
        mu, var = distributed_posterior(
            k, p, x, y, xs, 0.01, 1e-6, mesh, block=args.block
        )
        mu.block_until_ready()
        print(f"distributed exact posterior (64 test pts): "
              f"{time.perf_counter()-t0:.1f}s incl compile; "
              f"sd range [{float(jnp.sqrt(var).min()):.3f}, "
              f"{float(jnp.sqrt(var).max()):.3f}]")

    kp, noise, hist = fit_distributed(
        k, x, y, mesh, jr.PRNGKey(0), block=args.block,
        steps=args.fit_steps, probes=8, lr=0.1,
    )
    print(f"distributed fit: nll {hist[0]:.1f} -> {hist[-1]:.1f}, "
          f"lengthscale {float(kp['lengthscale']):.3f}, noise {noise:.4f}")


if __name__ == "__main__":
    main()
