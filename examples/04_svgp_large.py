"""BASELINE config 4: sparse variational GP (inducing points, ELBO) at
N=100k regression. O(bm² + m³) per step — N never enters a Cholesky.

Run: python examples/04_svgp_large.py [--n 100000 --m 512 --steps 3000]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import gaussianprocessfundamentals_tpu as gpf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--m", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (args.n, 1))
    f = np.sin(12 * x[:, 0]) + 0.5 * np.sin(31 * x[:, 0])
    y = f + 0.1 * rng.standard_normal(args.n)
    x, y = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)

    t0 = time.perf_counter()
    params, hist = gpf.fit_svgp(
        gpf.SquaredExponentialKernel(scaled=True), x, y,
        m=args.m, steps=args.steps, batch_size=args.batch,
        key=jr.PRNGKey(0), lr=1e-2,
    )
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0
    print(f"SVGP fit N={args.n} m={args.m}: {args.steps} steps in {dt:.1f}s "
          f"({args.steps/dt:.0f} steps/s)")
    print(f"-ELBO: {float(hist[0]):.0f} -> {float(hist[-1]):.0f}")

    fm, fv = gpf.svgp_predict(
        gpf.SquaredExponentialKernel(scaled=True), params, x[:20_000]
    )
    mse = float(jnp.mean((fm - y[:20_000]) ** 2))
    print(f"pred MSE on 20k train points: {mse:.4f} (noise floor 0.01)")


if __name__ == "__main__":
    main()
