"""BASELINE config 1: exact GP regression, SE kernel, 1-D synthetic N=1k.

Cholesky-based NLL + L-BFGS hyperparameter fit, posterior with ±2σ band.
Run: python examples/01_exact_gp.py [--n 1000]
"""
import argparse
import time

import jax.numpy as jnp
import numpy as np

import gaussianprocessfundamentals_tpu as gpf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--plot", default=None, help="path for an SVG plot")
    args = ap.parse_args()

    x, y = gpf.synth_se(n=args.n, lengthscale=0.2, noise_sd=0.1, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(y)

    gp = gpf.GaussianProcess(gpf.SquaredExponentialKernel(scaled=True))
    t0 = time.perf_counter()
    res = gp.fit(x, y, method="lbfgs", optimize_noise=True)
    dt = time.perf_counter() - t0
    print(f"fit in {dt:.2f}s: nll {res.nll_pre:.1f} -> {res.nll_post:.1f}")
    print(
        f"lengthscale={float(res.kernel_params['lengthscale']):.4f} "
        f"variance={float(res.kernel_params['variance']):.4f} "
        f"noise={float(res.noise):.5f}"
    )

    xs = jnp.linspace(0, 1, 200)[:, None].astype(x.dtype)
    post = gp.posterior(xs)
    print(f"posterior: mean range [{float(post.mean.min()):.2f}, "
          f"{float(post.mean.max()):.2f}], mean sd {float(post.sd.mean()):.3f}")
    if args.plot:
        from gaussianprocessfundamentals_tpu.viz.plots import plot_posterior

        plot_posterior(xs, post.mean, post.sd, x_train=x, y_train=y,
                       path=args.plot)
        print("plot:", args.plot)


if __name__ == "__main__":
    main()
