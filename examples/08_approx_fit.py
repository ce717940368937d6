"""Approximation-objective fitting: Nyström / SKC / SKI with trainable
inducing inputs, plus hyperparameter bound enforcement.

The reference's production fitter optimises trainable inducing-index
variables jointly with the hyperparameters for Nyström/SKC objectives
(``/root/reference/main/gpbasics/Optimizer/Fitter.py:76-89``) and pushes
gradients back inside hyperparameter bounds (``Fitter.py:122-152``). Here:
``fit(approximation=..., optimize_inducing=True)`` puts continuous inducing
LOCATIONS in the optimisation pytree, and ``enforce_bounds=True`` projects
each optimiser step into ``kernel.bounds``.

Run: python examples/08_approx_fit.py [--n 20000]
"""
import argparse
import time

import jax.numpy as jnp
import numpy as np

import gaussianprocessfundamentals_tpu as gpf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--m", type=int, default=128)
    args = ap.parse_args()

    x, y = gpf.synth_se(n=args.n, lengthscale=0.2, noise_sd=0.1, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(y)

    gp = gpf.GaussianProcess(gpf.SquaredExponentialKernel(scaled=True))
    t0 = time.perf_counter()
    res = gp.fit(
        x, y, method="adam", steps=300, optimize_noise=True,
        approximation="nystroem", n_inducing=args.m, optimize_inducing=True,
    )
    dt = time.perf_counter() - t0
    print(f"nystroem m={args.m} fit in {dt:.2f}s: "
          f"nll {res.nll_pre:.1f} -> {res.nll_post:.1f}")
    print(f"inducing moved by {float(jnp.std(res.inducing)):.3f} (std)")

    # posterior goes through the O(nm²) projected-process predictive
    xs = jnp.linspace(0, 1, 200)[:, None].astype(x.dtype)
    post = gp.posterior(xs)
    print(f"posterior mean range [{float(post.mean.min()):.2f}, "
          f"{float(post.mean.max()):.2f}], sd>=0: {bool((post.sd >= 0).all())}")

    # bound-enforced exact fit on a subset (reference bound semantics)
    sub = slice(0, min(args.n, 2000))
    resb = gpf.fit(
        gpf.SquaredExponentialKernel(), x[sub], y[sub], method="lbfgs",
        optimize_noise=True, enforce_bounds=True,
    )
    xr = jnp.stack([x[sub].min(0), x[sub].max(0)], -1)
    lo, hi = gpf.SquaredExponentialKernel().bounds(np.asarray(xr), int(x[sub].shape[0]))
    ls = float(resb.kernel_params["lengthscale"])
    print(f"bounded fit: lengthscale {ls:.4f} in "
          f"[{lo['lengthscale']:.4f}, {hi['lengthscale']:.4f}]")


if __name__ == "__main__":
    main()
