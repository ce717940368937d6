"""Large-N exact GP the r4 way: streaming iterative fit (single- or
multi-chip) and automatic method routing.

Two production paths demonstrated:

1. ``fit(method="auto")`` — picks the factorisation-free mBCG+SLQ objective
   above n=8k (measured crossover: the dense custom-VJP step is ~190 ms at
   N=10k while the iterative step is ~160 ms and scales as matvecs, not
   O(n³)); below the crossover it stays on dense L-BFGS.

2. ``fit_iterative(mesh=...)`` — the mesh-sharded STREAMING path: each chip
   contracts its K(x_rows, x) panel against the replicated RHS on the fly
   (no resident n²/P K panels; per-chip memory O(n·(d+r))), psum'd
   gradients. This is the BASELINE config-5 (N=200k multi-host) memory
   model; here it runs on whatever mesh is available.

Fake an 8-device mesh on CPU (NOTE: on hosts whose sitecustomize ignores
the JAX_PLATFORMS env var — e.g. the axon image — the CPU pin must happen
in Python, which this script does itself when --cpu is passed):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/09_streaming_multichip.py --n 4096 --cpu
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.fit.fit import fit
from gaussianprocessfundamentals_tpu.models.iterative import fit_iterative
from gaussianprocessfundamentals_tpu.parallel.meshes import single_axis_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--cpu", action="store_true",
                    help="pin to CPU in Python (env vars may be ignored)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    n = args.n
    x = jnp.asarray(np.sort(rng.uniform(0, 1, (n, 1)), 0), jnp.float32)
    y = jnp.asarray(
        np.sin(8 * np.asarray(x)[:, 0]) + 0.1 * rng.standard_normal(n),
        jnp.float32,
    )

    # 1. automatic routing — the one-call API
    t0 = time.perf_counter()
    res = fit(
        gpf.SquaredExponentialKernel(scaled=True), x, y,
        key=jr.PRNGKey(0), method="auto", optimize_noise=True,
        noise=1e-2, steps=args.steps,
    )
    print(
        f"fit(auto): n={n} {time.perf_counter()-t0:.1f}s "
        f"nll {res.nll_pre:.1f} -> {res.nll_post:.1f} "
        f"noise={float(res.noise):.4f} "
        f"route={'iterative' if res.diagnostics else 'dense-lbfgs'}"
        + (f" frozen_frac={res.diagnostics['frozen_frac']:.2f}"
           if res.diagnostics else "")
    )

    # 2. explicit mesh-sharded streaming fit across all devices
    mesh = single_axis_mesh("tp")
    print(f"mesh: {mesh.shape} on {jax.devices()[0].platform}")
    with mesh:
        t0 = time.perf_counter()
        kp, noise, hist, diag = fit_iterative(
            gpf.SquaredExponentialKernel(), x, y, jr.PRNGKey(1),
            steps=args.steps, lr=0.08, num_probes=4, max_iters=50,
            precond_m=min(128, n // 4), mesh=mesh, mesh_axis="tp",
            resid_guard=0.5, return_diagnostics=True,
        )
    print(
        f"fit_iterative(mesh): {time.perf_counter()-t0:.1f}s "
        f"nll {float(hist[0]):.1f} -> {float(hist[-1]):.1f} "
        f"ls={float(kp['lengthscale']):.4f} noise={float(noise):.4f} "
        f"frozen_frac={diag['frozen_frac']:.2f}"
    )


if __name__ == "__main__":
    main()
