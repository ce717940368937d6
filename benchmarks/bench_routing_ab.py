"""Routing A/B on the REAL iterative program: fused-Pallas vs streamed-XLA
matvec/VJP inside the full NLL+gradient step (not standalone ops).

Motivated by the r4 standalone measurement that the streamed XLA matvec has
become competitive with (even faster than) the fused tiles at N=100k — XLA
fuses the checkpointed panel build with its consuming matmul. The routing
default must be set by the composed program, where the matvec sits inside
mBCG's while_loop and the gradient contraction follows.

Env knobs (PROCESS-LEVEL: they are read at trace time and baked into the
jit cache, so set them before the process starts — flipping mid-process has
no effect): GPF_NO_FUSED=1 forces every router to the streamed fallback;
GPF_FORCE_FUSED=1 restores the Pallas tile matvec (since r4 the production
default matvec is streamed, so the script sets GPF_FORCE_FUSED itself for
its "fused" arm — without it both arms would measure the streamed matvec
and differ only in the VJP route).

Run (TPU, twice — once per knob):
  python benchmarks/bench_routing_ab.py                  # fused arm
  GPF_NO_FUSED=1 python benchmarks/bench_routing_ab.py   # streamed arm
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("GPF_NO_FUSED"):
    # the "fused" arm must opt back into the tile matvec now that the
    # production default is streamed
    os.environ["GPF_FORCE_FUSED"] = "1"

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    import gaussianprocessfundamentals_tpu as gpf
    from gaussianprocessfundamentals_tpu.models.iterative import (
        iterative_nll_and_grad_device,
    )
    from gaussianprocessfundamentals_tpu.utils.profiling import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    mode = "streamed" if os.environ.get("GPF_NO_FUSED") else "fused"
    rng = np.random.default_rng(0)
    key = jr.PRNGKey(0)
    for n in (50_000, 100_000):
        x = jnp.asarray(np.sort(rng.uniform(0, 1, (n, 1)), 0), jnp.float32)
        y = jnp.asarray(
            np.sin(8 * np.asarray(x)[:, 0]) + 0.1 * rng.standard_normal(n),
            jnp.float32,
        )
        kernel = gpf.SquaredExponentialKernel()
        params = {"lengthscale": jnp.asarray(0.1, jnp.float32)}

        def step(k):
            return iterative_nll_and_grad_device(
                kernel, params, x, y, 0.01, k,
                num_probes=8, max_iters=50, block=4096, precond_m=256,
                tol=3e-3, materialize=False,
            )

        nll, g, gn, resid = step(key)
        nll_h, res_h = jax.device_get((nll, jnp.median(resid)))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            nll, g, gn, resid = step(jr.fold_in(key, i))
            jax.device_get(nll)
            ts.append(time.perf_counter() - t0)
        print(
            f"mode={mode} n={n} step={np.median(ts)*1e3:.1f}ms "
            f"nll={float(nll_h):.1f} med_resid={float(res_h):.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
