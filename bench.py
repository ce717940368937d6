"""Benchmark harness: exact-GP NLL+gradient step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric (per BASELINE.md): Cholesky+loglik throughput for the exact-GP fit
step at N=10k — the hot op of ``VariationalSgdFitter.fit()`` in the reference
(Gram build O(n²·leaves) + Cholesky O(n³) + solves, reference
``Statistics/CovarianceMatrix.py:187-265``). The reference publishes no
numbers and is CPU/f64-only, so ``vs_baseline`` is the measured speedup over
a NumPy/LAPACK f64 single-process forward NLL on this host's CPU — the
reference's own compute substrate.

FLOP model (documented, conservative): forward Cholesky n³/3 + solves 2n² +
Gram 2n²(d+2); backward ≈ 2× forward for the factorisation path → total
n³ + 4n²(d+2) per NLL+grad step.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

N = 10_000
D = 1
REPS = 5


def cpu_baseline_time(x: np.ndarray, y: np.ndarray, ls: float, noise: float) -> float:
    """Forward NLL (Gram+Cholesky+solves+logdet) in NumPy/LAPACK f64 — the
    reference's compute path (TF CPU f64) without TF overheads (favourable to
    the baseline)."""
    import scipy.linalg as sla

    t0 = time.perf_counter()
    d2 = (
        (x * x).sum(-1, keepdims=True)
        - 2.0 * (x @ x.T)
        + (x * x).sum(-1, keepdims=True).T
    )
    K = np.exp(-0.5 * np.maximum(d2, 0) / ls**2)
    K[np.diag_indices_from(K)] += noise
    L = sla.cholesky(K, lower=True)
    alpha = sla.cho_solve((L, True), y)
    nll = 0.5 * y @ alpha + np.log(np.diag(L)).sum() + 0.5 * len(y) * np.log(2 * np.pi)
    _ = float(nll)
    return time.perf_counter() - t0


def main() -> None:
    import jax
    import jax.numpy as jnp

    import gaussianprocessfundamentals_tpu as gpf
    from gaussianprocessfundamentals_tpu.fit.fit import init_uparams, make_nll
    from gaussianprocessfundamentals_tpu.means.functions import ZeroMean

    rng = np.random.default_rng(0)
    x_np = np.sort(rng.uniform(0, 1, (N, D)), axis=0)
    y_np = np.sin(8 * x_np[:, 0]) + 0.1 * rng.standard_normal(N)

    dtype = jnp.float32
    x = jnp.asarray(x_np, dtype)
    y = jnp.asarray(y_np, dtype)

    kernel = gpf.SquaredExponentialKernel(scaled=True)
    mean = ZeroMean()
    nll_fn = make_nll(kernel, mean, x, y, optimize_noise=True)
    u0 = init_uparams(kernel, mean, [[0.0, 1.0]], N, optimize_noise=True, dtype=dtype)

    step = jax.jit(jax.value_and_grad(nll_fn))
    val, g = step(u0)  # compile
    jax.block_until_ready((val, g))

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        val, g = step(u0)
        jax.block_until_ready((val, g))
        times.append(time.perf_counter() - t0)
    step_time = float(np.median(times))

    flops = N**3 + 4 * N**2 * (D + 2)
    gflops = flops / step_time / 1e9

    t_cpu = min(cpu_baseline_time(x_np, y_np, 0.1, 0.01) for _ in range(2))
    # baseline does forward only; charge the step a forward-equivalent share
    fwd_flops = N**3 / 3 + 2 * N**2 * (D + 3)
    speedup = (t_cpu / fwd_flops) / (step_time / flops)

    print(
        json.dumps(
            {
                "metric": "exact-GP NLL+grad step GFLOP/s (N=10k, SE kernel, 1 chip)",
                "value": round(gflops, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(speedup, 2),
            }
        )
    )
    print(
        f"step_time={step_time*1e3:.1f}ms cpu_f64_forward={t_cpu*1e3:.1f}ms "
        f"backend={jax.default_backend()} nll={float(val):.2f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
