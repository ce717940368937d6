"""Kernel search at scale on the (real) Mauna Loa CO2 record — the
reference's raison d'etre exercised end-to-end through the TPU stack
(r4 VERDICT next-round item #9).

Greedy BIC-guided structure search (``models.search.greedy_kernel_search``,
mirroring the downstream model-selection hooks the reference reserves in
``global_parameters.py:51-56``) over the base grammar {SE, PER, LIN, MAT32,
MAT52, RQ}, with per-candidate multi-restart fits. Restarts are vmapped into
one program (``fit.fit(restarts=...)``); on a multi-chip mesh that batch axis
shards as data parallelism (``parallel.sharded.restart_sharded_fit_step`` is
the explicit building block; on one chip the vmap simply runs batched).

Data: ``data/d2_mauna_loa.csv`` — the documented reconstruction of the NOAA
monthly record (see data/make_mauna_loa.py for provenance), loaded through
the reference-shaped named-dataset layer. Prints the BIC trace, the found
structure, and one JSON line for BENCHMARKS.md.
"""
import json
import time

import jax.numpy as jnp
import jax.random as jr

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.models.search import greedy_kernel_search


def main(max_depth: int = 2, restarts: int = 2, steps: int = 150):
    di = gpf.load_named("mauna_loa")
    n = di.x_train.shape[0]
    print(f"Mauna Loa: n_train={n} (real-series reconstruction, "
          "data/make_mauna_loa.py)")
    t0 = time.perf_counter()
    res = greedy_kernel_search(
        di.x_train, di.y_train, max_depth=max_depth, key=jr.PRNGKey(0),
        verbose=True,
        fit_kwargs={"steps": steps, "restarts": restarts,
                    "optimize_noise": True},
    )
    wall = time.perf_counter() - t0
    print(f"\nbest structure: {res.kernel}")
    print(f"BIC: {res.score:.1f}  ({len(res.history)} candidates, "
          f"{wall:.1f}s)")
    # held-out quality of the found structure
    gp = gpf.GaussianProcess(res.kernel)
    gp.kernel_params = res.params
    gp.noise = res.noise
    gp.set_data(di.x_train, di.y_train)
    mu, _, _ = gp.predict(di.x_test)
    mse = float(jnp.mean((mu - di.y_test) ** 2))
    print(f"test MSE (normalized y): {mse:.6f}")
    print(json.dumps({
        "config": "kernel_search_mauna",
        "n": int(n), "candidates": len(res.history),
        "best": str(res.kernel), "bic": round(float(res.score), 1),
        "test_mse": round(mse, 6), "wall_s": round(wall, 1),
        "restarts": restarts, "data": "real (reconstruction)",
    }))
    return res


if __name__ == "__main__":
    main()
