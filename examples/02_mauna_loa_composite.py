"""BASELINE config 2: composite kernel grammar on Mauna Loa CO₂.

Kernel: SE·PER (seasonal) + SE (trend) + LIN (drift) + WN — the classic
composite structure the reference's grammar exists for. Loads
``data/d2_mauna_loa.csv`` (r5: a documented reconstruction of the real NOAA
monthly record — provenance in ``data/make_mauna_loa.py``; drop the canonical
NOAA CSV at the same path for exact parity), falling back to synthetic
Mauna-Loa-shaped data only if the CSV is removed.
"""
import time

import jax.numpy as jnp

import gaussianprocessfundamentals_tpu as gpf


def main():
    di = gpf.load_named("mauna_loa")
    kernel = (
        gpf.SquaredExponentialKernel(scaled=True) * gpf.PeriodicKernel()
        + gpf.SquaredExponentialKernel(scaled=True)
        + gpf.LinearKernel()
        + gpf.WhiteNoiseKernel(scaled=True)
    )
    gp = gpf.GaussianProcess(kernel)
    t0 = time.perf_counter()
    res = gp.fit(di.x_train, di.y_train, method="adam", steps=400,
                 optimize_noise=True)
    print(f"fit in {time.perf_counter()-t0:.2f}s: "
          f"nll {res.nll_pre:.1f} -> {res.nll_post:.1f}")
    mu, _, _ = gp.predict(di.x_test)
    mse = float(jnp.mean((mu - di.y_test) ** 2))
    print(f"kernel: {kernel}")
    print(f"test MSE (normalized y): {mse:.6f}")


if __name__ == "__main__":
    main()
