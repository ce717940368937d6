"""On-TPU Pallas numeric gate as pytest (r4 VERDICT item 3).

The real gate runs on hardware (``benchmarks/check_pallas_tpu.py``); CI (CPU,
8 virtual devices, per conftest) can only smoke the HARNESS in interpret mode
— which, per the r3 lesson, cannot catch on-chip numerics (MXU bf16 passes,
Mosaic lowering). The TPU case is skipped off-chip and exercised by the
round's bench session; BENCHMARKS.md records each round's pass/fail.
"""
import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

from check_pallas_tpu import run_checks  # noqa: E402


def _assert_all(checks):
    bad = [c for c in checks if not c[3]]
    assert not bad, "Pallas kernels out of tolerance: " + "; ".join(
        f"{name} err={err:.3g} tol={tol:.3g}" for name, err, tol, _ in bad
    )


def test_pallas_gate_interpret_smoke():
    """Harness smoke on CPU interpret mode (f32-exact — catches formula and
    indexing bugs, NOT on-chip rounding)."""
    _assert_all(run_checks(quick=True, interpret=True))


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="on-chip gate needs a TPU"
)
def test_pallas_gate_on_tpu():
    """The actual gate: every Pallas kernel vs its XLA oracle on real
    hardware, including the 65k accumulation-depth gradient check."""
    _assert_all(run_checks(quick=False))
