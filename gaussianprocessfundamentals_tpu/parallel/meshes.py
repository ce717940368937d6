"""Device-mesh plumbing for multi-chip GP inference.

The reference has no distributed backend at all (SURVEY.md §2.9 — TF thread
pools only). TPU-native equivalent: a ``jax.sharding.Mesh`` with two logical
axes:

  * ``"dp"`` — data parallelism over *independent problems*: random restarts,
    CV folds, HMC chains, batched GP instances, block-diagonal segments;
  * ``"tp"`` — model/sequence parallelism over *rows of the covariance
    matrix*: each chip owns an n/p × n panel of K (the GP analogue of
    sequence parallelism; SURVEY.md §5.7).

Collectives are inserted by XLA from sharding annotations (psum/all-gather
over ICI); ``jax.distributed.initialize()`` extends the same code to
multi-host (call :func:`init_multihost` once per process).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: int = 1, tp: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a (dp × tp) mesh; tp defaults to all remaining devices."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        assert n % dp == 0, f"{n} devices not divisible by dp={dp}"
        tp = n // dp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = mesh_utils.create_device_mesh((dp, tp), devices=np.asarray(devices))
    return Mesh(arr, axis_names=("dp", "tp"))


def single_axis_mesh(name: str = "tp", devices=None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    arr = mesh_utils.create_device_mesh((len(devices),), devices=np.asarray(devices))
    return Mesh(arr, axis_names=(name,))


def row_sharding(mesh: Mesh, axis: str = "tp") -> NamedSharding:
    """[n, ...] arrays sharded along rows of the covariance."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_multihost(**kwargs) -> None:
    """Multi-host process-group bootstrap (one process per host);
    no-op when already initialised or single-process."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass
