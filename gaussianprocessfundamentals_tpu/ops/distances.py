"""Pairwise-distance primitives, written to map onto the TPU MXU.

The reference computes Euclidean distance via the ``‖a‖² − 2ab + ‖b‖²``
expansion and Manhattan distance via a broadcast expand-dims
(``main/gpbasics/Auxiliary/Distances.py:4-12``). We keep the MXU-friendly
matmul expansion for the squared-Euclidean path (one big matmul instead of an
O(n·m·d) broadcast), and support arbitrary leading batch dimensions so batched
("instance"-stacked) GP problems vmap for free.

All functions accept ``a: [..., n, d]``, ``b: [..., m, d]`` and return
``[..., n, m]``.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def sq_euclidean(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distance matrix via the matmul expansion (MXU path)."""
    aa = jnp.sum(a * a, axis=-1, keepdims=True)  # [..., n, 1]
    bb = jnp.sum(b * b, axis=-1, keepdims=True)  # [..., m, 1]
    ab = jnp.matmul(a, jnp.swapaxes(b, -1, -2), precision=lax.Precision.HIGHEST)
    d2 = aa - 2.0 * ab + jnp.swapaxes(bb, -1, -2)
    # The expansion can go slightly negative from rounding; clamp for sqrt/exp.
    return jnp.maximum(d2, 0.0)


def euclidean(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance matrix.

    Uses a gradient-safe sqrt: d/dx sqrt(x) blows up at x=0 (the diagonal), so
    we clamp the argument away from zero *inside* the sqrt only. Values are
    unaffected to ~1e-18; gradients on the diagonal become 0 instead of inf
    (the reference's raw ``tf.sqrt`` shares the same diagonal subtlety).
    """
    d2 = sq_euclidean(a, b)
    safe = jnp.sqrt(jnp.where(d2 > 0.0, d2, 1.0))
    return jnp.where(d2 > 0.0, safe, 0.0)


def manhattan(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Manhattan (L1) distance matrix via broadcasting (VPU path).

    Matches reference ``Distances.py:10-12``. O(n·m·d) memory — fine for the
    small d typical of GP regression; the Pallas tiled variant in
    ``ops.pallas_gram`` avoids materialising the [n, m, d] intermediate.
    """
    return jnp.sum(jnp.abs(a[..., :, None, :] - b[..., None, :, :]), axis=-1)


def sq_manhattan(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = manhattan(a, b)
    return d * d
