"""Auxiliary utilities with reference parity (SURVEY.md §2.2).

Covers the reference's ``main/gpbasics/Auxiliary/`` helpers that are not
already subsumed by the core design:

  * flat hyperparameter (de)serialization — the reference's
    ``Component.serialize_hyper_parameter`` / ``deserialize_hyper_parameter``
    (``Auxiliary/BasicGPComponent.py:16-42``). The reference's deserializer is
    broken (always slices from offset 0, ``:37-40``); this one round-trips
    correctly via pytree flattening.
  * unique rows of a 2-D array (``Auxiliary/Unique2D.py:8-40`` does an O(n²)
    tile-and-compare; ``jnp.unique`` handles it directly).
  * distance→similarity transforms
    (``Auxiliary/DistanceBasedSimilarityFunction.py:16-26``).
"""
from __future__ import annotations

import enum
from typing import Any, Tuple

import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def serialize_params(params: Any) -> Tuple[jnp.ndarray, Any]:
    """Flatten a hyperparameter pytree to a 1-D vector; returns
    (vector, unravel_fn). Reference ``serialize_hyper_parameter``."""
    return ravel_pytree(params)


def deserialize_params(vector: jnp.ndarray, template: Any) -> Any:
    """Rebuild a params pytree from a flat vector given a structure template.

    Correct sequential-offset reconstruction — the reference's version always
    slices from offset 0 (``BasicGPComponent.py:37-40``, bug not replicated).
    """
    _, unravel = ravel_pytree(template)
    return unravel(vector)


def unique_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Unique rows of a 2-D array (reference ``tf_unique_2d``)."""
    return jnp.unique(x, axis=0)


class SimilarityTransform(enum.Enum):
    """Distance→similarity maps for partitioning criteria
    (reference ``DistanceBasedSimilarityFunction.py``)."""

    LINEAR = "linear"
    SQRT = "sqrt"
    LOG = "log"
    RECIPROCAL = "reciprocal"


def similarity_from_distance(
    d: jnp.ndarray, kind: SimilarityTransform = SimilarityTransform.LINEAR
) -> jnp.ndarray:
    if kind is SimilarityTransform.LINEAR:
        return -d
    if kind is SimilarityTransform.SQRT:
        return -jnp.sqrt(jnp.maximum(d, 0.0))
    if kind is SimilarityTransform.LOG:
        return -jnp.log1p(jnp.maximum(d, 0.0))
    return 1.0 / (1.0 + jnp.maximum(d, 0.0))
