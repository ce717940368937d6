"""Checkpoint / resume: kernel AST + hyperparameter pytree + fit state.

The reference exports fitted kernel trees to JSON but ships **no loader**
(SURVEY.md §5.4; ``KernelBasics/Operators.py:644-673``). Here both directions
exist: the static AST goes to JSON (via ``to_dict``/``from_dict``) and the
params pytree to an ``.npz`` sidecar, so a fit can be saved, resumed, and
shipped between hosts. Orbax is used for full training-state checkpoints when
available.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprocessfundamentals_tpu.kernels.base import Kernel, kernel_from_dict
from gaussianprocessfundamentals_tpu.means.functions import (
    MeanFunction,
    mean_from_dict,
)


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save(
    path: str,
    kernel: Kernel,
    kernel_params: Any,
    mean: Optional[MeanFunction] = None,
    mean_params: Any = None,
    noise=None,
    extra: Optional[dict] = None,
) -> None:
    """Write ``<path>.json`` (ASTs + metadata) and ``<path>.npz`` (params)."""
    meta = {
        "kernel": kernel.to_dict(),
        "mean": mean.to_dict() if mean is not None else None,
        "noise": float(noise) if noise is not None else None,
        "extra": extra or {},
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    arrays = {}
    kp, _ = _flatten_with_paths(kernel_params)
    arrays.update({"k:" + k: v for k, v in kp.items()})
    if mean_params is not None:
        mp, _ = _flatten_with_paths(mean_params)
        arrays.update({"m:" + k: v for k, v in mp.items()})
    np.savez(path + ".npz", **arrays)


def load(path: str, dtype=None) -> Tuple[Kernel, Any, Optional[MeanFunction], Any, Optional[float]]:
    """Inverse of :func:`save`; rebuilds params by re-initialising the tree
    structure and refilling leaves by path."""
    with open(path + ".json") as f:
        meta = json.load(f)
    kernel = kernel_from_dict(meta["kernel"])
    mean = mean_from_dict(meta["mean"]) if meta["mean"] else None
    data = np.load(path + ".npz")

    def refill(template, prefix):
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for p, leaf in flat:
            key = prefix + "/".join(str(q) for q in p)
            if key not in data and "['c']" in key:
                # pre-r5 checkpoints stored the Constant kernel/mean param
                # under its old name "value" (renamed to "c" because a leaf
                # literally named "value" collides with optax's linesearch
                # state lookup) — migrate on read
                key = key.replace("['c']", "['value']")
            arr = data[key]
            leaves.append(jnp.asarray(arr, dtype if dtype is not None else arr.dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    # templates with the right structure (values overwritten)
    kp_template = kernel.init_params([[0.0, 1.0]], 2, dtype=dtype)
    kernel_params = refill(kp_template, "k:")
    mean_params = None
    if mean is not None:
        mp_template = mean.init_params([[0.0, 1.0]], 2, dtype=dtype)
        mean_params = refill(mp_template, "m:")
    return kernel, kernel_params, mean, mean_params, meta["noise"]


def save_orbax(path: str, state: Any) -> None:
    """Full-pytree checkpoint (optimizer state, MCMC chains, …) via orbax."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)


def load_orbax(path: str, template: Any = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), item=template)
    return ckptr.restore(os.path.abspath(path))
