"""Kernel-expression AST — the TPU-native redesign of the reference grammar.

The reference (``main/gpbasics/KernelBasics/Kernel.py:38-141``) models kernel
expressions as *mutable* objects carrying their own fitted state
(``last_hyper_parameter``) and threading hyperparameters as a flat
``List[tf.Tensor]`` with manual window-slicing in every operator
(``Operators.py:88-113``). Under ``jax.jit`` none of that machinery is needed:

  * the expression tree is **static** (hashable, registered via
    ``jax.tree_util.register_static``) and can be closed over inside jitted
    functions — XLA sees a fully unrolled, fusable compute graph;
  * hyperparameters travel as a **pytree** that mirrors the tree topology
    (no flat-window slicing, no off-by-one bugs like the reference's broken
    deserializer ``Auxiliary/BasicGPComponent.py:37-40``);
  * gradients come from ``jax.grad`` uniformly (the reference's hand-written
    derivative matrices, partially unimplemented for Matérn
    ``BaseKernels.py:816-818``, are unnecessary).

``gram(params, x1, x2)`` builds the Gram matrix for ``x1: [..., n, d]``,
``x2: [..., m, d]`` → ``[..., n, m]``; leading batch dims give the reference's
"instance-stacked" batched GPs (``DataHandling/BatchDataInput.py``) for free.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprocessfundamentals_tpu.config import default_dtype

Params = Any  # nested dict / tuple pytree of jnp arrays
KERNEL_REGISTRY: Dict[str, type] = {}


def _as_xrange(xrange) -> np.ndarray:
    """Normalise an x-range spec to a float [d, 2] array of (min, max)."""
    arr = np.asarray(xrange, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[None, :]
    assert arr.shape[-1] == 2, f"xrange must be [d, 2], got {arr.shape}"
    return arr


def register_kernel(cls):
    """Register a kernel class for (de)serialization and make it jit-static."""
    KERNEL_REGISTRY[cls.__name__] = cls
    jax.tree_util.register_static(cls)
    return cls


@dataclasses.dataclass(frozen=True)
class Kernel:
    """Abstract kernel-expression node (static / hashable).

    Parity with reference ``KernelBasics/Kernel.py:38-141``; fitted values are
    *not* stored on the node — they live in the separate params pytree.
    """

    # --- evaluation ------------------------------------------------------
    def gram(self, params: Params, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def diag(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Diagonal of gram(params, x, x) without building the matrix.

        Needed for Nystroem/SVGP trace terms (reference computes the full
        matrix and traces it, ``Metrics/LogLikelihood.py:51-60``).
        """
        raise NotImplementedError

    def __call__(self, params, x1, x2):
        return self.gram(params, x1, x2)

    # --- parameters ------------------------------------------------------
    def init_params(self, xrange, n: int, key=None, dtype=None) -> Params:
        """Default (key=None) or randomised initial hyperparameters.

        Mirrors ``get_default_hyper_parameter(..., from_distribution)``
        (reference ``BaseKernels.py:323-380``): defaults are deterministic
        functions of the x-range; with a PRNG key, draws uniformly inside the
        finite hyperparameter bounds.
        """
        raise NotImplementedError

    def positivity(self) -> Params:
        """Pytree of bools matching params: True = constrained positive."""
        raise NotImplementedError

    def bounds(self, xrange, n: int) -> Tuple[Params, Params]:
        """(lower, upper) bound pytrees (±inf where unbounded).

        Mirrors ``get_hyper_parameter_bounds`` (e.g. SE bounds
        [5·range/n, range/3], reference ``BaseKernels.py:296-306``).
        """
        raise NotImplementedError

    def x_rescale(self, params: Params, shift, scale) -> Params:
        """Fitted params re-expressed in ORIGINAL (unnormalised) x units,
        given the normalisation ``x_norm = (x − shift) / scale``.

        Mirrors the reference's ``get_last_hyper_parameter(scaling_x_param)``
        (``BaseKernels.py:259-264,417-422,617-622,836-846,996-1006``):
        x-length params (lengthscale, period) multiply by the scale,
        x-position params (linear offset) map affinely, everything else
        (variances, RQ alpha) is unit-free and passes through.
        """
        raise NotImplementedError

    # --- structure -------------------------------------------------------
    @property
    def children(self) -> Tuple["Kernel", ...]:
        return ()

    def num_params(self, params: Params) -> int:
        return sum(int(np.prod(np.shape(p))) for p in jax.tree_util.tree_leaves(params))

    # --- algebra sugar ---------------------------------------------------
    def __add__(self, other: "Kernel") -> "Kernel":
        from gaussianprocessfundamentals_tpu.kernels.operators import Sum

        return Sum(_merge(self, other, Sum))

    def __mul__(self, other: "Kernel") -> "Kernel":
        from gaussianprocessfundamentals_tpu.kernels.operators import Product

        return Product(_merge(self, other, Product))

    # --- serialization ---------------------------------------------------
    def to_dict(self) -> dict:
        d = {"type": type(self).__name__}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if f.name == "children":
                d["children"] = [c.to_dict() for c in v]
            elif isinstance(v, Kernel):
                d[f.name] = v.to_dict()
            elif f.name == "model":
                from gaussianprocessfundamentals_tpu.kernels.partition import (
                    partitioning_to_dict,
                )

                d[f.name] = partitioning_to_dict(v)
            elif isinstance(v, enum.Enum):
                d[f.name] = v.value
            else:
                d[f.name] = v
        return d

    def __str__(self) -> str:
        return type(self).__name__.replace("Kernel", "")

    def canonical_str(self) -> str:
        """Canonical string form with commutative children sorted — two
        expressions equal up to ADD/MUL argument order share one canonical
        form (reference child sorting for canonical representations,
        ``Operators.py:128-135``; used for search-space deduplication)."""
        from gaussianprocessfundamentals_tpu.kernels.operators import (
            Product,
            Sum,
        )

        name = type(self).__name__.replace("Kernel", "")
        if not self.children:
            return name + ("~s" if getattr(self, "scaled", False) else "")
        parts = [c.canonical_str() for c in self.children]
        if isinstance(self, (Sum, Product)):
            parts = sorted(parts)
            sep = " + " if isinstance(self, Sum) else " * "
            return "(" + sep.join(parts) + ")"
        return name + "(" + ", ".join(parts) + ")"


def kernel_from_dict(d: dict) -> Kernel:
    """Rebuild a kernel tree from :meth:`Kernel.to_dict` output.

    The reference exports kernel trees to JSON but ships **no loader**
    (``KernelBasics/Operators.py:644-673``); this closes that gap.
    """
    d = dict(d)
    cls = KERNEL_REGISTRY[d.pop("type")]
    if "children" in d:
        d["children"] = tuple(kernel_from_dict(c) for c in d["children"])
    if "model" in d and isinstance(d["model"], dict):
        from gaussianprocessfundamentals_tpu.kernels.partition import (
            partitioning_from_dict,
        )

        d["model"] = partitioning_from_dict(d["model"])
    if "gate" in d and isinstance(d["gate"], str):
        from gaussianprocessfundamentals_tpu.config import ChangePointGate

        d["gate"] = ChangePointGate(d["gate"])
    return cls(**d)


def _merge(a: Kernel, b: Kernel, op_cls) -> Tuple[Kernel, ...]:
    """Flatten nested same-type operators (reference simplification,
    ``Operators.py:356-367``)."""
    out = []
    for k in (a, b):
        if type(k) is op_cls:
            out.extend(k.children)
        else:
            out.append(k)
    return tuple(out)


def _dt(dtype):
    return dtype if dtype is not None else default_dtype()
