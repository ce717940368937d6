"""Mean-function grammar, mirroring the kernel AST.

Reference: ``main/gpbasics/MeanFunctionBasics/`` — ``MeanFunction`` ABC
(``MeanFunction.py:31-75``), base functions (``BaseMeanFunctions.py``), ADD/MUL
operators (``Operators.py:8-184``; the CP manifestation is declared there but
never implemented — we provide it via kernel-style changepoint weights for
completeness).

``mean(params, x)`` maps ``x: [..., n, d]`` → ``[..., n]``.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from gaussianprocessfundamentals_tpu.config import ChangePointGate, DEFAULT_CONFIG
from gaussianprocessfundamentals_tpu.kernels.base import _as_xrange, _dt

MEAN_REGISTRY: Dict[str, type] = {}


def register_mean(cls):
    MEAN_REGISTRY[cls.__name__] = cls
    jax.tree_util.register_static(cls)
    return cls


@dataclasses.dataclass(frozen=True)
class MeanFunction:
    dim: int = 1

    def mean(self, params: Any, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def __call__(self, params, x):
        return self.mean(params, x)

    def init_params(self, xrange=None, n: int = 0, key=None, dtype=None) -> Any:
        raise NotImplementedError

    def positivity(self) -> Any:
        raise NotImplementedError

    @property
    def children(self) -> Tuple["MeanFunction", ...]:
        return ()

    def __add__(self, other):
        return MeanSum(children=_merge_means(self, other, MeanSum))

    def __mul__(self, other):
        return MeanProduct(children=_merge_means(self, other, MeanProduct))

    def to_dict(self) -> dict:
        d = {"type": type(self).__name__}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if f.name == "children":
                d["children"] = [c.to_dict() for c in v]
            else:
                d[f.name] = v
        return d


def _merge_means(a, b, op_cls):
    """Flatten nested same-type operators (as in the kernel grammar)."""
    out = []
    for m in (a, b):
        if type(m) is op_cls:
            out.extend(m.children)
        else:
            out.append(m)
    return tuple(out)


def mean_from_dict(d: dict) -> MeanFunction:
    d = dict(d)
    cls = MEAN_REGISTRY[d.pop("type")]
    if "children" in d:
        d["children"] = tuple(mean_from_dict(c) for c in d["children"])
    return cls(**d)


@register_mean
@dataclasses.dataclass(frozen=True)
class ZeroMean(MeanFunction):
    """m(x) = 0 (reference ``BaseMeanFunctions.py:66-79``). No params.

    The reference special-cases zero means to skip detrending
    (``DataHandling/DataInput.py:86-87``); :mod:`..data` does the same by
    checking ``isinstance(mean, ZeroMean)``.
    """

    def mean(self, params, x):
        return jnp.zeros(x.shape[:-1], x.dtype)

    def init_params(self, xrange=None, n=0, key=None, dtype=None):
        return {}

    def positivity(self):
        return {}


@register_mean
@dataclasses.dataclass(frozen=True)
class ConstantMean(MeanFunction):
    """m(x) = c; default c = 0.01 (reference ``BaseMeanFunctions.py:37-63``)."""

    def mean(self, params, x):
        return jnp.broadcast_to(params["c"], x.shape[:-1])

    def init_params(self, xrange=None, n=0, key=None, dtype=None):
        dtype = _dt(dtype)
        v = jnp.asarray(0.01, dtype)
        if key is not None:
            v = v + jr.normal(key, (), dtype)
        return {"c": v}

    def positivity(self):
        return {"c": False}


@register_mean
@dataclasses.dataclass(frozen=True)
class LinearMean(MeanFunction):
    """m(x) = Σ_d slope_d·x_d; default slope = 1/d
    (reference ``BaseMeanFunctions.py:82-112``)."""

    def mean(self, params, x):
        return jnp.sum(x * params["slope"], axis=-1)

    def init_params(self, xrange=None, n=0, key=None, dtype=None):
        dtype = _dt(dtype)
        v = jnp.full((self.dim,), 1.0 / self.dim, dtype)
        if key is not None:
            v = v * (1.0 + jr.normal(key, (self.dim,), dtype))
        return {"slope": v}

    def positivity(self):
        return {"slope": False}


@register_mean
@dataclasses.dataclass(frozen=True)
class ExponentialMean(MeanFunction):
    """m(x) = base^(Σ_d (scale_d·x_d − shift_d))
    (reference ``BaseMeanFunctions.py:115-151``; defaults scale=1, shift=0,
    base=e)."""

    def mean(self, params, x):
        expo = jnp.sum(x * params["scale"] - params["shift"], axis=-1)
        return jnp.power(params["base"], expo)

    def init_params(self, xrange=None, n=0, key=None, dtype=None):
        dtype = _dt(dtype)
        p = {
            "scale": jnp.ones((self.dim,), dtype),
            "shift": jnp.zeros((self.dim,), dtype),
            "base": jnp.asarray(math.e, dtype),
        }
        if key is not None:
            p["scale"] = p["scale"] + 0.1 * jr.normal(key, (self.dim,), dtype)
        return p

    def positivity(self):
        return {"scale": False, "shift": False, "base": True}


@register_mean
@dataclasses.dataclass(frozen=True)
class LogitMean(MeanFunction):
    """m(x) = max / (1 + exp(Σ_d (steep_d·x_d − shift_d)))
    (reference ``BaseMeanFunctions.py:154-193``; defaults steep=−1, shift=0,
    max=1)."""

    def mean(self, params, x):
        z = jnp.sum(x * params["steepness"] - params["shift"], axis=-1)
        return params["max_value"] / (1.0 + jnp.exp(z))

    def init_params(self, xrange=None, n=0, key=None, dtype=None):
        dtype = _dt(dtype)
        return {
            "steepness": jnp.full((self.dim,), -1.0, dtype),
            "shift": jnp.zeros((self.dim,), dtype),
            "max_value": jnp.asarray(1.0, dtype),
        }

    def positivity(self):
        return {"steepness": False, "shift": False, "max_value": True}


@dataclasses.dataclass(frozen=True)
class MeanOperator(MeanFunction):
    children: Tuple[MeanFunction, ...] = ()

    def init_params(self, xrange=None, n=0, key=None, dtype=None):
        keys = (
            [None] * len(self.children)
            if key is None
            else list(jr.split(key, len(self.children)))
        )
        return {
            "children": tuple(
                c.init_params(xrange, n, k, dtype) for c, k in zip(self.children, keys)
            )
        }

    def positivity(self):
        return {"children": tuple(c.positivity() for c in self.children)}


@register_mean
@dataclasses.dataclass(frozen=True)
class MeanSum(MeanOperator):
    """m = Σᵢ mᵢ (reference ``MeanFunctionBasics/Operators.py``)."""

    def mean(self, params, x):
        out = self.children[0].mean(params["children"][0], x)
        for c, p in zip(self.children[1:], params["children"][1:]):
            out = out + c.mean(p, x)
        return out


@register_mean
@dataclasses.dataclass(frozen=True)
class MeanProduct(MeanOperator):
    """m = ∏ᵢ mᵢ (reference ``MeanFunctionBasics/Operators.py``)."""

    def mean(self, params, x):
        out = self.children[0].mean(params["children"][0], x)
        for c, p in zip(self.children[1:], params["children"][1:]):
            out = out * c.mean(p, x)
        return out


@register_mean
@dataclasses.dataclass(frozen=True)
class MeanChangePoint(MeanOperator):
    """m = Σᵢ wᵢ(x)·mᵢ(x) — the CP mean operator the reference enumerates but
    never implements (``MeanFunctionBasics/MeanFunction.py:15-28``)."""

    gate: ChangePointGate = DEFAULT_CONFIG.cp_gate

    def mean(self, params, x):
        from gaussianprocessfundamentals_tpu.kernels.operators import (
            changepoint_weights,
        )

        w = changepoint_weights(x, jnp.sort(params["locations"]), self.gate)
        out = None
        for i, (c, p) in enumerate(zip(self.children, params["children"])):
            mi = c.mean(p, x) * w[..., i]
            out = mi if out is None else out + mi
        return out

    def init_params(self, xrange=None, n=0, key=None, dtype=None):
        dtype = _dt(dtype)
        p = super().init_params(xrange, n, key, dtype)
        xr = _as_xrange(xrange if xrange is not None else [[0.0, 1.0]])
        k = len(self.children) - 1
        locs = np.linspace(xr[0, 0], xr[0, 1], k + 2)[1:-1]
        p["locations"] = jnp.asarray(locs, dtype)
        return p

    def positivity(self):
        p = super().positivity()
        p["locations"] = False
        return p
