"""Kernel composition operators: Sum, Product, ChangePoint.

Reference: ``main/gpbasics/KernelBasics/Operators.py``. The reference threads a
flat hyperparameter list and slices per-child windows (``Operators.py:88-113``);
here each operator's params pytree is simply a tuple of child param pytrees
(plus operator-owned params such as change-point locations), so composition is
structural and cannot mis-slice.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import jax.random as jr
import numpy as np

from gaussianprocessfundamentals_tpu.config import ChangePointGate, DEFAULT_CONFIG
from gaussianprocessfundamentals_tpu.kernels.base import (
    Kernel,
    _as_xrange,
    _dt,
    register_kernel,
)


@dataclasses.dataclass(frozen=True)
class Operator(Kernel):
    children: Tuple[Kernel, ...] = ()

    def init_params(self, xrange, n, key=None, dtype=None):
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

    def bounds(self, xrange, n):
        los, his = zip(*(c.bounds(xrange, n) for c in self.children))
        return {"children": tuple(los)}, {"children": tuple(his)}

    def x_rescale(self, params, shift, scale):
        """Recurse over children (reference operator rescaling,
        ``Operators.py:107-113``)."""
        out = dict(params)
        out["children"] = tuple(
            c.x_rescale(p, shift, scale)
            for c, p in zip(self.children, params["children"])
        )
        return out


@register_kernel
@dataclasses.dataclass(frozen=True)
class Sum(Operator):
    """K = Σᵢ Kᵢ (reference ``AdditionOperator``, ``Operators.py:306-326``)."""

    def gram(self, params, x1, x2):
        out = self.children[0].gram(params["children"][0], x1, x2)
        for c, p in zip(self.children[1:], params["children"][1:]):
            out = out + c.gram(p, x1, x2)
        return out

    def diag(self, params, x):
        out = self.children[0].diag(params["children"][0], x)
        for c, p in zip(self.children[1:], params["children"][1:]):
            out = out + c.diag(p, x)
        return out

    def __str__(self):
        return "(" + " + ".join(str(c) for c in self.children) + ")"


@register_kernel
@dataclasses.dataclass(frozen=True)
class Product(Operator):
    """K = ∏ᵢ Kᵢ elementwise (reference ``MultiplicationOperator``,
    ``Operators.py:207-225``)."""

    def gram(self, params, x1, x2):
        out = self.children[0].gram(params["children"][0], x1, x2)
        for c, p in zip(self.children[1:], params["children"][1:]):
            out = out * c.gram(p, x1, x2)
        return out

    def diag(self, params, x):
        out = self.children[0].diag(params["children"][0], x)
        for c, p in zip(self.children[1:], params["children"][1:]):
            out = out * c.diag(p, x)
        return out

    def __str__(self):
        return "(" + " * ".join(str(c) for c in self.children) + ")"


def _gate_before(x0: jnp.ndarray, cp, gate: ChangePointGate) -> jnp.ndarray:
    """Scalar gate g(x) ≈ 1 for x < cp, per point (x0 = first input dim).

    Gate formulas from reference ``Operators.py:380-400``:
      - INDICATOR: hard ``x < cp``;
      - SIGMOID: 0.5·(1 + tanh((cp − x)/0.0025));
      - APPROX_INDICATOR: steep logistic with slope 100.
    Quirk not replicated: the reference's APPROX_INDICATOR is oriented
    ``≈1 for x > cp`` — the opposite of its other two gates — which silently
    reverses segment order. All three gates here share the "before" orientation.
    """
    if gate is ChangePointGate.INDICATOR:
        return (x0 < cp).astype(x0.dtype)
    if gate is ChangePointGate.SIGMOID:
        return 0.5 * (1.0 + jnp.tanh((cp - x0) / 0.0025))
    return 1.0 / (1.0 + jnp.exp(100.0 * (x0 - cp)))


def changepoint_weights(
    x: jnp.ndarray, locations: jnp.ndarray, gate: ChangePointGate
) -> jnp.ndarray:
    """Per-segment weights w_i(x) for k+1 segments given k sorted change
    points; returns ``[..., n, k+1]``. w_0 = g(·,cp_0);
    w_i = (1−g(·,cp_{i-1}))·g(·,cp_i); w_k = 1−g(·,cp_{k-1}).
    Matches the reference's running (1−g) carry (``Operators.py:411-476``).
    """
    x0 = x[..., 0]
    gates = [_gate_before(x0, locations[i], gate) for i in range(locations.shape[0])]
    ws = []
    prev = jnp.ones_like(x0)
    for g in gates:
        ws.append(prev * g)
        prev = prev * (1.0 - g)
    ws.append(prev)
    return jnp.stack(ws, axis=-1)


@register_kernel
@dataclasses.dataclass(frozen=True)
class ChangePoint(Operator):
    """K = Σᵢ wᵢ(x)·Kᵢ(x,x')·wᵢ(x') over the first input dimension
    (reference ``ChangePointOperator``, ``Operators.py:370-681``).

    ``n_changepoints = len(children) − 1``. Change-point locations are
    operator-owned params (the reference *prepends* them to the flat
    hyperparameter list, ``Operators.py:451-453``); set ``trainable_locations``
    False to exclude them from gradient fitting (the hard INDICATOR gate has
    zero gradient anyway — use SIGMOID/APPROX_INDICATOR to learn locations).
    """

    gate: ChangePointGate = DEFAULT_CONFIG.cp_gate
    trainable_locations: bool = True

    def _locs(self, params):
        return jnp.sort(params["locations"])

    def gram(self, params, x1, x2):
        w1 = changepoint_weights(x1, self._locs(params), self.gate)
        w2 = changepoint_weights(x2, self._locs(params), self.gate)
        out = None
        for i, (c, p) in enumerate(zip(self.children, params["children"])):
            ki = c.gram(p, x1, x2) * (w1[..., :, None, i] * w2[..., None, :, i])
            out = ki if out is None else out + ki
        return out

    def diag(self, params, x):
        w = changepoint_weights(x, self._locs(params), self.gate)
        out = None
        for i, (c, p) in enumerate(zip(self.children, params["children"])):
            di = c.diag(p, x) * (w[..., i] ** 2)
            out = di if out is None else out + di
        return out

    def init_params(self, xrange, n, key=None, dtype=None):
        dtype = _dt(dtype)
        p = super().init_params(xrange, n, key, dtype)
        xr = _as_xrange(xrange)
        k = len(self.children) - 1
        # default locations: evenly spaced in the x-range
        locs = np.linspace(xr[0, 0], xr[0, 1], k + 2)[1:-1]
        p["locations"] = jnp.asarray(locs, dtype)
        return p

    def positivity(self):
        p = super().positivity()
        p["locations"] = False
        return p

    def bounds(self, xrange, n):
        lo, hi = super().bounds(xrange, n)
        xr = _as_xrange(xrange)
        r = float(xr[0, 1] - xr[0, 0])
        k = len(self.children) - 1
        # reference CP bounds: range ± 1.5·range (Operators.py:630-642)
        lo["locations"] = np.full((k,), xr[0, 0] - 1.5 * r)
        hi["locations"] = np.full((k,), xr[0, 1] + 1.5 * r)
        return lo, hi

    def x_rescale(self, params, shift, scale):
        """Children recursed; change-point locations are x-positions so they
        map affinely. (The reference passes CP positions through UNrescaled,
        ``Operators.py:617-628`` — that loses the positions' x units; the
        affine map here is the evident intent.)"""
        out = super().x_rescale(params, shift, scale)
        shift0 = jnp.asarray(shift)
        scale0 = jnp.asarray(scale)
        if shift0.ndim:  # per-dim normalisation: CP gates act on dim 0
            shift0, scale0 = shift0[0], scale0[0]
        out["locations"] = params["locations"] * scale0 + shift0
        return out

    def __str__(self):
        return "(" + " ][ ".join(str(c) for c in self.children) + ")"

    # --- tree surgery (host-side; reference Operators.py:513-587) ---------
    def with_kernel_appended(self, kernel: Kernel) -> "ChangePoint":
        """Ordered insertion after the last segment (reference ``add_kernel``,
        ``Operators.py:513-524``). Caller re-inits or extends params."""
        return dataclasses.replace(self, children=self.children + (kernel,))

    def with_kernel_prepended(self, kernel: Kernel) -> "ChangePoint":
        """Reference ``add_preceding_kernel`` (``Operators.py:526-536``)."""
        return dataclasses.replace(self, children=(kernel,) + self.children)

    def prune(self, params, xrange) -> Tuple["ChangePoint", dict]:
        """Drop degenerate change points: locations outside the data range or
        overtaken by a later (sorted-order) sibling closer than 1e-9
        (reference pruning of out-of-range/overtaken CPs,
        ``Operators.py:538-587``). Returns (new kernel, new params); with one
        surviving segment the caller should unwrap ``children[0]``."""
        import numpy as np

        xr = _as_xrange(xrange)
        locs = np.sort(np.asarray(params["locations"]).reshape(-1))
        keep_cp = []
        prev = -np.inf
        for loc in locs:
            inside = xr[0, 0] < loc < xr[0, 1]
            distinct = (loc - prev) > 1e-9
            keep_cp.append(inside and distinct)
            if inside and distinct:
                prev = loc
        keep_cp = np.asarray(keep_cp)
        # segment i is bounded by cp i-1 and cp i; dropping cp i merges
        # segments i and i+1 — keep the earlier child (reference keeps the
        # preceding kernel)
        children = list(self.children)
        child_params = list(params["children"])
        new_children, new_params, new_locs = [children[0]], [child_params[0]], []
        for i, loc in enumerate(locs):
            if keep_cp[i]:
                new_locs.append(loc)
                new_children.append(children[i + 1])
                new_params.append(child_params[i + 1])
        if not new_locs:
            return self.children[0], child_params[0]
        new_kernel = dataclasses.replace(self, children=tuple(new_children))
        return new_kernel, {
            "children": tuple(new_params),
            "locations": jnp.asarray(np.asarray(new_locs)),
        }
