"""Fused Pallas tiles for COMPOSITE kernel expressions (in-tile AST
interpreter).

The scalar-leaf tile kernels (``ops.pallas_gram``) cover SE/Matérn with a
scalar lengthscale only — the flagship Mauna Loa composite (SE·PER + SE + LIN,
reference hot loop ``KernelBasics/Operators.py:207-326`` over leaves like PER
``BaseKernels.py:440-457`` and LIN ``:114-134``) got zero Pallas benefit
(r4 VERDICT item 4). Here the static kernel AST is *interpreted at trace
time* inside the tile body: the Python walk over Sum/Product/leaf nodes
unrolls into a fused VPU program per [bm, bn] tile, with all leaf
hyperparameters packed into one flat SMEM vector.

Distances are computed per dimension with DIRECT differences
(x1[:, k] − x2[k, :] broadcasts on the VPU) — exact to f32 eps, O(d·bm·bn)
work. This sidesteps the MXU norm-expansion cancellation entirely (the r3
campaign's main enemy) and makes Manhattan distances (Periodic, Matérn —
reference semantics) exact at ANY d, and ARD (per-dimension) lengthscales
free. d is capped at ``MAX_D`` since the per-dim walk unrolls.

Gradients: the tile body differentiates itself — ``jax.grad`` of
(flat params → Σ cot·K_tile) traces to plain VPU arithmetic, giving the
analytic one-pass low-rank-cotangent VJP for ANY supported expression with
no hand-derived formulas. Per-row-block partial accumulators (not one global
f32 accumulator) preserve digits at large n.

A WhiteNoise leaf directly under a root Sum is stripped and handled
algebraically (K_wn = I on distinct inputs): matvec += var·V, cotangent
gradient = Σᵢ(U Wᵀ)ᵢᵢ·1 — see :func:`split_white_noise`.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianprocessfundamentals_tpu.ops.pallas_gram import (
    MV_BM,
    MV_BN,
    on_tpu,
)

MAX_D = 8  # per-dim unrolled tile math; GP regression inputs are small-d
MAX_PARAMS = 126  # flat param vector capacity (lanes 0..125 of the grad row)


# ---------------------------------------------------------------------------
# AST support predicate + flat param packing
# ---------------------------------------------------------------------------


def _leaf_classes():
    from gaussianprocessfundamentals_tpu.kernels import leaves as lv

    return {
        lv.SquaredExponentialKernel: "se",
        lv.PeriodicKernel: "per",
        lv.LinearKernel: "lin",
        lv.Matern32Kernel: "mat32",
        lv.Matern52Kernel: "mat52",
        lv.RationalQuadraticKernel: "rq",
        lv.ConstantKernel: "const",
    }


def _op_classes():
    from gaussianprocessfundamentals_tpu.kernels.operators import (
        Product,
        Sum,
    )

    return Sum, Product


def supported_expr(kernel, params, d: int) -> bool:
    """True when every node of the expression has an in-tile evaluator."""
    if d > MAX_D:
        return False
    leaves = _leaf_classes()
    Sum, Product = _op_classes()

    # params that may legitimately be PER-DIMENSION vectors (ARD); every
    # other hyperparameter must be scalar or the tile math would silently
    # read only its first component
    ard_ok = {
        ("se", "lengthscale"),
        ("mat32", "lengthscale"),
        ("mat52", "lengthscale"),
        ("rq", "lengthscale"),
        ("lin", "offset"),
    }

    def leaf_ok(k, p):
        if type(k) not in leaves:
            return False
        kind = leaves[type(k)]
        for name in _leaf_param_names(kind):
            nd = int(jnp.ndim(p[name]))
            if nd > 1:
                return False
            if nd == 1 and (kind, name) not in ard_ok:
                return False
            if nd == 1 and int(jnp.size(p[name])) not in (1, d):
                return False
        if getattr(k, "scaled", False) and int(jnp.ndim(p["variance"])) != 0:
            return False
        return True

    def walk(k, p):
        if isinstance(k, (Sum, Product)):
            return all(
                walk(c, cp) for c, cp in zip(k.children, p["children"])
            )
        return leaf_ok(k, p)

    try:
        ok = walk(kernel, params)
    except (KeyError, TypeError, AttributeError):
        return False
    if not ok:
        return False
    try:
        return _packed_size(kernel, params) <= MAX_PARAMS
    except (KeyError, TypeError, AttributeError):
        return False


def split_white_noise(kernel, params):
    """Strip WhiteNoise children from a root Sum (or a bare WhiteNoise root).

    Returns ``(kernel', params', wn_var)`` where ``wn_var`` is the summed
    white-noise amplitude (a traced scalar; 0.0 when none) and kernel' is the
    expression without those leaves (None if nothing remains). On distinct
    inputs K_wn = wn_var·I, so matvec/gram/VJP handle it algebraically —
    same caveat as the reference's noise handling for duplicated rows.
    """
    import dataclasses

    from gaussianprocessfundamentals_tpu.kernels.leaves import WhiteNoiseKernel
    from gaussianprocessfundamentals_tpu.kernels.operators import Sum

    def amp(k, p):
        return p["variance"] if k.scaled else jnp.asarray(1.0)

    if isinstance(kernel, WhiteNoiseKernel):
        return None, None, amp(kernel, params)
    if not isinstance(kernel, Sum):
        return kernel, params, 0.0
    keep_k, keep_p, wn = [], [], 0.0
    stripped_any = False
    for c, cp in zip(kernel.children, params["children"]):
        if isinstance(c, WhiteNoiseKernel):
            wn = wn + amp(c, cp)
            stripped_any = True
        else:
            keep_k.append(c)
            keep_p.append(cp)
    if not stripped_any:
        return kernel, params, 0.0
    if not keep_k:
        return None, None, wn
    if len(keep_k) == 1:
        return keep_k[0], keep_p[0], wn
    return (
        dataclasses.replace(kernel, children=tuple(keep_k)),
        {"children": tuple(keep_p)},
        wn,
    )


def _leaf_param_names(kind: str):
    # fixed pack order per leaf kind (variance, when scaled, is appended)
    return {
        "se": ("lengthscale",),
        "per": ("lengthscale", "period"),
        "lin": ("offset",),
        "mat32": ("lengthscale",),
        "mat52": ("lengthscale",),
        "rq": ("lengthscale", "alpha"),
        "const": ("c",),
    }[kind]


def _walk_leaves(kernel, params):
    """Yield (leaf_kernel, leaf_params) in fixed depth-first order."""
    Sum, Product = _op_classes()
    if isinstance(kernel, (Sum, Product)):
        for c, cp in zip(kernel.children, params["children"]):
            yield from _walk_leaves(c, cp)
    else:
        yield kernel, params


def _packed_size(kernel, params) -> int:
    leaves = _leaf_classes()
    size = 0
    for k, p in _walk_leaves(kernel, params):
        for name in _leaf_param_names(leaves[type(k)]):
            size += max(1, int(jnp.size(p[name])))
        if getattr(k, "scaled", False):
            size += 1
    return size


def pack_params(kernel, params) -> jnp.ndarray:
    """Flatten all leaf hyperparameters (depth-first, fixed per-leaf order)
    into one f32 vector for SMEM."""
    leaves = _leaf_classes()
    flat = []
    for k, p in _walk_leaves(kernel, params):
        for name in _leaf_param_names(leaves[type(k)]):
            flat.append(jnp.ravel(jnp.asarray(p[name], jnp.float32)))
        if getattr(k, "scaled", False):
            flat.append(jnp.ravel(jnp.asarray(p["variance"], jnp.float32)))
    return jnp.concatenate(flat) if flat else jnp.zeros((1,), jnp.float32)


def unpack_grads(kernel, params, gvec: jnp.ndarray):
    """Inverse of :func:`pack_params` for a flat GRADIENT vector: rebuild a
    pytree with the exact structure of ``params``."""
    leaves = _leaf_classes()
    Sum, Product = _op_classes()
    pos = [0]

    def take(template):
        sz = max(1, int(jnp.size(template)))
        chunk = gvec[pos[0]:pos[0] + sz]
        pos[0] += sz
        out = chunk.reshape(jnp.shape(template)).astype(
            jnp.result_type(template)
        )
        return out

    def walk(k, p):
        if isinstance(k, (Sum, Product)):
            return {
                "children": tuple(
                    walk(c, cp) for c, cp in zip(k.children, p["children"])
                )
            }
        out = {}
        for name in _leaf_param_names(leaves[type(k)]):
            out[name] = take(p[name])
        if getattr(k, "scaled", False):
            out["variance"] = take(p["variance"])
        return out

    return walk(kernel, params)


# ---------------------------------------------------------------------------
# trace-time tile evaluator (runs inside the Pallas kernel body)
# ---------------------------------------------------------------------------


def _compile_tile_eval(kernel, params, d: int):
    """Return ``eval(x1_tile, x2t_tile, pv) -> k_tile`` where the AST walk is
    unrolled at trace time. x1_tile: [bm, d] values, x2t_tile: [d, bn]
    values, pv: flat [p] param values (a traced vector — differentiable)."""
    leaves = _leaf_classes()
    Sum, Product = _op_classes()

    # static offsets mirroring pack_params' order
    offsets = {}
    off = 0
    for idx, (k, p) in enumerate(_walk_leaves(kernel, params)):
        sizes = {}
        for name in _leaf_param_names(leaves[type(k)]):
            sz = max(1, int(jnp.size(p[name])))
            sizes[name] = (off, sz)
            off += sz
        if getattr(k, "scaled", False):
            sizes["variance"] = (off, 1)
            off += 1
        offsets[idx] = sizes

    import math

    def eval_fn(x1, x2t, pv):
        counter = [0]

        def diffs():
            # per-dim broadcast differences [bm, bn] — exact on the VPU
            return [x1[:, k:k + 1] - x2t[k:k + 1, :] for k in range(d)]

        def leaf(k, sizes):
            def get(name, i=0):
                o, sz = sizes[name]
                return pv[o + min(i, sz - 1)]

            kind = leaves[type(k)]
            if kind == "se":
                _, ls_sz = sizes["lengthscale"]
                d2 = None
                for i, df in enumerate(diffs()):
                    t = df / get("lengthscale", i if ls_sz > 1 else 0)
                    d2 = t * t if d2 is None else d2 + t * t
                out = jnp.exp(-0.5 * d2)
            elif kind == "per":
                man = None
                for df in diffs():
                    a = jnp.abs(df)
                    man = a if man is None else man + a
                s = jnp.sin(jnp.pi * man / get("period"))
                ls = get("lengthscale")
                out = jnp.exp(-2.0 * s * s / (ls * ls))
            elif kind == "lin":
                _, c_sz = sizes["offset"]
                out = None
                for i in range(d):
                    c = get("offset", i if c_sz > 1 else 0)
                    t = (x1[:, i:i + 1] - c) * (x2t[i:i + 1, :] - c)
                    out = t if out is None else out + t
            elif kind in ("mat32", "mat52"):
                # Manhattan of per-dim-scaled inputs (ARD-capable; collapses
                # to man/ℓ for scalar ℓ) — matches leaves._matern
                _, ls_sz = sizes["lengthscale"]
                man = None
                for i, df in enumerate(diffs()):
                    a = jnp.abs(df) / jnp.abs(
                        get("lengthscale", i if ls_sz > 1 else 0)
                    )
                    man = a if man is None else man + a
                c = math.sqrt(3.0) if kind == "mat32" else math.sqrt(5.0)
                frac = c * man
                poly = 1.0 + frac
                if kind == "mat52":
                    poly = poly + 5.0 * (man * man) / 3.0
                out = poly * jnp.exp(-frac)
            elif kind == "rq":
                _, ls_sz = sizes["lengthscale"]
                al = get("alpha")
                d2 = None
                for i, df in enumerate(diffs()):
                    t = df / get("lengthscale", i if ls_sz > 1 else 0)
                    d2 = t * t if d2 is None else d2 + t * t
                base = 1.0 + d2 / (2.0 * al)
                out = jnp.exp(-al * jnp.log(base))
            elif kind == "const":
                out = jnp.full(
                    (x1.shape[0], x2t.shape[1]), 1.0, x1.dtype
                ) * get("c")
            else:  # pragma: no cover
                raise AssertionError(kind)
            if getattr(k, "scaled", False):
                out = get("variance") * out
            return out

        def walk(k):
            if isinstance(k, (Sum, Product)):
                parts = [walk(c) for c in k.children]
                out = parts[0]
                for t in parts[1:]:
                    out = (out + t) if isinstance(k, Sum) else (out * t)
                return out
            sizes = offsets[counter[0]]
            counter[0] += 1
            return leaf(k, sizes)

        return walk(kernel)

    return eval_fn


# ---------------------------------------------------------------------------
# pallas kernels: matvec + low-rank-cotangent VJP
# ---------------------------------------------------------------------------


def _expr_mv_kernel(x1_ref, x2t_ref, v_ref, pv_ref, o_ref, *, eval_fn, p_sz):
    j = pl.program_id(1)
    # SMEM only supports SCALAR loads on real Mosaic (interpret mode is more
    # permissive) — read the params one by one into a Python list
    pv = [pv_ref[i] for i in range(p_sz)]
    k = eval_fn(x1_ref[:], x2t_ref[:], pv)
    contrib = jnp.dot(k, v_ref[:], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == 0)
    def _():
        o_ref[:] = contrib

    @pl.when(j > 0)
    def _():
        o_ref[:] += contrib


@functools.partial(
    jax.jit, static_argnames=("kernel", "interpret")
)
def expr_gram_matvec_cross(
    kernel, params: Any, x1: jnp.ndarray, x2: jnp.ndarray, V: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """K(x1, x2) @ V for a supported composite expression — K tiles built by
    the in-tile AST interpreter, contracted in VMEM, never written to HBM.
    f32. Caller must have stripped WhiteNoise (``split_white_noise``)."""
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    V = V.astype(jnp.float32)
    vec = V.ndim == 1
    if vec:
        V = V[:, None]
    pv = pack_params(kernel, params)
    eval_fn = _compile_tile_eval(kernel, params, x1.shape[1])
    n, d = x1.shape
    m = x2.shape[0]
    r = V.shape[1]
    npad = -(-n // MV_BM) * MV_BM
    mpad = -(-m // MV_BN) * MV_BN
    if npad != n:
        x1 = jnp.concatenate([x1, jnp.zeros((npad - n, d), x1.dtype)], 0)
    if mpad != m:
        x2 = jnp.concatenate([x2, jnp.zeros((mpad - m, d), x2.dtype)], 0)
        V = jnp.concatenate([V, jnp.zeros((mpad - m, r), V.dtype)], 0)
    x2t = x2.T
    grid = (npad // MV_BM, mpad // MV_BN)
    out = pl.pallas_call(
        functools.partial(_expr_mv_kernel, eval_fn=eval_fn,
                          p_sz=pv.shape[0]),
        out_shape=jax.ShapeDtypeStruct((npad, r), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((MV_BM, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, MV_BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((MV_BN, r), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((MV_BM, r), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * mpad * (d + r) + 20 * npad * mpad,
            bytes_accessed=4 * (npad * d + mpad * d + npad * r + mpad * r)
            * (mpad // MV_BN),
            transcendentals=3 * npad * mpad,
        ),
        interpret=interpret,
    )(x1, x2t, V, pv)
    out = out[:n]
    return out[:, 0] if vec else out


def _expr_vjp_kernel(x1_ref, x2t_ref, u_ref, w_ref, pv_ref, o_ref, *,
                     eval_fn, p_sz):
    j = pl.program_id(1)
    cot = jnp.dot(u_ref[:], w_ref[:].T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    x1 = x1_ref[:]
    x2t = x2t_ref[:]
    # scalar SMEM loads (Mosaic constraint); the grad is taken w.r.t. the
    # LIST-of-scalars pytree, so everything differentiated is plain VPU math
    pv = [pv_ref[i] for i in range(p_sz)]

    def tile_loss(pvals):
        return jnp.sum(eval_fn(x1, x2t, pvals) * cot)

    g = jax.grad(tile_loss)(pv)  # list of p scalar cotangents
    # scatter the p gradient scalars into row 0, lanes 0..p-1 of this row
    # block's (8, 128) accumulator (per-row-block partials; see pallas_gram)
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    part = jnp.zeros((8, 128), jnp.float32)
    for i in range(p_sz):
        part = part + jnp.where(
            jnp.logical_and(rows == 0, cols == i), g[i], 0.0
        )

    @pl.when(j == 0)
    def _():
        o_ref[:] = part

    @pl.when(j > 0)
    def _():
        o_ref[:] += part


@functools.partial(jax.jit, static_argnames=("kernel", "interpret"))
def expr_lowrank_vjp_cross(
    kernel, params: Any, x1: jnp.ndarray, x2: jnp.ndarray,
    U: jnp.ndarray, W: jnp.ndarray, interpret: bool = False,
):
    """∂/∂params of Σ_ij (U Wᵀ)_ij K(x1, x2)_ij for a supported composite —
    ONE tiled pass; the tile body differentiates itself w.r.t. the flat
    param vector. Returns a pytree matching ``params``. f32."""
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    U = U.astype(jnp.float32)
    W = W.astype(jnp.float32)
    pv = pack_params(kernel, params)
    p_sz = pv.shape[0]
    eval_fn = _compile_tile_eval(kernel, params, x1.shape[1])
    n, d = x1.shape
    m = x2.shape[0]
    r = U.shape[1]
    npad = -(-n // MV_BM) * MV_BM
    mpad = -(-m // MV_BN) * MV_BN
    if npad != n:
        pad = npad - n
        x1 = jnp.concatenate([x1, jnp.zeros((pad, d), x1.dtype)], 0)
        U = jnp.concatenate([U, jnp.zeros((pad, r), U.dtype)], 0)
    if mpad != m:
        pad = mpad - m
        x2 = jnp.concatenate([x2, jnp.zeros((pad, d), x2.dtype)], 0)
        W = jnp.concatenate([W, jnp.zeros((pad, r), W.dtype)], 0)
    x2t = x2.T
    gi, gj = npad // MV_BM, mpad // MV_BN
    out = pl.pallas_call(
        functools.partial(_expr_vjp_kernel, eval_fn=eval_fn, p_sz=p_sz),
        out_shape=jax.ShapeDtypeStruct((gi * 8, 128), jnp.float32),
        grid=(gi, gj),
        in_specs=[
            pl.BlockSpec((MV_BM, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, MV_BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((MV_BM, r), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((MV_BN, r), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x1, x2t, U, W, pv)
    gvec = jnp.sum(out.reshape(gi, 8, 128)[:, 0, :], axis=0)[:p_sz]
    return unpack_grads(kernel, params, gvec)


# ---------------------------------------------------------------------------
# routing (same contract as pallas_gram.fused_*_for)
# ---------------------------------------------------------------------------


def _route_ok(kernel, params, x, interpret):
    from gaussianprocessfundamentals_tpu.ops.pallas_gram import fused_disabled

    if fused_disabled() or not (interpret or on_tpu()):
        return False
    if x.dtype != jnp.float32:
        return False
    return True


def _wn_exact_matvec(x, V, wn):
    """wn·Eq@V with Eq the EXACT row-coincidence Gram (Eq_ij = 1 iff
    x_i ≡ x_j, self included), in O(n log n + n·r): lexsort rows so equal
    rows are adjacent, segment-sum V per group, broadcast back. Equals wn·V
    only when x has no duplicate rows; using plain wn·V here while the
    gradient path (:func:`expr_lowrank_vjp_for`) uses the exact Eq made
    forward and gradient mutually inconsistent under duplicated inputs (r4
    ADVICE #1). The earlier O(n²) streamed-equality pass doubled every
    matvec's cost for WN-bearing kernels (r5 review) — the sort form is
    exact at negligible cost."""
    n, d = x.shape
    vec = V.ndim == 1
    Vm = V[:, None] if vec else V
    order = jnp.lexsort(tuple(x[:, k] for k in reversed(range(d))))
    xs = x[order]
    new_group = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        jnp.any(xs[1:] != xs[:-1], axis=-1).astype(jnp.int32),
    ])
    seg = jnp.cumsum(new_group) - 1  # [n] group ids, sorted
    sums = jax.ops.segment_sum(
        Vm[order], seg, num_segments=n, indices_are_sorted=True
    )
    out_sorted = sums[seg]  # every member gets its group's sum
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(n))
    out = out_sorted[inv]
    return wn * (out[:, 0] if vec else out)


def expr_matvec_for(kernel, params, x, interpret: bool = False):
    """``V -> K(x,x)@V`` for supported composites (WhiteNoise at root Sum
    handled via the exact-coincidence Gram), else None."""
    if not _route_ok(kernel, params, x, interpret):
        return None
    core, core_p, wn = split_white_noise(kernel, params)
    if core is None:
        return lambda V: _wn_exact_matvec(x, V, wn)
    if not supported_expr(core, core_p, x.shape[-1]):
        return None

    def mv(V):
        out = expr_gram_matvec_cross(core, core_p, x, x, V,
                                     interpret=interpret)
        if not (isinstance(wn, float) and wn == 0.0):
            out = out + _wn_exact_matvec(x, V, wn)
        return out

    return mv


def expr_matvec_cross_for(kernel, params, x1, x2, interpret: bool = False):
    """Rectangular form; WhiteNoise terms are NOT supported here (the
    coincidence pattern needs global row identity the panel does not have) —
    callers fall back to the streamed XLA path for those."""
    if not _route_ok(kernel, params, x1, interpret):
        return None
    core, core_p, wn = split_white_noise(kernel, params)
    if core is None or not (isinstance(wn, float) and wn == 0.0):
        return None
    if not supported_expr(core, core_p, x1.shape[-1]):
        return None
    return lambda V: expr_gram_matvec_cross(core, core_p, x1, x2, V,
                                            interpret=interpret)


def expr_lowrank_vjp_cross_for(kernel, params, x1, x2,
                               interpret: bool = False):
    """Rectangular ``(U, W) -> grad pytree``; WhiteNoise not supported here
    (needs global row identity — callers fall back to streamed XLA)."""
    if not _route_ok(kernel, params, x1, interpret):
        return None
    core, core_p, wn = split_white_noise(kernel, params)
    if core is not kernel or core is None:
        return None
    if not supported_expr(core, core_p, x1.shape[-1]):
        return None
    return lambda U, W: expr_lowrank_vjp_cross(
        core, core_p, x1, x2, U, W, interpret=interpret
    )


def expr_lowrank_vjp_for(kernel, params, x, interpret: bool = False):
    """``(U, W) -> grad pytree`` for supported composites, else None.

    The WhiteNoise variance gradient is Σ_ij (U Wᵀ)_ij · Eq_ij with Eq the
    EXACT row-coincidence matrix — computed by one streamed pass
    (``lowrank_gram_vjp`` on a WhiteNoise leaf) so it stays consistent with
    the forward matvec/NLL, which uses the exact-equality Gram and counts
    duplicated input rows. The cheaper diagonal-only sum Σ U∘W equals it
    only when x has no duplicate rows (the earlier behaviour — a biased
    gradient exactly in the duplicated-rows case the exact-equality kernel
    fix exists for)."""
    if not _route_ok(kernel, params, x, interpret):
        return None
    core, core_p, wn = split_white_noise(kernel, params)
    stripped = core is not kernel
    if core is not None and not supported_expr(core, core_p, x.shape[-1]):
        return None

    def vjp(U, W):
        if core is not None:
            g_core = expr_lowrank_vjp_cross(core, core_p, x, x, U, W,
                                            interpret=interpret)
        if not stripped:
            return g_core
        # rebuild the FULL params-shaped gradient, filling white-noise
        # variance grads with the exact coincidence cotangent and everything
        # else from g_core (zero for unscaled WN, which has no params)
        from gaussianprocessfundamentals_tpu.kernels.leaves import (
            WhiteNoiseKernel,
        )
        from gaussianprocessfundamentals_tpu.kernels.operators import Sum
        from gaussianprocessfundamentals_tpu.ops.gram_matvec import (
            lowrank_gram_vjp,
        )

        diag_cot = lowrank_gram_vjp(
            WhiteNoiseKernel(scaled=True),
            {"variance": jnp.asarray(1.0, x.dtype)},
            x, U, W, block=4096,
        )["variance"]
        if isinstance(kernel, WhiteNoiseKernel):
            return {"variance": diag_cot} if kernel.scaled else {}
        assert isinstance(kernel, Sum)
        out_children = []
        core_children = (
            list(g_core["children"])
            if core is not None and hasattr(core, "children")
            and isinstance(core, Sum)
            else ([g_core] if core is not None else [])
        )
        ci = 0
        for c in kernel.children:
            if isinstance(c, WhiteNoiseKernel):
                out_children.append(
                    {"variance": diag_cot.astype(x.dtype)}
                    if c.scaled else {}
                )
            else:
                out_children.append(core_children[ci])
                ci += 1
        return {"children": tuple(out_children)}

    return vjp
