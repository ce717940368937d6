"""Mesh-sharded streamed Gram matvec + low-rank-cotangent gradient.

The multi-chip form of :mod:`..ops.gram_matvec` (SURVEY §2.9 SP row / §5.7:
the GP analogue of sequence parallelism). Each chip owns an x-ROW panel and
contracts K(x_rows, x) against the full V with the streamed/fused builders —
K tiles exist only transiently (in VMEM on TPU), so per-chip memory is
O(n·(d + r)/P + n·r), NOT the O(n²/P) of resident row panels. At the BASELINE
config-5 target N=200k, resident panels need ~20 GB/chip on a v5e-8 (over its
16 GB HBM); the streamed path needs tens of MB.

Communication per matvec: one all-gather of the [n, r] RHS onto each chip
(inserted by jit to satisfy the ``shard_map`` in_specs — rides ICI), r ≈
probes+1 ≈ 10–30 columns. x itself ([n, d], d small) is replicated: at any
realistic n it is KB–MB sized, which is why no ring/ppermute exchange of x
shards is needed — the ring-attention analogy applies to K, and K is never
materialised at all.

Gradient: the rank-(2s+m+1) cotangent U·Wᵀ of ``models.iterative`` is
contracted against ∂K/∂θ per chip (U rides with the chip's x rows, W is
replicated) and the resulting parameter-gradient scalars are psum'd — the
same low-rank control-variate machinery as single-chip, no dense [n, n]
intermediate anywhere (replaces the dense-C gradient of
``parallel.distributed_fit`` r3).

Replaces the reference's only large-n mechanism, single-process CG
(``main/gpbasics/Auxiliary/LinearConjugateGradients.py:9-41``), with its
distributed generalisation.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gaussianprocessfundamentals_tpu.ops.gram_matvec import (
    gram_matvec_cross,
    lowrank_gram_vjp_cross,
)


def _pad_to(a: jnp.ndarray, rows: int) -> jnp.ndarray:
    pad = rows - a.shape[0]
    if pad <= 0:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
    )


@functools.partial(
    jax.jit, static_argnames=("kernel", "mesh", "axis", "block")
)
def mesh_gram_matvec(
    kernel,
    params: Any,
    x: jnp.ndarray,
    V: jnp.ndarray,
    mesh: Mesh,
    axis: str = "tp",
    block: int = 2048,
) -> jnp.ndarray:
    """K(x, x) @ V over the mesh; V: [n, r] (or [n]) → same shape, rows
    sharded over ``axis``.

    Each chip computes its K(x_loc, x) panel·V with
    :func:`..ops.gram_matvec.gram_matvec_cross` (streamed checkpointed XLA
    panels by default; ``GPF_FORCE_FUSED=1`` routes to the Pallas tiles). Pad rows (n not divisible by the axis
    size) multiply V's zero pad rows on the x2 side and are sliced off on the
    x1 side, so results are exact.
    """
    nd = mesh.shape[axis]
    n, d = x.shape
    vec = V.ndim == 1
    if vec:
        V = V[:, None]
    npad = -(-n // nd) * nd
    # ONE padded x serves both operands — the in_specs alone distinguish
    # the row-sharded panel owner from the replicated x2 side
    xp = _pad_to(x, npad)
    V_full = _pad_to(V, npad)  # zero pad rows: pad columns contribute 0

    def local(x_loc, x_all, V_all, p):
        return gram_matvec_cross(kernel, p, x_loc, x_all, V_all, block)

    pspec = jax.tree_util.tree_map(lambda _: P(), params)
    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(), pspec),
        out_specs=P(axis, None),
        check_vma=False,
    )(xp, xp, V_full, params)
    out = out[:n]
    return out[:, 0] if vec else out


@functools.partial(
    jax.jit, static_argnames=("kernel", "mesh", "axis", "block")
)
def mesh_lowrank_vjp(
    kernel,
    params: Any,
    x: jnp.ndarray,
    U: jnp.ndarray,
    W: jnp.ndarray,
    mesh: Mesh,
    axis: str = "tp",
    block: int = 2048,
):
    """∂/∂params of Σ_ij (U Wᵀ)_ij K_ij over the mesh — the distributed
    low-rank-cotangent gradient. U/W: [n, r]; returns a params-shaped pytree
    (replicated).

    Row i of the cotangent lives with row i of x, so U shards with x's rows
    while W (like V in the matvec) is replicated; each chip contracts its
    (x_loc, U_loc) panel against (x, W) — fused Pallas cross-VJP on TPU,
    streamed-XLA autodiff otherwise — and the parameter-gradient pytree
    (a handful of scalars) is psum'd over the axis.
    """
    nd = mesh.shape[axis]
    n, d = x.shape
    npad = -(-n // nd) * nd
    xp = _pad_to(x, npad)  # one padded x for both sharded and replicated use
    U_rows = _pad_to(U, npad)  # zero pad rows: no cotangent contribution
    W_full = _pad_to(W, npad)

    def local(x_loc, U_loc, x_all, W_all, p):
        from gaussianprocessfundamentals_tpu.ops.pallas_gram import (
            fused_lowrank_vjp_cross_for,
        )

        fused = fused_lowrank_vjp_cross_for(kernel, p, x_loc, x_all)
        if fused is not None:
            g = fused(U_loc, W_all)
        else:
            g = lowrank_gram_vjp_cross(
                kernel, p, x_loc, x_all, U_loc, W_all, block
            )
        return jax.tree_util.tree_map(lambda l: jax.lax.psum(l, axis), g)

    pspec = jax.tree_util.tree_map(lambda _: P(), params)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(), P(), pspec),
        out_specs=pspec,
        check_vma=False,
    )(xp, U_rows, xp, W_full, params)
