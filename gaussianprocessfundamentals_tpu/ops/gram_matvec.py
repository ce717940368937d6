"""Materialisation-free Gram operations: K·V and low-rank-cotangent VJP.

For n beyond ~30k a single chip cannot hold K (n² f32 at 100k = 40 GB vs
16 GB HBM on v5e). These operators stream K in row blocks — each block is
(re)built from x (tiny) on the fly, used, and discarded, so memory is
O(block·n) and the only persistent state is x itself. This is the KeOps-style
lazy-kernel idea expressed as a ``lax.scan`` + ``jax.checkpoint``: XLA keeps
the block build fused with its consumer (distance + transcendental + matmul
in one kernel), so K never touches HBM at all.

Used by :mod:`..linalg.mbcg` for factorisation-free exact GPs at N=100k+
(BASELINE north star), and by its gradient path, where the probe cotangent
½(sym(ẐZᵀ)/s − ααᵀ) is LOW-RANK: ``lowrank_gram_vjp`` contracts
Σ_ij (UVᵀ)_ij·∂K_ij/∂θ block-by-block under autodiff without ever forming
either K or the cotangent.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp


def _pad_rows(x: jnp.ndarray, block: int):
    n = x.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x, nb, pad


@functools.partial(jax.jit, static_argnames=("kernel", "block"))
def gram_matvec(
    kernel, params: Any, x: jnp.ndarray, V: jnp.ndarray, block: int = 2048
) -> jnp.ndarray:
    """K(x,x) @ V; V: [n, r]. K is streamed in [block, n] row panels built
    on the fly under ``jax.checkpoint`` — XLA fuses the distance +
    transcendental + contraction so no K panel round-trips HBM.

    Routing history: r3 routed TPU-f32 leaf kernels to the fused Pallas tile
    matvec; the r4 routing A/B on the COMPOSED mBCG program (healthy
    preconditioner, BENCHMARKS.md) measured the streamed XLA path faster
    (306 vs 342 ms at N=50k, 813 vs 1169 ms at N=100k — both near the VPU
    transcendental roofline, XLA's exp lowering wins), so streamed is now
    the default. ``GPF_FORCE_FUSED=1`` restores the Pallas tile route (A/B
    knob); the fused LOW-RANK VJP remains the gradient default (single
    fused pass vs ~3 n² autodiff passes).
    """
    import os

    if os.environ.get("GPF_FORCE_FUSED"):
        from gaussianprocessfundamentals_tpu.ops.pallas_gram import (
            fused_matvec_for,
        )

        fused = fused_matvec_for(kernel, params, x)
        if fused is not None:
            return fused(V)
    if x.shape[0] >= _SYM_MIN_N and os.environ.get("GPF_SYM"):
        # OPT-IN (GPF_SYM=1): halves kernel-entry evaluations but measured
        # r5 only 1.02–1.09× end-to-end (50k/100k/200k) — under XLA the K
        # tile feeds TWO consumers (K·V_j and Kᵀ·V_i) and therefore cannot
        # stay fused; the [blk, blk] tile's HBM round trip (~157 GB at
        # n=200k) eats the transcendental savings. A genuinely-fused
        # symmetric pass needs a Pallas tile applying both contractions
        # in-VMEM (future work); until then the full-row streamed form
        # stays default.
        return streamed_gram_matvec_symmetric(
            kernel, params, x, V, max(block, 4096)
        )
    return streamed_gram_matvec(kernel, params, x, V, block)


@functools.partial(jax.jit, static_argnames=("kernel", "block"))
def streamed_gram_matvec(
    kernel, params: Any, x: jnp.ndarray, V: jnp.ndarray, block: int = 2048
) -> jnp.ndarray:
    """The XLA row-panel fallback (public for A/B benchmarking and for
    kernels the fused tiles do not cover)."""
    n = x.shape[0]
    xp, nb, pad = _pad_rows(x, block)
    x_blocks = xp.reshape(nb, block, x.shape[-1])

    @jax.checkpoint
    def one(xb):
        Kb = kernel.gram(params, xb, x)  # [block, n]
        # full-f32 matmul: TPU default (bf16) floors CG residuals at ~1e-2
        return jnp.matmul(Kb, V, precision=jax.lax.Precision.HIGHEST)

    out = jax.lax.map(one, x_blocks)  # [nb, block, r]
    return out.reshape(nb * block, -1)[:n]


@functools.partial(jax.jit, static_argnames=("kernel", "block"))
def gram_matvec_cross(
    kernel, params: Any, x1: jnp.ndarray, x2: jnp.ndarray, V: jnp.ndarray,
    block: int = 2048,
) -> jnp.ndarray:
    """K(x1, x2) @ V; x1: [n1, d], x2: [n2, d], V: [n2, r] → [n1, r].

    The rectangular form of :func:`gram_matvec` — the unit of work of the
    mesh-sharded matvec (each chip owns an x1-row panel). Streams
    [block, n2] panels by default (see :func:`gram_matvec` routing note);
    ``GPF_FORCE_FUSED=1`` restores the fused Pallas cross tiles.
    """
    import os

    if os.environ.get("GPF_FORCE_FUSED"):
        from gaussianprocessfundamentals_tpu.ops.pallas_gram import (
            fused_matvec_cross_for,
        )

        fused = fused_matvec_cross_for(kernel, params, x1, x2)
        if fused is not None:
            return fused(V)
    return streamed_gram_matvec_cross(kernel, params, x1, x2, V, block)


@functools.partial(jax.jit, static_argnames=("kernel", "block"))
def streamed_gram_matvec_cross(
    kernel, params: Any, x1: jnp.ndarray, x2: jnp.ndarray, V: jnp.ndarray,
    block: int = 2048,
) -> jnp.ndarray:
    """XLA row-panel fallback for :func:`gram_matvec_cross`."""
    n = x1.shape[0]
    blk = min(block, max(n, 1))
    xp, nb, pad = _pad_rows(x1, blk)
    x_blocks = xp.reshape(nb, blk, x1.shape[-1])

    @jax.checkpoint
    def one(xb):
        Kb = kernel.gram(params, xb, x2)  # [blk, n2]
        return jnp.matmul(Kb, V, precision=jax.lax.Precision.HIGHEST)

    out = jax.lax.map(one, x_blocks)  # [nb, blk, r]
    return out.reshape(nb * blk, -1)[:n]


@functools.partial(jax.jit, static_argnames=("kernel", "block"))
def streamed_gram_matvec_symmetric(
    kernel, params: Any, x: jnp.ndarray, V: jnp.ndarray, block: int = 4096
) -> jnp.ndarray:
    """K(x,x) @ V exploiting SYMMETRY: only the upper-triangle tile grid is
    built, each off-diagonal tile serving two contractions (out_i += K·V_j
    and out_j += Kᵀ·V_i).

    The square streamed matvec is TRANSCENDENTAL-roofline-bound at large n
    (r5 profile: N=200k SE matvec 0.25 s ≈ 4e10 exp evaluations at the VPU
    exp rate), so halving the kernel-entry evaluations is the one remaining
    single-chip lever: tiles evaluated = nb(nb+1)/2 of nb² — a →2× saving as
    nb grows (measured on-chip at N=100k/200k: 1.47×/1.7× vs the full-row
    streamed form). Zero-padded rows are harmless: pad rows of V are zero
    (no contribution into valid rows) and pad OUTPUT rows are sliced off.
    """
    import numpy as np

    n = x.shape[0]
    r = V.shape[1]
    blk = min(block, max(n, 1))
    xp, nb, _ = _pad_rows(x, blk)
    Vp, _, _ = _pad_rows(V, blk)
    x_blocks = xp.reshape(nb, blk, x.shape[-1])
    V_blocks = Vp.reshape(nb, blk, r)
    ii, jj = np.triu_indices(nb)
    pairs = jnp.asarray(np.stack([ii, jj], axis=1), jnp.int32)  # [T, 2]
    hp = jax.lax.Precision.HIGHEST

    def step(acc, pair):
        i, j = pair[0], pair[1]
        xi = jax.lax.dynamic_index_in_dim(x_blocks, i, keepdims=False)
        xj = jax.lax.dynamic_index_in_dim(x_blocks, j, keepdims=False)
        Vi = jax.lax.dynamic_index_in_dim(V_blocks, i, keepdims=False)
        Vj = jax.lax.dynamic_index_in_dim(V_blocks, j, keepdims=False)
        K = kernel.gram(params, xi, xj)  # [blk, blk]
        out_i = jnp.matmul(K, Vj, precision=hp)
        acc_i = jax.lax.dynamic_index_in_dim(acc, i, keepdims=False)
        acc = jax.lax.dynamic_update_index_in_dim(acc, acc_i + out_i, i, 0)
        # transpose contribution, skipped on diagonal tiles (already whole)
        out_j = jnp.where(
            i == j, 0.0, jnp.matmul(K.T, Vi, precision=hp)
        )
        acc_j = jax.lax.dynamic_index_in_dim(acc, j, keepdims=False)
        acc = jax.lax.dynamic_update_index_in_dim(acc, acc_j + out_j, j, 0)
        return acc, None

    acc0 = jnp.zeros((nb, blk, r), V.dtype)
    acc, _ = jax.lax.scan(step, acc0, pairs)
    return acc.reshape(nb * blk, r)[:n]


# symmetric-tile routing threshold: below this the (nb+1)/(2nb) work ratio
# and the per-tile gather/scatter overhead eat the savings (A/B r5)
_SYM_MIN_N = 32_768


@functools.partial(jax.jit, static_argnames=("kernel", "block"))
def gram_diag_sum(kernel, params: Any, x: jnp.ndarray, block: int = 8192) -> jnp.ndarray:
    """tr(K) without the matrix."""
    return jnp.sum(kernel.diag(params, x))


def lowrank_gram_vjp(
    kernel, params: Any, x: jnp.ndarray, U: jnp.ndarray, W: jnp.ndarray,
    block: int = 2048,
):
    """∂/∂params of Σ_ij (U Wᵀ)_ij K_ij(params), streamed in row blocks.

    U, W: [n, r] low-rank cotangent factors (cot = U Wᵀ). Memory O(block·n);
    rebuilds each K block once under ``jax.checkpoint`` for the backward.
    """
    n = x.shape[0]
    xp, nb, pad = _pad_rows(x, block)
    x_blocks = xp.reshape(nb, block, x.shape[-1])
    Up, _, _ = _pad_rows(U, block)
    U_blocks = Up.reshape(nb, block, U.shape[-1])

    def total(p):
        @jax.checkpoint
        def one(args):
            xb, ub = args
            Kb = kernel.gram(p, xb, x)  # [block, n]
            cot_b = jnp.matmul(ub, W.T, precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(Kb * cot_b)

        return jnp.sum(jax.lax.map(one, (x_blocks, U_blocks)))

    return jax.grad(total)(params)


def lowrank_gram_vjp_cross(
    kernel, params: Any, x1: jnp.ndarray, x2: jnp.ndarray,
    U: jnp.ndarray, W: jnp.ndarray, block: int = 2048,
):
    """∂/∂params of Σ_ij (U Wᵀ)_ij K(x1, x2)_ij, streamed in x1-row blocks.

    The rectangular form of :func:`lowrank_gram_vjp`: U rides with x1's rows
    ([n1, r]), W with x2's ([n2, r]). This is the per-chip unit of the
    mesh-sharded gradient (each chip owns an (x-rows, U-rows) panel and psums
    the resulting parameter gradients).
    """
    n = x1.shape[0]
    blk = min(block, max(n, 1))
    xp, nb, pad = _pad_rows(x1, blk)
    x_blocks = xp.reshape(nb, blk, x1.shape[-1])
    Up, _, _ = _pad_rows(U, blk)
    U_blocks = Up.reshape(nb, blk, U.shape[-1])

    def total(p):
        @jax.checkpoint
        def one(args):
            xb, ub = args
            Kb = kernel.gram(p, xb, x2)  # [blk, n2]
            cot_b = jnp.matmul(ub, W.T, precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(Kb * cot_b)

        return jnp.sum(jax.lax.map(one, (x_blocks, U_blocks)))

    return jax.grad(total)(params)
