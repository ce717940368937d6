"""Pallas TPU kernels for tiled Gram-matrix construction.

TPU-native replacement for the reference's Gram build
(``main/gpbasics/KernelBasics/BaseKernels.py:277-294`` SE path): one fused
kernel per [bm, bn] tile computes squared distances via the matmul expansion
(MXU), applies the covariance transcendental (VPU), and adds noise/jitter on
diagonal tiles — K + σ²I is produced in a single pass with no [n, m]
intermediate distance matrix and no separate diagonal update (saving two full
HBM round-trips over the unfused XLA path).

Row norms and x2ᵀ are precomputed outside (O(n·d), negligible) so tiles need
only MXU-shaped operands: x1 [bm, d] · x2ᵀ [d, bn].

These kernels are f32 (TPU-native precision). The f64 path (reference parity)
uses the XLA builder in :mod:`..kernels`; SURVEY.md §7 "hard parts" #2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 512
BN = 512



def _tile_sq_dists(x1_ref, x2t_ref, n1_ref, n2_ref):
    """Squared distances for one tile. d = 1 uses DIRECT differences on the
    VPU — exact to f32 eps. The MXU norm-expansion n1 − 2·x1x2ᵀ + n2 leaves
    ~2e-7 relative error on d² (3-pass f32 product round-off), which
    exp(−d²/2ℓ²) amplifies ×(range/ℓ)² into ~1e-5 kernel-entry error — enough
    to floor CG at ε·κ ≈ 0.2 relative residual at n = 50–100k (measured r3).
    d > 1 keeps the MXU expansion (no cheap exact alternative)."""
    if x1_ref.shape[1] == 1:
        diff = x1_ref[:] - x2t_ref[:]  # [bm, 1] - [1, bn] -> [bm, bn]
        return diff * diff
    ab = jnp.dot(x1_ref[:], x2t_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(n1_ref[:] - 2.0 * ab + n2_ref[:], 0.0)


def _se_tile_kernel(x1_ref, x2t_ref, n1_ref, n2_ref, scal_ref, out_ref):
    """One [BM, BN] tile of variance·exp(−½d²/ℓ²) (+ diag σ²+jitter)."""
    i, j = pl.program_id(0), pl.program_id(1)
    d2 = _tile_sq_dists(x1_ref, x2t_ref, n1_ref, n2_ref)
    ls = scal_ref[0]
    var = scal_ref[1]
    diag = scal_ref[2]
    k = var * jnp.exp(-0.5 * d2 / (ls * ls))

    @pl.when(jnp.logical_and(diag > 0.0, i == j))
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (BM, BN), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (BM, BN), 1)
        out_ref[:] = k + jnp.where(rows == cols, diag, 0.0)

    @pl.when(jnp.logical_not(jnp.logical_and(diag > 0.0, i == j)))
    def _():
        out_ref[:] = k


@functools.partial(jax.jit, static_argnames=("interpret",))
def se_gram(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    lengthscale,
    variance=1.0,
    diag_add=0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused SE Gram K = var·exp(−½‖x1−x2‖²/ℓ²) (+ diag_add·I on the diagonal
    when x1 is x2), tiled [BM, BN]. f32; x: [n, d], [m, d] → [n, m].

    ``diag_add`` fuses the reference's separate K → K_noised pass
    (``Statistics/CovarianceMatrix.py:197-206``) into the Gram build.
    """
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    n, d = x1.shape
    m = x2.shape[0]
    x2t = x2.T  # [d, m]
    n1 = jnp.sum(x1 * x1, axis=-1, keepdims=True)  # [n, 1]
    n2 = jnp.sum(x2 * x2, axis=-1)[None, :]  # [1, m]
    scal = jnp.stack(
        [
            jnp.asarray(lengthscale, jnp.float32),
            jnp.asarray(variance, jnp.float32),
            jnp.asarray(diag_add, jnp.float32),
        ]
    )
    grid = (pl.cdiv(n, BM), pl.cdiv(m, BN))
    return pl.pallas_call(
        _se_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * d + 6 * n * m,
            bytes_accessed=4 * (n * d + m * d + n * m),
            transcendentals=n * m,
        ),
        interpret=interpret,
    )(x1, x2t, n1, n2, scal)


def _matern_tile_kernel(x1_ref, x2t_ref, n1_ref, n2_ref, scal_ref, out_ref, *, sqrt_c, d2_term):
    i, j = pl.program_id(0), pl.program_id(1)
    d2 = _tile_sq_dists(x1_ref, x2t_ref, n1_ref, n2_ref)
    dist = jnp.sqrt(d2)
    ls = scal_ref[0]
    var = scal_ref[1]
    diag = scal_ref[2]
    frac = sqrt_c * dist / ls
    poly = 1.0 + frac
    if d2_term:
        poly = poly + 5.0 * d2 / (3.0 * ls * ls)
    k = var * poly * jnp.exp(-frac)

    @pl.when(jnp.logical_and(diag > 0.0, i == j))
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (BM, BN), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (BM, BN), 1)
        out_ref[:] = k + jnp.where(rows == cols, diag, 0.0)

    @pl.when(jnp.logical_not(jnp.logical_and(diag > 0.0, i == j)))
    def _():
        out_ref[:] = k


@functools.partial(jax.jit, static_argnames=("nu", "interpret"))
def matern_gram(
    x1, x2, lengthscale, variance=1.0, diag_add=0.0, nu: str = "52",
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused Matérn-3/2 or -5/2 Gram tile kernel (Euclidean distance form;
    the reference's Manhattan variant coincides for d=1). f32."""
    import math

    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    n, d = x1.shape
    m = x2.shape[0]
    sqrt_c = math.sqrt(3.0) if nu == "32" else math.sqrt(5.0)
    kernel = functools.partial(
        _matern_tile_kernel, sqrt_c=sqrt_c, d2_term=(nu == "52")
    )
    x2t = x2.T
    n1 = jnp.sum(x1 * x1, axis=-1, keepdims=True)
    n2 = jnp.sum(x2 * x2, axis=-1)[None, :]
    scal = jnp.stack(
        [
            jnp.asarray(lengthscale, jnp.float32),
            jnp.asarray(variance, jnp.float32),
            jnp.asarray(diag_add, jnp.float32),
        ]
    )
    grid = (pl.cdiv(n, BM), pl.cdiv(m, BN))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * d + 10 * n * m,
            bytes_accessed=4 * (n * d + m * d + n * m),
            transcendentals=2 * n * m,
        ),
        interpret=interpret,
    )(x1, x2t, n1, n2, scal)


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def fused_disabled() -> bool:
    """A/B kill switch: set GPF_NO_FUSED=1 to force every router to the
    streamed-XLA fallback (used by benchmarks to measure routing choices on
    the real program, not just standalone ops).

    PROCESS-LEVEL knob: read at trace time and baked into the jit cache —
    set it before the first call of the process; flipping it mid-process
    silently has no effect on already-compiled shapes (same for
    GPF_FORCE_FUSED in ``ops.gram_matvec``)."""
    import os

    return bool(os.environ.get("GPF_NO_FUSED"))


# ---- fused Gram·V matvec: K tiles live only in VMEM -------------------------
#
# The streamed XLA matvec (``ops.gram_matvec``) materialises each [block, n]
# K panel in HBM between the transcendental and the matmul: at N=100k that is
# ~80 GB of HBM traffic per matvec and the measured 2.9 s/step of the
# iterative fit is almost entirely those round trips. Here each [BM, BN] tile
# is built in VMEM (MXU distance expansion + VPU transcendental) and
# immediately contracted with V's [BN, r] slab — HBM traffic drops to
# O(n·(d + r)) per matvec, leaving the VPU transcendental rate as the bound.

MV_BM = 512
MV_BN = 512


def _mv_kernel(x1_ref, x2t_ref, n1_ref, n2_ref, v_ref, scal_ref, o_ref, *,
               kind: str):
    j = pl.program_id(1)
    d2 = _tile_sq_dists(x1_ref, x2t_ref, n1_ref, n2_ref)
    ls = scal_ref[0]
    var = scal_ref[1]
    if kind == "se":
        k = var * jnp.exp(-0.5 * d2 / (ls * ls))
    else:
        import math

        sqrt_c = math.sqrt(3.0) if kind == "mat32" else math.sqrt(5.0)
        frac = sqrt_c * jnp.sqrt(d2) / ls
        poly = 1.0 + frac
        if kind == "mat52":
            poly = poly + 5.0 * d2 / (3.0 * ls * ls)
        k = var * poly * jnp.exp(-frac)
    contrib = jnp.dot(k, v_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == 0)
    def _():
        o_ref[:] = contrib

    @pl.when(j > 0)
    def _():
        o_ref[:] += contrib


@functools.partial(jax.jit, static_argnames=("kind", "interpret"))
def fused_gram_matvec_cross(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    V: jnp.ndarray,
    lengthscale,
    variance=1.0,
    kind: str = "se",
    interpret: bool = False,
) -> jnp.ndarray:
    """K(x1, x2) @ V with K tiles computed in VMEM and never written to HBM.

    x1: [n1, d], x2: [n2, d], V: [n2, r] → [n1, r]. f32. ``kind`` ∈ {"se",
    "mat32", "mat52"} (Matérn in the Euclidean-distance form — coincides with
    the reference's Manhattan variant at d=1, ``BaseKernels.py:702-720``).
    Inputs are padded to tile multiples; V's pad rows are zero so
    out-of-range columns contribute nothing, and pad OUTPUT rows are sliced
    off. The rectangular form is what the mesh-sharded matvec needs: each
    chip contracts its x-row panel against the full x (SURVEY §2.9 SP row).
    """
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    V = V.astype(jnp.float32)
    vec = V.ndim == 1
    if vec:
        V = V[:, None]
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
    n1 = jnp.sum(x1 * x1, axis=-1, keepdims=True)
    n2 = jnp.sum(x2 * x2, axis=-1)[None, :]
    scal = jnp.stack([
        jnp.asarray(lengthscale, jnp.float32),
        jnp.asarray(variance, jnp.float32),
    ])
    grid = (npad // MV_BM, mpad // MV_BN)
    kernel = functools.partial(_mv_kernel, kind=kind)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((npad, r), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((MV_BM, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, MV_BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((MV_BM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MV_BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((MV_BN, r), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((MV_BM, r), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * mpad * (d + r) + 8 * npad * mpad,
            bytes_accessed=4 * (npad * d + mpad * d + npad * r + mpad * r)
            * (mpad // MV_BN),
            transcendentals=npad * mpad,
        ),
        interpret=interpret,
    )(x1, x2t, n1, n2, V, scal)
    out = out[:n]
    return out[:, 0] if vec else out


def fused_gram_matvec(
    x: jnp.ndarray,
    V: jnp.ndarray,
    lengthscale,
    variance=1.0,
    kind: str = "se",
    interpret: bool = False,
) -> jnp.ndarray:
    """K(x, x) @ V — square form of :func:`fused_gram_matvec_cross`."""
    return fused_gram_matvec_cross(
        x, x, V, lengthscale, variance, kind=kind, interpret=interpret
    )


# ---- fused low-rank-cotangent gradient: one pass, analytic ∂K/∂θ ------------
#
# The iterative exact-GP gradient is Σ_ij (U Wᵀ)_ij · ∂K_ij/∂θ with a rank-r
# cotangent (``models.iterative``). The streamed XLA path
# (``ops.gram_matvec.lowrank_gram_vjp``) materialises each [block, n] K panel
# plus its cotangent panel in HBM and autodiffs through the build — ~3 full
# n² HBM round trips per gradient. Here each [BM, BN] tile computes d² (MXU),
# the cotangent tile U_i·W_jᵀ (MXU), and the ANALYTIC ∂K/∂lengthscale /
# ∂K/∂variance weights (VPU), reducing straight to per-row-block partial
# sums: one n² pass, O(n·r) HBM traffic, no autodiff.


def _lrvjp_kernel(x1_ref, x2t_ref, n1_ref, n2_ref, u_ref, w_ref, scal_ref,
                  o_ref, *, kind: str):
    import math

    i, j = pl.program_id(0), pl.program_id(1)
    d2 = _tile_sq_dists(x1_ref, x2t_ref, n1_ref, n2_ref)
    ls = scal_ref[0]
    var = scal_ref[1]
    cot = jnp.dot(u_ref[:], w_ref[:].T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    if kind == "se":
        k = var * jnp.exp(-0.5 * d2 / (ls * ls))
        dls = k * d2 / (ls * ls * ls)
    else:
        sqrt_c = math.sqrt(3.0) if kind == "mat32" else math.sqrt(5.0)
        f = sqrt_c * jnp.sqrt(d2) / ls
        e = jnp.exp(-f)
        if kind == "mat32":
            k = var * (1.0 + f) * e
            dls = var * f * f * e / ls
        else:  # mat52: k = var(1+f+f²/3)e⁻ᶠ, ∂k/∂ls = var·f²(1+f)e⁻ᶠ/(3ls)
            k = var * (1.0 + f + f * f / 3.0) * e
            dls = var * f * f * (1.0 + f) * e / (3.0 * ls)
    # partial sums land in lanes [0,0] (g_ls) and [0,1] (g_var) of THIS ROW
    # BLOCK's (8, 128) accumulator — one accumulator per row block i, summed
    # afterwards in XLA (a single global f32 accumulator across all (n/B)²
    # sequential grid steps loses digits at n=100k: ~4e4 adds of large
    # partials; per-row-block keeps each chain to n/B adds). TPU requires
    # (8,128)-aligned output tiles; the sequential grid makes += across the
    # j-iterations of one row block well-defined.
    del i
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    on_row = rows == 0
    part = jnp.where(
        jnp.logical_and(on_row, cols == 0), jnp.sum(cot * dls), 0.0
    ) + jnp.where(
        jnp.logical_and(on_row, cols == 1), jnp.sum(cot * k) / var, 0.0
    )

    @pl.when(j == 0)
    def _():
        o_ref[:] = part

    @pl.when(j > 0)
    def _():
        o_ref[:] += part


@functools.partial(jax.jit, static_argnames=("kind", "interpret"))
def fused_lowrank_vjp_cross(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    U: jnp.ndarray,
    W: jnp.ndarray,
    lengthscale,
    variance=1.0,
    kind: str = "se",
    interpret: bool = False,
):
    """(g_lengthscale, g_variance) of Σ_ij (U Wᵀ)_ij K(x1, x2)_ij(θ) in ONE
    tiled pass with analytic in-tile derivatives. x1: [n1, d], x2: [n2, d],
    U: [n1, r], W: [n2, r]. f32. ``g_variance`` is Σ cot·K/var (valid whether
    or not the kernel carries a variance parameter — callers of unscaled
    kernels just drop it). The rectangular form serves the mesh-sharded
    gradient: each chip contracts its (x-rows, U-rows) panel against the full
    (x, W) and psums the resulting scalars."""
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    U = U.astype(jnp.float32)
    W = W.astype(jnp.float32)
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
    n1 = jnp.sum(x1 * x1, axis=-1, keepdims=True)
    n2 = jnp.sum(x2 * x2, axis=-1)[None, :]
    scal = jnp.stack([
        jnp.asarray(lengthscale, jnp.float32),
        jnp.asarray(variance, jnp.float32),
    ])
    gi, gj = npad // MV_BM, mpad // MV_BN
    out = pl.pallas_call(
        functools.partial(_lrvjp_kernel, kind=kind),
        out_shape=jax.ShapeDtypeStruct((gi * 8, 128), jnp.float32),
        grid=(gi, gj),
        in_specs=[
            pl.BlockSpec((MV_BM, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, MV_BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((MV_BM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MV_BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((MV_BM, r), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((MV_BN, r), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * mpad * (d + r) + 12 * npad * mpad,
            bytes_accessed=4 * (npad * d + mpad * d + npad * r + mpad * r) * gj,
            transcendentals=npad * mpad,
        ),
        interpret=interpret,
    )(x1, x2t, n1, n2, U, W, scal)
    # reduce the per-row-block partials (one (8,128) slab per row block, data
    # in row 0 lanes 0/1) in XLA
    part = out.reshape(gi, 8, 128)[:, 0, :2]
    g = jnp.sum(part, axis=0)
    return g[0], g[1]


def fused_lowrank_vjp(
    x: jnp.ndarray,
    U: jnp.ndarray,
    W: jnp.ndarray,
    lengthscale,
    variance=1.0,
    kind: str = "se",
    interpret: bool = False,
):
    """Square (x1 = x2 = x) form of :func:`fused_lowrank_vjp_cross`."""
    return fused_lowrank_vjp_cross(
        x, x, U, W, lengthscale, variance, kind=kind, interpret=interpret
    )


def _fused_kind_for(kernel, params, x):
    """Shared routing predicate: Pallas tile kernels cover f32 SE (any d) and
    Matérn-3/2 / -5/2 at d=1 (where Manhattan ≡ Euclidean distance), scalar
    lengthscale, on TPU (or in interpret mode)."""
    from gaussianprocessfundamentals_tpu.kernels.leaves import (
        Matern32Kernel,
        Matern52Kernel,
        SquaredExponentialKernel,
    )

    if x.dtype != jnp.float32:
        return None
    if isinstance(kernel, SquaredExponentialKernel):
        kind = "se"
    elif isinstance(kernel, Matern32Kernel) and x.shape[-1] == 1:
        kind = "mat32"
    elif isinstance(kernel, Matern52Kernel) and x.shape[-1] == 1:
        kind = "mat52"
    else:
        return None
    ls = params.get("lengthscale")
    if ls is None or jnp.ndim(ls) != 0:
        return None  # ARD / per-dim lengthscales use the XLA path
    return kind


def fused_lowrank_vjp_for(kernel, params, x, interpret: bool = False):
    """Return ``(U, W) -> grad_params_dict`` using :func:`fused_lowrank_vjp`
    when supported (same coverage as :func:`fused_matvec_for`), else None.
    The returned dict mirrors ``params``' structure exactly."""
    if fused_disabled() or not (interpret or on_tpu()):
        return None
    kind = _fused_kind_for(kernel, params, x)
    if kind is None:
        from gaussianprocessfundamentals_tpu.ops.pallas_expr import (
            expr_lowrank_vjp_for,
        )

        return expr_lowrank_vjp_for(kernel, params, x, interpret=interpret)
    scaled = getattr(kernel, "scaled", False)
    if scaled and "variance" not in params:
        return None
    ls = params["lengthscale"]
    var = params.get("variance", 1.0)

    def vjp(U, W):
        g_ls, g_var = fused_lowrank_vjp(x, U, W, ls, var, kind=kind,
                                        interpret=interpret)
        out = {"lengthscale": g_ls.astype(jnp.result_type(ls))}
        if scaled:
            out["variance"] = g_var.astype(jnp.result_type(ls))
        return out

    return vjp


def fused_matvec_cross_for(kernel, params, x1, x2, interpret: bool = False):
    """Return a ``V -> K(x1,x2)@V`` closure using
    :func:`fused_gram_matvec_cross` when supported, else the composite
    in-tile AST engine (``pallas_expr``), else None."""
    if fused_disabled() or not (interpret or on_tpu()):
        return None
    kind = _fused_kind_for(kernel, params, x1)
    if kind is None:
        from gaussianprocessfundamentals_tpu.ops.pallas_expr import (
            expr_matvec_cross_for,
        )

        return expr_matvec_cross_for(kernel, params, x1, x2,
                                     interpret=interpret)
    ls = params["lengthscale"]
    var = params.get("variance", 1.0)
    return lambda V: fused_gram_matvec_cross(x1, x2, V, ls, var, kind=kind,
                                             interpret=interpret)


def fused_lowrank_vjp_cross_for(kernel, params, x1, x2,
                                interpret: bool = False):
    """Return ``(U, W) -> grad_params_dict`` for the rectangular cotangent
    Σ_ij (U Wᵀ)_ij K(x1, x2)_ij when supported, else None."""
    if fused_disabled() or not (interpret or on_tpu()):
        return None
    kind = _fused_kind_for(kernel, params, x1)
    if kind is None:
        from gaussianprocessfundamentals_tpu.ops.pallas_expr import (
            expr_lowrank_vjp_cross_for,
        )

        return expr_lowrank_vjp_cross_for(kernel, params, x1, x2,
                                          interpret=interpret)
    scaled = getattr(kernel, "scaled", False)
    if scaled and "variance" not in params:
        return None
    ls = params["lengthscale"]
    var = params.get("variance", 1.0)

    def vjp(U, W):
        g_ls, g_var = fused_lowrank_vjp_cross(
            x1, x2, U, W, ls, var, kind=kind, interpret=interpret
        )
        out = {"lengthscale": g_ls.astype(jnp.result_type(ls))}
        if scaled:
            out["variance"] = g_var.astype(jnp.result_type(ls))
        return out

    return vjp


def fused_matvec_for(kernel, params, x, interpret: bool = False):
    """Return a ``V -> K(x,x)@V`` closure using :func:`fused_gram_matvec` when
    the (kernel, dtype, backend, dimensionality) combination supports it,
    else None. The streamed-XLA fallback stays in ``ops.gram_matvec``.

    Forward-only by design: the iterative path's gradients come from the
    low-rank cotangent contraction (``ops.gram_matvec.lowrank_gram_vjp``),
    never by differentiating the CG matvec, so no Pallas VJP is needed.
    """
    if fused_disabled() or not (interpret or on_tpu()):
        return None
    kind = _fused_kind_for(kernel, params, x)
    if kind is None:
        from gaussianprocessfundamentals_tpu.ops.pallas_expr import (
            expr_matvec_for,
        )

        return expr_matvec_for(kernel, params, x, interpret=interpret)
    ls = params["lengthscale"]
    var = params.get("variance", 1.0)
    return lambda V: fused_gram_matvec(x, V, ls, var, kind=kind,
                                       interpret=interpret)
