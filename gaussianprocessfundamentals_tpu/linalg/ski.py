"""Structured Kernel Interpolation (SKI): K̂ = W·K_mm·Wᵀ.

Reference: ``main/gpbasics/Metrics/StructuredKernelInterpolation.py:12-62`` —
interpolation weights W are inverse-distance weights over each point's two
nearest inducing points (``:12-49``), and the approximate log-det scales
eigenvalues of K_mm by (n/m) (``:52-62``).

TPU-native formulation: the inducing grid is sorted and equispaced along
x[:, 0], so the two neighbours come from ``searchsorted`` (no O(n·m) distance
matrix) and W is represented *sparsely* as (indices, weights) pairs — matvecs
with K̂ are gather/scatter + an m×m matmul, O(n + m²) per matvec.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gaussianprocessfundamentals_tpu.linalg.cholesky import add_diag


class SKIState(NamedTuple):
    idx: jnp.ndarray  # [n, 2] neighbour indices into the inducing grid
    w: jnp.ndarray  # [n, 2] interpolation weights (rows sum to 1)
    K_mm: jnp.ndarray  # [m, m] inducing Gram


def ski_interp(x: jnp.ndarray, grid: jnp.ndarray):
    """Two-nearest inverse-distance interpolation of x onto the inducing set.

    d == 1 (sorted grid): neighbours via ``searchsorted`` — O(n log m), no
    distance matrix. d > 1: the reference's generic formulation
    (``StructuredKernelInterpolation.py:32-49``) — full point-to-inducing
    Euclidean distances, two nearest per row, weights d₂/(d₁+d₂) and
    d₁/(d₁+d₂). Both return ([n, 2] indices, [n, 2] weights summing to 1).
    """
    if x.shape[-1] == 1:
        g = grid[:, 0]
        m = g.shape[0]
        x0 = x[:, 0]
        hi = jnp.clip(jnp.searchsorted(g, x0), 1, m - 1)
        lo = hi - 1
        d_lo = jnp.abs(x0 - g[lo])
        d_hi = jnp.abs(g[hi] - x0)
        total = jnp.where(d_lo + d_hi > 0, d_lo + d_hi, 1.0)
        w_lo = jnp.where(d_lo + d_hi > 0, d_hi / total, 0.5)
        idx = jnp.stack([lo, hi], axis=-1)
        w = jnp.stack([w_lo, 1.0 - w_lo], axis=-1)
        return idx, w
    return ski_interp_knn(x, grid)


def ski_interp_knn(x: jnp.ndarray, grid: jnp.ndarray):
    """Generic-dimension two-nearest-neighbour interpolation weights
    (reference ``get_weight_matrix``, ``StructuredKernelInterpolation.py:32-49``:
    dense [n, m] Euclidean distances, weight_1 = 1 − d₁/(d₁+d₂)). The dense
    distance matrix is one MXU-shaped ‖a‖²−2ab+‖b‖² pass; top-2 via
    ``lax.top_k`` on the negated distances."""
    import jax

    from gaussianprocessfundamentals_tpu.ops.distances import sq_euclidean

    d2 = sq_euclidean(x, grid)  # [n, m]
    neg_top, idx = jax.lax.top_k(-d2, 2)  # two smallest distances
    d12 = jnp.sqrt(jnp.maximum(-neg_top, 0.0))  # [n, 2] (d1 <= d2)
    total = d12[:, 0] + d12[:, 1]
    safe = jnp.where(total > 0, total, 1.0)
    w1 = jnp.where(total > 0, d12[:, 1] / safe, 0.5)
    w = jnp.stack([w1, 1.0 - w1], axis=-1)
    return idx, w


def ski_factor(kernel, params, x: jnp.ndarray, grid: jnp.ndarray) -> SKIState:
    idx, w = ski_interp(x, grid)
    K_mm = kernel.gram(params, grid, grid)
    return SKIState(idx, w, K_mm)


def ski_matvec(state: SKIState, noise, v: jnp.ndarray) -> jnp.ndarray:
    """(W K_mm Wᵀ + σ²I)·v in O(n + m²)."""
    m = state.K_mm.shape[0]
    # Wᵀ v: scatter-add of weighted v into grid bins
    wt_v = jnp.zeros((m,), v.dtype).at[state.idx.reshape(-1)].add(
        (state.w * v[:, None]).reshape(-1)
    )
    u = state.K_mm @ wt_v
    # W u: gather
    Wu = jnp.sum(state.w * u[state.idx], axis=-1)
    return Wu + noise * v


def ski_logdet_approx(state: SKIState, n: int, noise) -> jnp.ndarray:
    """Approximate log|W K_mm Wᵀ + σ²I| by scaling K_mm eigenvalues by n/m
    (reference ``StructuredKernelInterpolation.py:52-62``)."""
    m = state.K_mm.shape[0]
    eig = jnp.linalg.eigvalsh(add_diag(state.K_mm, 1e-12))
    scaled = jnp.maximum(eig * (n / m), 0.0)
    return jnp.sum(jnp.log(scaled + noise))


def toeplitz_matvec(first_col: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """T·v for symmetric Toeplitz T given its first column, via circulant
    embedding + FFT: O(m log m) instead of O(m²).

    On a 1-D equispaced inducing grid every stationary kernel's K_mm is
    Toeplitz (KISS-GP structure exploitation; the reference's SKI has no fast
    structure path). v: [m] or [m, r].
    """
    vec = v.ndim == 1
    if vec:
        v = v[:, None]
    m = first_col.shape[0]
    # circulant embedding of length 2m: [c0..c_{m-1}, 0, c_{m-1}..c1]
    c = jnp.concatenate(
        [first_col, jnp.zeros((1,), first_col.dtype), first_col[1:][::-1]]
    )
    fc = jnp.fft.rfft(c)
    vp = jnp.concatenate([v, jnp.zeros_like(v)], axis=0)
    out = jnp.fft.irfft(fc[:, None] * jnp.fft.rfft(vp, axis=0), n=2 * m, axis=0)
    out = out[:m].astype(v.dtype)
    return out[:, 0] if vec else out


def ski_matvec_toeplitz(idx, w, first_col, noise, v):
    """(W·T·Wᵀ + σ²I)·v with Toeplitz K_mm: O(n + m log m) per matvec."""
    m = first_col.shape[0]
    wt_v = jnp.zeros((m,), v.dtype).at[idx.reshape(-1)].add(
        (w * v[:, None]).reshape(-1)
    )
    u = toeplitz_matvec(first_col, wt_v)
    return jnp.sum(w * u[idx], axis=-1) + noise * v


def ski_mll_toeplitz(kernel, params, x, y, grid, noise, jitter: float,
                     cg_tol: float = 1e-6) -> jnp.ndarray:
    """SKI log marginal likelihood with the Toeplitz fast matvec (equispaced
    grid required) and circulant-eigenvalue log-det (scaled by n/m as in the
    reference's eigenvalue approximation)."""
    from gaussianprocessfundamentals_tpu.linalg.cg import cg_solve_implicit
    from gaussianprocessfundamentals_tpu.linalg.cholesky import LOG_2PI

    n = x.shape[0]
    m = grid.shape[0]
    idx, w = ski_interp(x, grid)
    first_col = kernel.gram(params, grid, grid[:1])[:, 0]  # [m]
    sigma2 = jnp.asarray(noise, x.dtype) + jitter
    alpha = cg_solve_implicit(
        lambda v: ski_matvec_toeplitz(idx, w, first_col, sigma2, v),
        y, tol=cg_tol, max_iters=4 * n,
    )
    # Toeplitz eigenvalues ≈ circulant embedding spectrum (first m entries)
    eig = jnp.sort(jnp.real(jnp.fft.rfft(jnp.concatenate(
        [first_col, jnp.zeros((1,), first_col.dtype), first_col[1:][::-1]]
    ))))[-m:]
    scaled = jnp.maximum(eig * (n / m), 0.0)
    logdet = jnp.sum(jnp.log(scaled + sigma2))
    return (
        -0.5 * jnp.sum(y * alpha) - 0.5 * logdet - 0.5 * n * LOG_2PI
    )


def ski_mll(kernel, params, x, y, grid, noise, jitter: float,
            cg_tol: float = 1e-6) -> jnp.ndarray:
    """SKI log marginal likelihood: CG solve against the structured matvec +
    the eigenvalue-scaled log-det (matches the reference's SKI strategy wiring,
    ``Metrics/Metrics.py:95-107``)."""
    from gaussianprocessfundamentals_tpu.linalg.cg import cg_solve_implicit
    from gaussianprocessfundamentals_tpu.linalg.cholesky import LOG_2PI

    n = x.shape[0]
    state = ski_factor(kernel, params, x, grid)
    sigma2 = jnp.asarray(noise, x.dtype) + jitter
    alpha = cg_solve_implicit(lambda v: ski_matvec(state, sigma2, v), y,
                              tol=cg_tol, max_iters=4 * n)
    return (
        -0.5 * jnp.sum(y * alpha)
        - 0.5 * ski_logdet_approx(state, n, sigma2)
        - 0.5 * n * LOG_2PI
    )
