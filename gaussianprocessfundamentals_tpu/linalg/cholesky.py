"""Cholesky-based GP linear algebra: log marginal likelihood + posterior.

Replaces the reference's ``CovarianceMatrix`` cache hierarchy
(``main/gpbasics/Statistics/CovarianceMatrix.py:21-286``) and
``AuxiliaryGpProperties`` (``Statistics/Auxiliary.py:14-107``). Under jit the
memoize/reset machinery is unnecessary — XLA CSEs repeated subexpressions — so
these are plain pure functions. Two reference defects are fixed by design:

  * posterior variance uses a triangular **solve**, not an explicit
    ``tf.linalg.inv`` (reference ``CovarianceMatrix.py:267-275``);
  * α is computed by two triangular solves (reference does this right,
    ``CovarianceMatrix.py:256-265``) and never via ``inv(K)``.

All functions support leading batch dimensions (the reference's
"instance-stacked" batched GPs). ``y`` is a vector ``[..., n]``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

LOG_2PI = 1.8378770664093453


def add_diag(K: jnp.ndarray, v) -> jnp.ndarray:
    """K + v·I along the trailing square dims (v scalar or [..., n])."""
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    v = jnp.asarray(v, K.dtype)
    return K + v[..., None, None] * eye if v.ndim else K + v * eye


def effective_jitter(K: jnp.ndarray, jitter, eps_factor: float = 100.0) -> jnp.ndarray:
    """Dtype-aware jitter floor: max(jitter, eps_factor·eps·mean diag(K)).

    The reference's fixed 1e-8 (``global_parameters.py:45``) assumes f64. An
    f32 Gram matrix carries O(eps·‖K‖) rounding asymmetry (measured: SE K_mm
    at m=64 has min eig ≈ −8e-7), so 1e-8 underflows and the Cholesky NaNs.
    In f64 the floor (~2e-14·diag) sits below 1e-8, leaving reference
    semantics untouched. Paths whose matrices drift toward singularity by
    design (SVGP inducing points colliding mid-optimisation) pass a larger
    ``eps_factor``."""
    eps = jnp.finfo(K.dtype).eps
    mean_diag = jnp.mean(jnp.diagonal(K, axis1=-2, axis2=-1), axis=-1)
    floor = jax.lax.stop_gradient(eps_factor * eps * mean_diag)
    return jnp.maximum(jnp.asarray(jitter, K.dtype), floor.astype(K.dtype))


def noised(K: jnp.ndarray, noise, jitter: float) -> jnp.ndarray:
    """K + (σ² + jitter)·I — reference adds σ²·I (``CovarianceMatrix.py:197-206``)
    with jitter 1e-8 on every diagonal (``global_parameters.py:45``; here the
    jitter gets a dtype-aware floor, :func:`effective_jitter`)."""
    return add_diag(K, jnp.asarray(noise, K.dtype) + effective_jitter(K, jitter))


class CholState(NamedTuple):
    """Everything downstream of one factorisation (the reference caches these
    as named matrices K/L_K/L_alpha on ``CovarianceMatrix``)."""

    L: jnp.ndarray  # lower Cholesky factor of K + (σ²+jitter)I
    alpha: jnp.ndarray  # (K+σ²I)⁻¹ y, via two triangular solves
    logdet: jnp.ndarray  # log|K+σ²I| = 2·Σ log diag L


def factor(K: jnp.ndarray, y: jnp.ndarray, noise, jitter: float) -> CholState:
    L = jnp.linalg.cholesky(noised(K, noise, jitter))
    z = solve_triangular(L, y[..., None], lower=True)
    alpha = solve_triangular(L, z, lower=True, trans=1)[..., 0]
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return CholState(L, alpha, logdet)


def mll_from_state(state: CholState, y: jnp.ndarray) -> jnp.ndarray:
    """Log marginal likelihood −½yᵀα − ½log|K| − (n/2)·log 2π
    (decomposition as in reference ``Metrics/LogLikelihood.py:37-49``)."""
    n = y.shape[-1]
    data_fit = -0.5 * jnp.sum(y * state.alpha, axis=-1)
    complexity = -0.5 * state.logdet
    norm = -0.5 * n * LOG_2PI
    return data_fit + complexity + norm


@jax.custom_vjp
def _mll_core(Kn: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """MLL of N(y | 0, Kn) with a closed-form VJP.

    XLA's generic Cholesky backward costs ~4× the forward factorisation
    (measured 230 ms vs 50 ms at n=10k f32 on v5e, BENCHMARKS.md); the GP MLL
    gradient has the classical closed form
        ∂mll/∂Kn = ½(ααᵀ − Kn⁻¹),   ∂mll/∂y = −α,
    which needs only ONE extra triangular solve (L⁻¹ with n RHS — blocked MXU
    work) and one symmetric matmul. Supports leading batch dims.
    """
    L = jnp.linalg.cholesky(Kn)
    z = solve_triangular(L, y[..., None], lower=True)
    alpha = solve_triangular(L, z, lower=True, trans=1)[..., 0]
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    n = y.shape[-1]
    return -0.5 * jnp.sum(y * alpha, axis=-1) - 0.5 * logdet - 0.5 * n * LOG_2PI


def _mll_core_fwd(Kn, y):
    L = jnp.linalg.cholesky(Kn)
    z = solve_triangular(L, y[..., None], lower=True)
    alpha = solve_triangular(L, z, lower=True, trans=1)[..., 0]
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    n = y.shape[-1]
    out = -0.5 * jnp.sum(y * alpha, axis=-1) - 0.5 * logdet - 0.5 * n * LOG_2PI
    return out, (L, alpha)


def _tri_inv(L: jnp.ndarray, col_block: int = 2048) -> jnp.ndarray:
    """L⁻¹ for lower-triangular L (leading batch dims allowed).

    A single ``solve_triangular(L, I)`` with n right-hand sides makes XLA:TPU
    materialise dozens of [n, n] temps (measured 15.8 GB at n=10k — OOM on a
    16 GB chip), so the identity RHS is split into column blocks under
    ``lax.map``, which reuses one block's buffers across iterations. Same
    FLOPs, O(n·col_block) live temps.
    """
    n = L.shape[-1]
    if n <= col_block:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
        return solve_triangular(L, eye, lower=True)
    nb = -(-n // col_block)  # ceil; the last block is zero-padded RHS columns
    cols = jnp.arange(nb * col_block).reshape(nb, col_block)

    def chunk(c):
        e = (jnp.arange(n)[:, None] == c[None, :]).astype(L.dtype)  # [n, b]
        e = jnp.broadcast_to(e, L.shape[:-2] + e.shape)
        return solve_triangular(L, e, lower=True)  # [..., n, b]

    blocks = jax.lax.map(chunk, cols)  # [nb, ..., n, b]
    blocks = jnp.moveaxis(blocks, 0, -2)  # [..., n, nb, b]
    out = blocks.reshape(*L.shape[:-1], nb * col_block)
    return out[..., :n]


def _mll_core_bwd(res, g):
    L, alpha = res
    hp = jax.lax.Precision.HIGHEST
    Linv = _tri_inv(L)
    Kn_inv = jnp.matmul(jnp.swapaxes(Linv, -1, -2), Linv, precision=hp)
    aa = alpha[..., :, None] * alpha[..., None, :]
    dKn = 0.5 * (aa - Kn_inv) * g[..., None, None]
    dy = -alpha * g[..., None]
    return dKn, dy


_mll_core.defvjp(_mll_core_fwd, _mll_core_bwd)


def mll(K: jnp.ndarray, y: jnp.ndarray, noise, jitter: float) -> jnp.ndarray:
    return _mll_core(noised(K, noise, jitter), y)


def nll(K: jnp.ndarray, y: jnp.ndarray, noise, jitter: float) -> jnp.ndarray:
    """Negative log marginal likelihood — the reference's minimisation form
    (``LogLikelihood.py:65`` returns ``-log_likelihood``)."""
    return -mll(K, y, noise, jitter)


def posterior_mean(state: CholState, K_s: jnp.ndarray) -> jnp.ndarray:
    """μ* = K_sᵀ α (reference ``Statistics/Auxiliary.py:68-81``);
    K_s: [..., n_train, n_test] → [..., n_test]."""
    return jnp.einsum("...nt,...n->...t", K_s, state.alpha)


def posterior_cov(
    state: CholState, K_s: jnp.ndarray, K_ss: jnp.ndarray, jitter: float = 0.0
) -> jnp.ndarray:
    """Σ* = K_ss − vᵀv with v = L⁻¹K_s (reference ``Auxiliary.py:57-93``,
    explicit-inverse defect fixed)."""
    v = solve_triangular(state.L, K_s, lower=True)
    cov = K_ss - jnp.einsum("...nt,...ns->...ts", v, v)
    return add_diag(cov, jitter) if jitter else cov


def posterior_var(state: CholState, K_s: jnp.ndarray, K_ss_diag: jnp.ndarray) -> jnp.ndarray:
    """Marginal posterior variances without forming the full test covariance."""
    v = solve_triangular(state.L, K_s, lower=True)
    return K_ss_diag - jnp.sum(v * v, axis=-2)
