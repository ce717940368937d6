"""Nyström low-rank approximation: Woodbury solves + determinant-lemma logdet.

Reference: ``main/gpbasics/Statistics/Nystroem_K.py:11-108`` —
K̂ = K_nm·K_mm⁺·K_nmᵀ (``:57-64``), Woodbury-style O(nm²) inverse of K̂+σ²I
(``:73-90``), and the matrix-determinant-lemma log-det
(n−m)·log σ² + logdet(σ²I_m + ΦΦᵀ) (``:92-108``). Inducing inputs are a free
argument (the reference gathers them from trainable *index* variables,
``Optimizer/Fitter.py:76-89``; here continuous inducing locations are
first-class and optimizable — the modern generalisation).

Everything is expressed via the m×m core factor so nothing n×n is ever
materialised; matmuls are [n,m]·[m,m] → MXU-shaped.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from gaussianprocessfundamentals_tpu.linalg.cholesky import (
    LOG_2PI,
    add_diag,
    effective_jitter,
)


class NystroemState(NamedTuple):
    K_nm: jnp.ndarray  # [n, m] cross-covariance
    L_mm: jnp.ndarray  # chol(K_mm + jitter I)
    A: jnp.ndarray  # K_nm @ L_mm⁻ᵀ  ("Φᵀ", [n, m])
    L_core: jnp.ndarray  # chol(σ²I_m + AᵀA)
    noise: jnp.ndarray


def nystroem_factor(
    kernel, params, x: jnp.ndarray, z: jnp.ndarray, noise, jitter: float
) -> NystroemState:
    """Factor the rank-m approximation defined by inducing inputs z [m, d]."""
    K_nm = kernel.gram(params, x, z)
    K_mm = kernel.gram(params, z, z)
    # dtype-aware jitter floor: optimised inducing locations drift close
    # together mid-fit, and an f32 K_mm then needs more than 1e-8 to factor.
    # DEVICE-SIDE ESCALATION (r4): fitted inducing points can land ~1e-7
    # apart (measured after a 300-step optimize_inducing fit at n=2000) —
    # K_mm then has duplicate columns and κ > 1/eps, so even a positive
    # jitter leaves the f32 Cholesky NaN. Try two more decades and take the
    # first finite factor (the jit-compatible analogue of fit()'s host-side
    # jitter escalation); 2 extra [m, m] factorizations are negligible.
    base = effective_jitter(K_mm, jitter)
    # PROBE factorizations on a stop_gradient'd copy pick the jitter level;
    # the factor that enters the computation is then ONE differentiable
    # Cholesky at that level. (Selecting between cholesky RESULTS with
    # jnp.where would rescue the forward but the VJP of where still runs
    # triangular solves against the NaN primal L — 0·NaN = NaN gradients,
    # poisoning exactly the optimize_inducing fit that collides the points.)
    K_sg = jax.lax.stop_gradient(K_mm)
    ok_a = jnp.all(jnp.isfinite(jnp.linalg.cholesky(add_diag(K_sg, base))))
    ok_b = jnp.all(
        jnp.isfinite(jnp.linalg.cholesky(add_diag(K_sg, 100.0 * base)))
    )
    jit_sel = jnp.where(ok_a, base, jnp.where(ok_b, 100.0 * base, 1e4 * base))
    L_mm = jnp.linalg.cholesky(add_diag(K_mm, jit_sel))
    # A = K_nm L_mm^{-T}: K̂ = A Aᵀ
    A = solve_triangular(L_mm, K_nm.T, lower=True).T
    noise = jnp.asarray(noise, x.dtype)
    core = add_diag(A.T @ A, 0.0) + noise * jnp.eye(z.shape[0], dtype=x.dtype)
    L_core = jnp.linalg.cholesky(core)
    return NystroemState(K_nm, L_mm, A, L_core, noise)


def woodbury_solve(state: NystroemState, b: jnp.ndarray) -> jnp.ndarray:
    """(K̂ + σ²I)⁻¹ b = b/σ² − A(σ²I + AᵀA)⁻¹Aᵀb / σ²
    (reference ``Nystroem_K.py:73-90``), b: [n] or [n, k]."""
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    Atb = state.A.T @ b
    w = solve_triangular(state.L_core, Atb, lower=True)
    w = solve_triangular(state.L_core, w, lower=True, trans=1)
    out = (b - state.A @ w) / state.noise
    return out[:, 0] if vec else out


def nystroem_logdet(state: NystroemState, n: int) -> jnp.ndarray:
    """log|K̂ + σ²I| = (n−m)·log σ² + log|σ²I_m + AᵀA|
    (reference matrix-determinant lemma, ``Nystroem_K.py:92-108``)."""
    m = state.L_core.shape[0]
    core_logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(state.L_core)))
    return (n - m) * jnp.log(state.noise) + core_logdet


def nystroem_mll(
    kernel, params, x, y, z, noise, jitter: float,
    titsias_correction: bool = False, diag_fn=None,
) -> jnp.ndarray:
    """Approximate log marginal likelihood under K̂ = K_nm K_mm⁻¹ K_nmᵀ.

    With ``titsias_correction`` this is the SKC/Titsias **lower bound**:
    ll − (1/2σ²)·tr(K − K̂) (reference ``Metrics/LogLikelihood.py:51-60``; the
    reference divides by the *jitter* because it treats jitter as σ² there —
    we use the actual noise, the Titsias.2009 form). tr(K) comes from
    ``kernel.diag`` so the bound costs O(nm²), never O(n²).
    """
    n = x.shape[0]
    state = nystroem_factor(kernel, params, x, z, noise, jitter)
    alpha = woodbury_solve(state, y)
    ll = (
        -0.5 * jnp.sum(y * alpha)
        - 0.5 * nystroem_logdet(state, n)
        - 0.5 * n * LOG_2PI
    )
    if titsias_correction:
        diag = diag_fn(params, x) if diag_fn is not None else kernel.diag(params, x)
        trace_K = jnp.sum(diag)
        trace_Khat = jnp.sum(state.A * state.A)
        ll = ll - (trace_K - trace_Khat) / (2.0 * state.noise)
    return ll


def nystroem_nll(kernel, params, x, y, z, noise, jitter, **kw) -> jnp.ndarray:
    return -nystroem_mll(kernel, params, x, y, z, noise, jitter, **kw)


def nystroem_posterior(
    kernel, params, x, y, z, x_test, noise, jitter: float
):
    """Posterior moments under the Nyström approximation (O(nm²)+O(tm²)).

    μ* = K_tm L_mm⁻ᵀ (σ²I + AᵀA)⁻¹ Aᵀ y  (projected-process predictive mean)
    var* = k_diag − diag(K_tm K_mm⁻¹ K_tmᵀ) + diag of the core quadratic form.
    """
    state = nystroem_factor(kernel, params, x, z, noise, jitter)
    K_tm = kernel.gram(params, x_test, z)
    B = solve_triangular(state.L_mm, K_tm.T, lower=True).T  # [t, m]
    Aty = state.A.T @ y
    w = solve_triangular(state.L_core, Aty, lower=True)
    w2 = solve_triangular(state.L_core, w, lower=True, trans=1)
    mu = B @ w2
    C = solve_triangular(state.L_core, B.T, lower=True)  # [m, t]
    k_diag = kernel.diag(params, x_test)
    var = k_diag - jnp.sum(B * B, axis=-1) + state.noise * jnp.sum(C * C, axis=0)
    return mu, jnp.maximum(var, 0.0)
