"""Random Fourier features + pathwise (Matheron) posterior sampling.

No reference counterpart (the reference samples via dense chol·N(0,I),
``Statistics/GaussianProcess.py:87-110`` — O(n³) and O(t³) per draw). The
TPU-native large-scale path (Wilson et al. 2020, "Efficiently sampling
functions from Gaussian process posteriors"):

  * stationary prior ≈ φ(x)ᵀw with D random features (Bochner: SE spectral
    density is Gaussian, Matérn-ν is multivariate-t with 2ν dof) — prior
    draws at ANY set of points cost O(D·t), matmul-shaped;
  * posterior draw = prior draw + K_s(·)ᵀ Kₙ⁻¹ (y − f_prior(X) − ε), one
    batched CG solve for any number of sample paths.

Feature maps are f32 matmul + cos — pure MXU/VPU work.
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import jax.random as jr

from gaussianprocessfundamentals_tpu.kernels.leaves import (
    Matern32Kernel,
    Matern52Kernel,
    SquaredExponentialKernel,
)


class RFFState(NamedTuple):
    omega: jnp.ndarray  # [D, d] spectral frequencies
    phase: jnp.ndarray  # [D]
    scale: jnp.ndarray  # sqrt(2·variance/D)


def rff_init(kernel, params: Any, dim: int, num_features: int, key) -> RFFState:
    """Draw spectral frequencies for SE / Matérn-3/2 / Matérn-5/2 kernels."""
    k_om, k_ph, k_g = jr.split(key, 3)
    ls = params["lengthscale"]
    if isinstance(kernel, SquaredExponentialKernel):
        omega = jr.normal(k_om, (num_features, dim)) / ls
    elif isinstance(kernel, (Matern32Kernel, Matern52Kernel)):
        # Matérn-ν spectral density = multivariate-t with 2ν dof:
        # ω = N(0, I)/ℓ · sqrt(2ν / χ²_{2ν})
        nu = 1.5 if isinstance(kernel, Matern32Kernel) else 2.5
        g = jr.gamma(k_g, nu, (num_features, 1)) * 2.0
        omega = jr.normal(k_om, (num_features, dim)) / ls * jnp.sqrt(2 * nu / g)
    else:
        raise NotImplementedError(
            f"RFF supports SE/Matérn kernels, got {type(kernel).__name__}"
        )
    phase = jr.uniform(k_ph, (num_features,), maxval=2 * math.pi)
    variance = params.get("variance", jnp.asarray(1.0, omega.dtype))
    scale = jnp.sqrt(2.0 * variance / num_features)
    return RFFState(omega.astype(ls.dtype), phase.astype(ls.dtype), scale)


def rff_features(state: RFFState, x: jnp.ndarray) -> jnp.ndarray:
    """φ(x): [n, D]; k(x,x') ≈ φ(x)ᵀφ(x')."""
    proj = jnp.matmul(
        x, state.omega.T, precision=jax.lax.Precision.HIGHEST
    )  # [n, D]
    return state.scale * jnp.cos(proj + state.phase)


def rff_prior_sample(state: RFFState, x: jnp.ndarray, key, num_samples: int = 1):
    """f(x) ≈ φ(x)·w, w ~ N(0, I_D): [num_samples, n]."""
    w = jr.normal(key, (state.omega.shape[0], num_samples), x.dtype)
    return (rff_features(state, x) @ w).T


def pathwise_posterior_samples(
    kernel, params: Any, x, y, x_test, noise, key,
    num_samples: int = 8, num_features: int = 1024,
    max_iters: int = 200, tol: float = 1e-8, jitter: float = 1e-8,
):
    """Matheron-rule posterior function draws at x_test: [num_samples, t].

    One RFF prior draw over [X, X*] + one batched CG solve against
    (K + σ²I) per batch of samples — no Cholesky of the t×t test covariance
    (fixes the reference's O(t³) posterior sampling).
    """
    from gaussianprocessfundamentals_tpu.linalg.mbcg import mbcg

    k_rff, k_eps = jr.split(key)
    d = x.shape[-1]
    state = rff_init(kernel, params, d, num_features, k_rff)
    x_all = jnp.concatenate([x, x_test], axis=0)
    f_prior = rff_prior_sample(state, x_all, jr.fold_in(key, 1), num_samples)
    f_X, f_T = f_prior[:, : x.shape[0]], f_prior[:, x.shape[0]:]

    noise = jnp.asarray(noise, x.dtype)
    eps = jnp.sqrt(noise) * jr.normal(k_eps, (num_samples, x.shape[0]), x.dtype)
    resid = y[None, :] - f_X - eps  # [s, n]

    K = kernel.gram(params, x, x)
    matvec = lambda V: jnp.matmul(
        K, V, precision=jax.lax.Precision.HIGHEST
    ) + (noise + jitter) * V
    sol = mbcg(matvec, resid.T, max_iters=max_iters, tol=tol).solves  # [n, s]
    K_s = kernel.gram(params, x, x_test)  # [n, t]
    update = jnp.matmul(
        K_s.T, sol, precision=jax.lax.Precision.HIGHEST
    ).T  # [s, t]
    return f_T + update
