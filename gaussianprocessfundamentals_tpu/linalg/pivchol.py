"""Partial (rank-k) pivoted Cholesky of a kernel Gram matrix, matrix-free.

The preconditioner factor for the iterative exact-GP path: P = σ²I + LLᵀ with
L the rank-k pivoted-Cholesky factor of K (GPyTorch/BBMM, Gardner et al. 2018
§"preconditioning"; PAPERS.md). Chosen over shifted column-Nyström after the
r3 measurement campaign: inverting K_mm + εI in f32 is numerically unsound at
n/m ≳ 100 — the ε-shift bias made the "preconditioned" system HARDER than the
unpreconditioned one (first-step preconditioned residual 8–20× ‖b‖ at
n=30–50k, stalling PCG at ~0.7 relative residual, vs 0.1 with no
preconditioner at all). Pivoted Cholesky needs no shift and no inverse: it is
greedy-optimal on the remaining diagonal, each iteration touches one kernel
column built on the fly from x (O(n·d) memory, never K), and the factor
enters the solver only as L·(·) products.

Reference counterpart: none — the reference's LINEAR_CONJUGATE_GRADIENT
strategy (``Metrics/MatrixHandlingTypes.py:33``) runs unpreconditioned.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("kernel", "k"))
def partial_pivoted_cholesky(
    kernel, params: Any, x: jnp.ndarray, k: int
) -> jnp.ndarray:
    """Rank-``k`` pivoted Cholesky factor L [n, k] with LLᵀ ≈ K(x, x).

    Standard greedy algorithm (Harbrecht et al. 2012): pivot on the largest
    remaining diagonal entry, build that kernel column on the fly, subtract
    the already-accumulated factor's contribution, normalise. Runs as a
    ``lax.scan`` of k steps; each step is one [n, k]·[k] contraction plus one
    O(n·d) kernel-column evaluation — jit-static shapes throughout (L is
    preallocated [n, k]; not-yet-written columns are zero and contribute
    nothing). Numerically shift-free: exact for rank-deficient PSD K, and a
    pivot that has decayed to ≤ 0 (f32 round-off) freezes the remaining
    columns at zero instead of dividing by garbage.
    """
    n = x.shape[0]
    d0 = kernel.diag(params, x)  # [n]
    hp = jax.lax.Precision.HIGHEST
    # relative pivot floor: once the residual diagonal decays to round-off
    # (~100·eps of the largest initial pivot), further "pivots" are f32 noise
    # — dividing by √noise explodes the factor (measured r3 at n=50k: the
    # factor blew up, pAp overflowed, and PCG froze at the zero iterate).
    # Freeze remaining columns at zero instead; LLᵀ then simply stops at the
    # achieved numerical rank.
    floor = 100.0 * jnp.finfo(x.dtype).eps * jnp.max(d0)

    def step(carry, i):
        L, diag = carry
        p = jnp.argmax(diag)
        xp = jax.lax.dynamic_slice_in_dim(x, p, 1, axis=0)  # [1, d]
        col = kernel.gram(params, x, xp)[:, 0]  # [n]
        Lp = jax.lax.dynamic_slice_in_dim(L, p, 1, axis=0)[0]  # [k]
        col = col - jnp.matmul(L, Lp, precision=hp)
        piv = diag[p]
        ok = piv > floor
        inv_sqrt = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, piv, 1.0)), 0.0)
        l_i = col * inv_sqrt
        # exact zero at the pivot row's residual: enforce to stop drift
        l_i = l_i.at[p].set(jnp.where(ok, jnp.sqrt(jnp.where(ok, piv, 1.0)), 0.0))
        L = L.at[:, i].set(l_i)
        diag = jnp.maximum(diag - l_i * l_i, 0.0)
        diag = diag.at[p].set(0.0)
        return (L, diag), piv

    L0 = jnp.zeros((n, k), x.dtype)
    (L, _), pivots = jax.lax.scan(step, (L0, d0), jnp.arange(k))
    return L
