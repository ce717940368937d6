"""Linear conjugate-gradient solver (matrix-free).

Reference: ``main/gpbasics/Auxiliary/LinearConjugateGradients.py:9-41`` —
textbook CG with tolerance 1e-2 on the max residual, an iteration cap of n,
and a NaN bail-out. This version is matvec-operator-based so the same solver
runs dense single-chip, Nystroem O(nm), and row-sharded distributed (the
matvec closes over a pjit-sharded matrix and XLA inserts the psum).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def cg_solve(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-2,
    max_iters: Optional[int] = None,
    precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Solve A x = b for SPD A given only ``matvec``; b: [n] (single RHS —
    for batched right-hand sides use :func:`..mbcg.mbcg`).

    Convergence test is ``max|r| < tol`` to match the reference
    (``LinearConjugateGradients.py:17-20``); NaN in the residual terminates
    with the last finite iterate (reference ``:21-24``).
    """
    assert b.ndim == 1, "cg_solve is single-RHS; use linalg.mbcg for batches"
    n = b.shape[-1]
    max_iters = n if max_iters is None else max_iters
    M = precond if precond is not None else (lambda v: v)

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = M(r)
    p = z
    rz = jnp.sum(r * z, axis=-1)

    def cond(carry):
        _, r, _, _, i, ok = carry
        return jnp.logical_and(
            i < max_iters, jnp.logical_and(ok, jnp.max(jnp.abs(r)) >= tol)
        )

    def body(carry):
        x, r, p, rz, i, _ = carry
        Ap = matvec(p)
        denom = jnp.sum(p * Ap, axis=-1)
        a = rz / jnp.where(denom == 0, 1.0, denom)
        x_new = x + a * p
        r_new = r - a * Ap
        z_new = M(r_new)
        rz_new = jnp.sum(r_new * z_new, axis=-1)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p_new = z_new + beta * p
        ok = jnp.logical_not(jnp.any(jnp.isnan(r_new)))
        x_keep = jnp.where(ok, x_new, x)
        return x_keep, r_new, p_new, rz_new, i + 1, ok

    x, *_ = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.asarray(0), jnp.asarray(True)))
    return x


def cg_solve_dense(A: jnp.ndarray, b: jnp.ndarray, **kw) -> jnp.ndarray:
    return cg_solve(partial(jnp.matmul, A), b, **kw)


def cg_solve_implicit(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    tol: float = 1e-2,
    max_iters: Optional[int] = None,
    precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Reverse-differentiable CG solve via ``lax.custom_linear_solve``.

    The forward pass is :func:`cg_solve` (early-exit while_loop — not
    reverse-differentiable itself); gradients come from the implicit function
    theorem: the VJP solves the same SPD system with the same solver
    (``symmetric=True``) instead of unrolling iterations. This is what makes
    CG-based objectives (SKI MLL) usable inside ``fit()``.
    """
    return jax.lax.custom_linear_solve(
        matvec,
        b,
        solve=lambda mv, rhs: cg_solve(
            mv, rhs, tol=tol, max_iters=max_iters, precond=precond
        ),
        symmetric=True,
    )
