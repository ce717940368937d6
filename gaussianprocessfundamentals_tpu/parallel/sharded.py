"""Sharded covariance algebra: row-sharded Gram panels, distributed matvec/CG,
and the sharded NLL training step.

Design (SURVEY.md §5.7): shard x's rows over the ``tp`` mesh axis. Each chip
builds its n/p × n Gram panel — the small [n, d] x is replicated (it is tiny
next to K), so panel construction needs no communication; the O(n²) K never
lives on one chip. Downstream:

  * matvec (K @ v): panel-local matmul + XLA-inserted collective → CG solves
    scale with row-sharded K;
  * the Cholesky path currently gathers K (XLA has no distributed
    factorisation); the block-cyclic shard_map Cholesky replaces it at scale
    (``parallel.block_cholesky``).

These functions are written to be called *inside* jit with a mesh in scope —
sharding is expressed with ``with_sharding_constraint``.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.lax import with_sharding_constraint
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussianprocessfundamentals_tpu.linalg import cholesky as chol
from gaussianprocessfundamentals_tpu.linalg.cg import cg_solve


def sharded_gram(kernel, params, x: jnp.ndarray, mesh: Mesh, axis: str = "tp"):
    """Row-sharded K: [n, n] with rows split over ``axis``."""
    x_rows = with_sharding_constraint(x, NamedSharding(mesh, P(axis, None)))
    x_rep = with_sharding_constraint(x, NamedSharding(mesh, P(None, None)))
    K = kernel.gram(params, x_rows, x_rep)
    return with_sharding_constraint(K, NamedSharding(mesh, P(axis, None)))


def sharded_matvec(K_rowsharded: jnp.ndarray, v: jnp.ndarray, mesh: Mesh,
                   axis: str = "tp") -> jnp.ndarray:
    """(K @ v) with K row-sharded and v replicated → row-sharded result.
    XLA turns the panel matmul + result layout into the right collective."""
    out = K_rowsharded @ v
    return with_sharding_constraint(out, NamedSharding(mesh, P(axis)))


def sharded_nll(
    kernel, params, x, y, noise, jitter: float, mesh: Mesh, axis: str = "tp"
) -> jnp.ndarray:
    """Exact NLL with a row-sharded Gram build.

    The Gram construction (the O(n²·leaves) part) is fully sharded; the
    Cholesky is gathered onto the mesh as a replicated computation until the
    block-cyclic factorisation lands. Gradients flow through the sharded
    build, so the backward Gram work is sharded too.
    """
    K = sharded_gram(kernel, params, x, mesh, axis)
    K = with_sharding_constraint(K, NamedSharding(mesh, P(None, None)))
    return chol.nll(K, y, noise, jitter)


def sharded_cg_solve(
    kernel, params, x, b, noise, jitter: float, mesh: Mesh, axis: str = "tp",
    tol: float = 1e-6, max_iters: Optional[int] = None,
) -> jnp.ndarray:
    """Matrix-free CG solve of (K + σ²I)v = b with the row-sharded panel.
    Memory per chip: O(n²/p); per-iteration comm: one all-gather of a vector.
    """
    K = sharded_gram(kernel, params, x, mesh, axis)
    sigma2 = jnp.asarray(noise, x.dtype) + jitter

    def matvec(v):
        out = K @ v + sigma2 * v
        return with_sharding_constraint(out, NamedSharding(mesh, P(None)))

    return cg_solve(matvec, b, tol=tol, max_iters=max_iters)


def restart_sharded_fit_step(
    nll_fn: Callable, uparams_batched, opt_update: Callable, opt_state,
    mesh: Mesh,
):
    """One optimizer step over a batch of restarts, restarts sharded on "dp".

    ``uparams_batched`` leaves have a leading restart axis; the vmapped
    value-and-grad runs each restart on its own dp-slice of the mesh.
    """
    dp = NamedSharding(mesh, P("dp"))
    uparams_batched = jax.tree_util.tree_map(
        lambda l: with_sharding_constraint(l, NamedSharding(mesh, P(*(("dp",) + (None,) * (l.ndim - 1))))),
        uparams_batched,
    )
    losses, grads = jax.vmap(jax.value_and_grad(nll_fn))(uparams_batched)
    updates, opt_state = opt_update(grads, opt_state, uparams_batched)
    import optax

    new_params = optax.apply_updates(uparams_batched, updates)
    return new_params, opt_state, with_sharding_constraint(losses, dp)
