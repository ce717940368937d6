"""Distributed block-cyclic Cholesky + triangular solves over a device mesh.

SURVEY.md §7 hard part #1: XLA has no multi-chip factorisation, so this is a
hand-built right-looking blocked Cholesky under ``shard_map``:

  * K is stored as block-rows of height B, distributed **cyclically** over the
    ``tp`` axis (block-row g lives on device g mod P) so every panel step
    keeps all devices busy (a contiguous split would idle device 0 after the
    first n/P rows are factored);
  * per panel step k: the diagonal block is psum-broadcast, every device
    factors it redundantly (B³/3 — negligible), computes its panel blocks
    L_ik = A_ik·L_kk⁻ᵀ with a batched triangular solve, all-gathers the panel
    (the only O(n·B) communication), and applies the trailing GEMM update
    A_ij −= L_ik·L_jkᵀ on its own rows — [B,n] MXU matmuls;
  * forward/backward block substitution reuse the same layout with one
    psum-broadcast B-vector per step.

Per-chip memory O(n²/P); per-step comm one [n,B] all-gather over ICI. The
compute-dominant trailing update is fully parallel; the factorisation's
critical path is nb = n/B sequential panel steps.

Communication-collectives are expressed with ``jax.lax`` primitives inside
``shard_map`` — XLA lowers them to ICI collectives on TPU; the same code runs
on the fake CPU mesh in tests (SURVEY.md §4.4).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, PartitionSpec

from gaussianprocessfundamentals_tpu.linalg.cholesky import LOG_2PI


def cyclic_permutation(nb: int, num_devices: int) -> np.ndarray:
    """perm[d·nb_local + j] = j·P + d: contiguous shard d receives the cyclic
    block-rows {g : g ≡ d (mod P)} in local order j = g // P."""
    assert nb % num_devices == 0, (nb, num_devices)
    nb_local = nb // num_devices
    return np.asarray(
        [j * num_devices + d for d in range(num_devices) for j in range(nb_local)]
    )


def to_cyclic_blocks(K: jnp.ndarray, block: int, num_devices: int) -> jnp.ndarray:
    """[n, n] → [nb, B, n] with block-rows permuted for cyclic sharding."""
    n = K.shape[0]
    nb = n // block
    A = K.reshape(nb, block, n)
    return A[cyclic_permutation(nb, num_devices)]


def from_cyclic_blocks(A: jnp.ndarray, num_devices: int) -> jnp.ndarray:
    nb, block, n = A.shape
    inv = np.argsort(cyclic_permutation(nb, num_devices))
    return A[inv].reshape(n, n)


def _local_global_rows(nb_local: int, num_devices: int, d):
    # local j ↦ global block-row j·P + d
    return jnp.arange(nb_local) * num_devices + d


def _block_cholesky_local(A_loc, *, nb, block, num_devices, axis):
    """shard_map body: A_loc [nb_local, B, n] (cyclic rows) → L_loc, logdet."""
    nb_local = nb // num_devices
    d = jax.lax.axis_index(axis)
    g = _local_global_rows(nb_local, num_devices, d)  # [nb_local]
    L_out = jnp.zeros_like(A_loc)

    def step(k, carry):
        A_loc, L_out = carry
        owner = k % num_devices
        local_idx = k // num_devices
        # diagonal block, psum-broadcast from its owner
        diag_cand = jax.lax.dynamic_slice(
            A_loc, (local_idx, 0, k * block), (1, block, block)
        )[0]
        diag = jax.lax.psum(
            jnp.where(d == owner, diag_cand, jnp.zeros_like(diag_cand)), axis
        )
        L_kk = jnp.linalg.cholesky(diag)
        # panel: L_ik = A_ik L_kk^{-T} for local rows i
        A_col = jax.lax.dynamic_slice(
            A_loc, (0, 0, k * block), (nb_local, block, block)
        )
        L_col = jax.vmap(
            lambda Ab: solve_triangular(L_kk, Ab.T, lower=True).T
        )(A_col)  # [nb_local, B, B]: L_ik = A_ik L_kk^{-T}
        below = (g > k)[:, None, None]
        on_diag = (g == k)[:, None, None]
        L_col = jnp.where(below, L_col, 0.0) + jnp.where(on_diag, L_kk, 0.0)
        L_out = jax.lax.dynamic_update_slice(L_out, L_col, (0, 0, k * block))
        # gather the full panel column (ordering: g = j·P + p)
        W = jax.lax.all_gather(L_col, axis)  # [P, nb_local, B, B]
        W = jnp.transpose(W, (1, 0, 2, 3)).reshape(nb, block, block)
        g_all = jnp.arange(nb)
        W_upd = jnp.where((g_all > k)[:, None, None], W, 0.0).reshape(
            nb * block, block
        )
        # trailing update on local rows: A_i: −= L_ik · W_updᵀ
        L_upd = jnp.where(below, L_col, 0.0)
        A_loc = A_loc - jnp.einsum(
            "jbc,nc->jbn", L_upd, W_upd,
            precision=jax.lax.Precision.HIGHEST,
        )
        return A_loc, L_out

    A_loc, L_out = jax.lax.fori_loop(0, nb, step, (A_loc, L_out))
    # log|K| = 2·Σ log diag(L): local rows contribute their diagonal blocks
    def diag_logs(j, acc):
        Lb = jax.lax.dynamic_slice(
            L_out, (j, 0, 0), (1, block, A_loc.shape[-1])
        )[0]
        col = g[j] * block
        Ld = jax.lax.dynamic_slice(Lb, (0, col), (block, block))
        return acc + jnp.sum(jnp.log(jnp.diagonal(Ld)))

    local_logdiag = jax.lax.fori_loop(
        0, nb_local, diag_logs, jnp.zeros((), A_loc.dtype)
    )
    logdet = 2.0 * jax.lax.psum(local_logdiag, axis)
    return L_out, logdet


def _forward_solve_local(L_loc, y, *, nb, block, num_devices, axis):
    """Solve L z = y (block forward substitution); y, z replicated [n]."""
    nb_local = nb // num_devices
    d = jax.lax.axis_index(axis)
    g = _local_global_rows(nb_local, num_devices, d)
    s_loc = jnp.zeros((nb_local, block), y.dtype)
    z = jnp.zeros_like(y)

    def step(k, carry):
        s_loc, z = carry
        owner = k % num_devices
        local_idx = k // num_devices
        L_kk_cand = jax.lax.dynamic_slice(
            L_loc, (local_idx, 0, k * block), (1, block, block)
        )[0]
        s_cand = jax.lax.dynamic_slice(s_loc, (local_idx, 0), (1, block))[0]
        mine = d == owner
        L_kk = jax.lax.psum(jnp.where(mine, L_kk_cand, 0.0), axis)
        s_k = jax.lax.psum(jnp.where(mine, s_cand, 0.0), axis)
        y_k = jax.lax.dynamic_slice(y, (k * block,), (block,))
        z_k = solve_triangular(L_kk, (y_k - s_k)[:, None], lower=True)[:, 0]
        z = jax.lax.dynamic_update_slice(z, z_k, (k * block,))
        # accumulate s_i += L_ik z_k for local rows i > k
        L_col = jax.lax.dynamic_slice(
            L_loc, (0, 0, k * block), (nb_local, block, block)
        )
        contrib = jnp.einsum("jbc,c->jb", L_col, z_k)
        s_loc = s_loc + jnp.where((g > k)[:, None], contrib, 0.0)
        return s_loc, z

    _, z = jax.lax.fori_loop(0, nb, step, (s_loc, z))
    return z


def _backward_solve_local(L_loc, zvec, *, nb, block, num_devices, axis):
    """Solve Lᵀ x = z; z, x replicated [n]."""
    nb_local = nb // num_devices
    d = jax.lax.axis_index(axis)
    g = _local_global_rows(nb_local, num_devices, d)
    x = jnp.zeros_like(zvec)

    def step(i, x):
        k = nb - 1 - i
        owner = k % num_devices
        local_idx = k // num_devices
        L_kk_cand = jax.lax.dynamic_slice(
            L_loc, (local_idx, 0, k * block), (1, block, block)
        )[0]
        L_kk = jax.lax.psum(jnp.where(d == owner, L_kk_cand, 0.0), axis)
        # t_k = Σ_{j>k} L_jkᵀ x_j, partial over local rows
        L_col = jax.lax.dynamic_slice(
            L_loc, (0, 0, k * block), (nb_local, block, block)
        )
        x_rows = jax.vmap(
            lambda gj: jax.lax.dynamic_slice(x, (gj * block,), (block,))
        )(g)
        t_part = jnp.einsum(
            "jbc,jb->c", jnp.where((g > k)[:, None, None], L_col, 0.0), x_rows
        )
        t_k = jax.lax.psum(t_part, axis)
        z_k = jax.lax.dynamic_slice(zvec, (k * block,), (block,))
        x_k = solve_triangular(
            L_kk, (z_k - t_k)[:, None], lower=True, trans=1
        )[:, 0]
        return jax.lax.dynamic_update_slice(x, x_k, (k * block,))

    return jax.lax.fori_loop(0, nb, step, x)


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "block")
)
def distributed_cholesky(
    K: jnp.ndarray, mesh: Mesh, axis: str = "tp", block: int = 256
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Block-cyclic Cholesky of K (replicated or row-sharded input).

    Returns (L_cyclic [nb, B, n] sharded over ``axis``, logdet). Use
    :func:`from_cyclic_blocks` to reassemble a dense L for inspection.
    """
    n = K.shape[0]
    P = mesh.shape[axis]
    assert n % block == 0 and (n // block) % P == 0, (n, block, P)
    nb = n // block
    A = to_cyclic_blocks(K, block, P)
    body = functools.partial(
        _block_cholesky_local, nb=nb, block=block, num_devices=P, axis=axis
    )
    L, logdet = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(PartitionSpec(axis, None, None),),
        out_specs=(PartitionSpec(axis, None, None), PartitionSpec()),
        check_vma=False,
    )(A)
    return L, logdet


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "block"))
def distributed_chol_solve(
    L_cyclic: jnp.ndarray, y: jnp.ndarray, mesh: Mesh, axis: str = "tp",
    block: int = 256,
) -> jnp.ndarray:
    """α = L⁻ᵀ L⁻¹ y given the cyclic factor (two block substitutions)."""
    nb = L_cyclic.shape[0]
    P = mesh.shape[axis]
    fwd = functools.partial(
        _forward_solve_local, nb=nb, block=block, num_devices=P, axis=axis
    )
    bwd = functools.partial(
        _backward_solve_local, nb=nb, block=block, num_devices=P, axis=axis
    )
    z = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(PartitionSpec(axis, None, None), PartitionSpec()),
        out_specs=PartitionSpec(),
        check_vma=False,
    )(L_cyclic, y)
    return jax.shard_map(
        bwd, mesh=mesh,
        in_specs=(PartitionSpec(axis, None, None), PartitionSpec()),
        out_specs=PartitionSpec(),
        check_vma=False,
    )(L_cyclic, z)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "block"))
def distributed_nll(
    K: jnp.ndarray, y: jnp.ndarray, noise, jitter, mesh: Mesh,
    axis: str = "tp", block: int = 256,
) -> jnp.ndarray:
    """Exact NLL with distributed factorisation: ½‖L⁻¹y‖² + Σlog diag L +
    (n/2)·log 2π. Only the forward substitution is needed for the data fit."""
    n = K.shape[0]
    Kn = K + (jnp.asarray(noise, K.dtype) + jitter) * jnp.eye(n, dtype=K.dtype)
    L, logdet = distributed_cholesky(Kn, mesh, axis, block)
    P = mesh.shape[axis]
    nb = n // block
    fwd = functools.partial(
        _forward_solve_local, nb=nb, block=block, num_devices=P, axis=axis
    )
    z = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(PartitionSpec(axis, None, None), PartitionSpec()),
        out_specs=PartitionSpec(),
        check_vma=False,
    )(L, y)
    return 0.5 * jnp.sum(z * z) + 0.5 * logdet + 0.5 * n * LOG_2PI
