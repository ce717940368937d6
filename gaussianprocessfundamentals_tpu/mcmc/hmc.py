"""Hamiltonian Monte Carlo over GP hyperparameters.

The reference has **no** MCMC machinery (SURVEY.md §0); this is a TPU-native
capability addition per BASELINE config 3 ("Matérn-5/2 GP with NUTS over
kernel hyperparameters, chains sharded per chip"). Design:

  * the target is the unconstrained-space log posterior
    log p(y|θ) + log p(θ) + log|Jacobian| (log-reparam of positives adds the
    sum of log-params as the Jacobian term);
  * leapfrog + Metropolis accept under ``lax.scan`` — one compiled program
    for the whole chain;
  * warmup uses Nesterov dual averaging on the step size targeting 0.8
    acceptance;
  * chains are a ``vmap`` axis; on a mesh this axis shards across chips, and
    cross-chain step-size adaptation averages the acceptance statistic with
    ``jax.lax.pmean`` when run under ``shard_map`` (see ``parallel.meshes``).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import jax.random as jr


class HMCResult(NamedTuple):
    samples: Any  # pytree with leading [num_samples, ...] axis (unconstrained)
    accept_prob: jnp.ndarray  # [num_samples]
    step_size: jnp.ndarray  # final adapted step size
    log_probs: jnp.ndarray  # [num_samples]


def _flat_normal_like(key, tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jr.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [jr.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    )


def _dot(a, b):
    return sum(
        jnp.sum(x * y)
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def _axpy(a, x, y):  # y + a*x
    return jax.tree_util.tree_map(lambda xi, yi: yi + a * xi, x, y)


def leapfrog(logprob_grad: Callable, q, p, step_size, num_steps: int):
    """Standard leapfrog integrator over a pytree state."""

    def body(_, carry):
        q, p, g = carry
        p_half = _axpy(0.5 * step_size, g, p)
        q_new = _axpy(step_size, p_half, q)
        _, g_new = logprob_grad(q_new)
        p_new = _axpy(0.5 * step_size, g_new, p_half)
        return q_new, p_new, g_new

    _, g0 = logprob_grad(q)
    q, p, _ = jax.lax.fori_loop(0, num_steps, body, (q, p, g0))
    return q, p


def hmc(
    logprob_fn: Callable,
    q0: Any,
    key,
    num_samples: int = 500,
    num_warmup: int = 200,
    num_leapfrog: int = 16,
    init_step_size: float = 0.1,
    target_accept: float = 0.8,
    adapt_pmean_axis: str = None,
) -> HMCResult:
    """Single-chain HMC; vmap over (q0, key) for multiple chains.

    ``adapt_pmean_axis``: inside ``shard_map`` over a chain axis, pass its
    name to average the warmup acceptance statistic across chains with
    ``lax.pmean`` — all chains then share one adapted step size (the
    collective step-size adaptation of SURVEY.md §5.8)."""
    logprob_grad = jax.value_and_grad(logprob_fn)

    def kernel(state, key, step_size):
        q, lp = state
        key_mom, key_acc = jr.split(key)
        p = _flat_normal_like(key_mom, q)
        q_new, p_new = leapfrog(logprob_grad, q, p, step_size, num_leapfrog)
        lp_new, _ = logprob_grad(q_new)
        ke_old, ke_new = 0.5 * _dot(p, p), 0.5 * _dot(p_new, p_new)
        log_accept = (lp_new - ke_new) - (lp - ke_old)
        log_accept = jnp.where(jnp.isnan(log_accept), -jnp.inf, log_accept)
        accept_prob = jnp.minimum(1.0, jnp.exp(log_accept))
        accept = jr.uniform(key_acc, ()) < accept_prob
        q_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), q_new, q
        )
        lp_out = jnp.where(accept, lp_new, lp)
        return (q_out, lp_out), accept_prob

    # --- warmup with dual averaging (Hoffman & Gelman 2014, Algorithm 5) ---
    mu = jnp.log(10.0 * init_step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def warmup_step(carry, key):
        state, log_eps, log_eps_bar, h_bar, t = carry
        step_size = jnp.exp(log_eps)
        state, accept_prob = kernel(state, key, step_size)
        if adapt_pmean_axis is not None:
            accept_prob = jax.lax.pmean(accept_prob, adapt_pmean_axis)
        t = t + 1.0
        eta = 1.0 / (t + t0)
        h_bar = (1.0 - eta) * h_bar + eta * (target_accept - accept_prob)
        log_eps = mu - jnp.sqrt(t) / gamma * h_bar
        w = t ** (-kappa)
        log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
        return (state, log_eps, log_eps_bar, h_bar, t), None

    lp0 = logprob_fn(q0)
    init = ((q0, lp0), jnp.log(init_step_size), jnp.log(init_step_size), 0.0, 0.0)
    keys_w = jr.split(jr.fold_in(key, 0), num_warmup)
    (state, _, log_eps_bar, _, _), _ = jax.lax.scan(warmup_step, init, keys_w)
    step_size = jnp.exp(log_eps_bar)

    # --- sampling ---
    def sample_step(state, key):
        state, accept_prob = kernel(state, key, step_size)
        return state, (state[0], accept_prob, state[1])

    keys_s = jr.split(jr.fold_in(key, 1), num_samples)
    _, (samples, accept_probs, lps) = jax.lax.scan(sample_step, state, keys_s)
    return HMCResult(samples, accept_probs, step_size, lps)


@partial(jax.jit, static_argnames=(
    "logprob_fn", "num_samples", "num_warmup", "num_leapfrog"))
def hmc_chains(
    logprob_fn: Callable,
    q0s: Any,  # pytree with leading chain axis
    keys: jnp.ndarray,  # [num_chains] PRNG keys
    num_samples: int = 500,
    num_warmup: int = 200,
    num_leapfrog: int = 16,
    init_step_size: float = 0.1,
) -> HMCResult:
    """Vmapped independent chains. Under pjit with chain-sharded ``q0s``/
    ``keys`` the chains run one-per-chip (reference's per-chip-chains design,
    SURVEY.md §5.8)."""
    return jax.vmap(
        lambda q0, key: hmc(
            logprob_fn, q0, key, num_samples, num_warmup, num_leapfrog,
            init_step_size,
        )
    )(q0s, keys)


def hmc_chains_collective(
    logprob_fn: Callable,
    q0s: Any,
    keys: jnp.ndarray,
    mesh,
    axis: str = "dp",
    num_samples: int = 500,
    num_warmup: int = 200,
    num_leapfrog: int = 16,
    init_step_size: float = 0.1,
) -> HMCResult:
    """Chains sharded one-per-device under ``shard_map``, with the warmup
    acceptance statistic psum-averaged across chains so every chain shares a
    single collectively adapted step size (SURVEY.md §5.8). Requires
    num_chains == mesh.shape[axis]."""
    from jax.sharding import PartitionSpec

    P = mesh.shape[axis]
    chains = keys.shape[0]
    assert chains == P, (chains, P)

    def per_device(q0, key):
        q0 = jax.tree_util.tree_map(lambda l: l[0], q0)
        res = hmc(
            logprob_fn, q0, key[0], num_samples, num_warmup, num_leapfrog,
            init_step_size, adapt_pmean_axis=axis,
        )
        return jax.tree_util.tree_map(lambda l: l[None], res)

    spec_q = jax.tree_util.tree_map(
        lambda l: PartitionSpec(axis, *([None] * (l.ndim - 1))), q0s
    )
    out = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(spec_q, PartitionSpec(axis)),
        out_specs=PartitionSpec(axis),
        check_vma=False,
    )(q0s, keys)
    return out


# --- diagnostics -----------------------------------------------------------

def potential_scale_reduction(x: jnp.ndarray) -> jnp.ndarray:
    """Split-R̂ over [chains, samples] scalar traces (Gelman-Rubin)."""
    c, s = x.shape
    half = s // 2
    x = jnp.stack([x[:, :half], x[:, half : 2 * half]]).reshape(2 * c, half)
    chain_means = x.mean(axis=1)
    chain_vars = x.var(axis=1, ddof=1)
    w = chain_vars.mean()
    b = half * chain_means.var(ddof=1)
    var_est = (half - 1) / half * w + b / half
    return jnp.sqrt(var_est / w)


def effective_sample_size(x: jnp.ndarray, max_lag: int = 100) -> jnp.ndarray:
    """Crude ESS from summed autocorrelations over [chains, samples]."""
    c, s = x.shape
    xc = x - x.mean(axis=1, keepdims=True)
    var = (xc * xc).mean()
    max_lag = min(max_lag, s - 1)
    # static python loop: lags must be static for slicing
    rhos = jnp.stack(
        [jnp.mean(xc[:, : s - lag] * xc[:, lag:]) / var for lag in range(1, max_lag)]
    )
    rhos = jnp.where(rhos > 0, rhos, 0.0)
    return c * s / (1.0 + 2.0 * jnp.sum(rhos))
