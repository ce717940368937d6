"""No-U-Turn Sampler (iterative, multinomial), jit-compatible.

BASELINE config 3 requires NUTS over kernel hyperparameters with chains
sharded per chip. The reference has no MCMC at all (SURVEY.md §0). This is the
iterative formulation (Hoffman & Gelman 2014, with multinomial progressive
sampling per Betancourt 2017), implemented with static-shape state so it
compiles under ``jit``/``vmap``:

  * positions are flattened to one vector via ``ravel_pytree`` — dot products,
    checkpoint stacks, and tree states are plain arrays;
  * each doubling integrates 2^depth leapfrog steps in a ``fori_loop``;
    sub-subtree U-turn checks use the binary-counter checkpoint scheme:
    even leaf n stores its state at slot popcount(n); odd leaf n with t
    trailing ones checks against slots [popcount(n)−t, popcount(n)−1]
    (O(max_depth) memory, exactly the checks recursive NUTS performs);
  * divergences terminate the doubling (energy error > 1000);
  * warmup adapts the step size by dual averaging on the mean leaf
    acceptance statistic.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import jax.random as jr
from jax.flatten_util import ravel_pytree

MAX_DELTA_ENERGY = 1000.0


class NUTSResult(NamedTuple):
    samples: Any  # pytree with leading [num_samples, ...]
    accept_stat: jnp.ndarray  # [num_samples] mean leaf acceptance
    step_size: jnp.ndarray
    num_steps: jnp.ndarray  # [num_samples] leapfrog steps per draw
    diverging: jnp.ndarray  # [num_samples] bool
    log_probs: jnp.ndarray
    # adapted diagonal inverse mass (flat) — with step_size and the last
    # sample this makes a chain RESUMABLE (:func:`nuts_resume`): the axon
    # TPU worker crashes on very large while_loop programs, so long chains
    # run as warmup-once + resumed segments (also the §5.4 chain-checkpoint
    # story: persist (last q, step_size, inv_mass) and continue later)
    inv_mass: Any = None


def _popcount(n):
    def body(carry):
        v, c = carry
        return v >> 1, c + (v & 1)

    _, c = jax.lax.while_loop(lambda vc: vc[0] > 0, body, (n, jnp.zeros_like(n)))
    return c


def _trailing_ones(n):
    def body(carry):
        v, c = carry
        return v >> 1, c + 1

    _, c = jax.lax.while_loop(
        lambda vc: (vc[0] & 1) == 1, body, (n, jnp.zeros_like(n))
    )
    return c


def _is_turning(q_l, p_l, q_r, p_r, inv_mass):
    # velocities v = M⁻¹p; with diagonal mass M = diag(1/inv_mass)
    dq = q_r - q_l
    return jnp.logical_or(
        jnp.dot(dq, inv_mass * p_l) < 0.0, jnp.dot(dq, inv_mass * p_r) < 0.0
    )


def _nuts_kernel(logprob_grad_flat: Callable, max_depth: int):
    """One NUTS transition over flat vectors."""

    def transition(key, q0, lp0, g0, eps, inv_mass):
        def leapfrog(q, p, g, eps_):
            p_half = p + 0.5 * eps_ * g
            q_new = q + eps_ * inv_mass * p_half
            lp_new, g_new = logprob_grad_flat(q_new)
            p_new = p_half + 0.5 * eps_ * g_new
            return q_new, p_new, g_new, lp_new

        dim = q0.shape[0]
        key_mom, key_dir, key_tree = jr.split(key, 3)
        # p ~ N(0, M), M = diag(1/inv_mass); KE = ½ pᵀ·inv_mass·p
        p0 = jr.normal(key_mom, (dim,), q0.dtype) / jnp.sqrt(inv_mass)
        energy0 = lp0 - 0.5 * jnp.dot(p0, inv_mass * p0)

        # whole-trajectory state
        # candidate sample (multinomial), tree log-weight, extremes
        init = dict(
            q_cand=q0, lp_cand=lp0,
            logw_tree=jnp.zeros((), q0.dtype),  # relative to energy0
            q_left=q0, p_left=p0, g_left=g0,
            q_right=q0, p_right=p0, g_right=g0,
            turning=jnp.asarray(False), diverging=jnp.asarray(False),
            depth=jnp.asarray(0),
            sum_accept=jnp.zeros((), q0.dtype),
            n_leaves=jnp.zeros((), q0.dtype),
        )

        def build_subtree(key, state, direction, depth):
            """Integrate 2^depth leaves outward in `direction`; returns
            subtree candidate/logw/turning/diverging and new edge state."""
            n_steps = jnp.asarray(1, jnp.int32) << depth
            # edge to extend from
            q_e = jnp.where(direction > 0, state["q_right"], state["q_left"])
            p_e = jnp.where(direction > 0, state["p_right"], state["p_left"])
            g_e = jnp.where(direction > 0, state["g_right"], state["g_left"])
            eps_d = eps * direction

            ck_q = jnp.zeros((max_depth + 1, dim), q0.dtype)
            ck_p = jnp.zeros((max_depth + 1, dim), q0.dtype)

            sub = dict(
                q=q_e, p=p_e, g=g_e, lp=jnp.zeros((), q0.dtype),
                q_cand=q_e, lp_cand=jnp.zeros((), q0.dtype),
                logw=-jnp.inf * jnp.ones((), q0.dtype),
                q_first=q_e, p_first=p_e,
                turning=jnp.asarray(False), diverging=jnp.asarray(False),
                ck_q=ck_q, ck_p=ck_p, key=key,
                sum_accept=jnp.zeros((), q0.dtype),
                n=jnp.zeros((), q0.dtype),
            )

            def leaf_body(i, sub):
                def do(sub):
                    q, p, g, lp = leapfrog(sub["q"], sub["p"], sub["g"], eps_d)
                    logw_leaf = lp - 0.5 * jnp.dot(p, inv_mass * p) - energy0
                    logw_leaf = jnp.where(
                        jnp.isnan(logw_leaf), -jnp.inf, logw_leaf
                    )
                    diverging = logw_leaf < -MAX_DELTA_ENERGY
                    accept = jnp.minimum(1.0, jnp.exp(logw_leaf))
                    # progressive multinomial sampling within the subtree
                    logw_new = jnp.logaddexp(sub["logw"], logw_leaf)
                    key, sk = jr.split(sub["key"])
                    take = jnp.log(jr.uniform(sk, (), q0.dtype)) < (
                        logw_leaf - logw_new
                    )
                    q_cand = jnp.where(take, q, sub["q_cand"])
                    lp_cand = jnp.where(take, lp, sub["lp_cand"])
                    # record first leaf (subtree edge nearest the old tree)
                    first = i == 0
                    q_first = jnp.where(first, q, sub["q_first"])
                    p_first = jnp.where(first, p, sub["p_first"])
                    # binary-counter checkpoints + U-turn checks
                    pc = _popcount(i)
                    even = (i & 1) == 0
                    ck_q = jax.lax.cond(
                        even,
                        lambda: sub["ck_q"].at[pc].set(q),
                        lambda: sub["ck_q"],
                    )
                    ck_p = jax.lax.cond(
                        even,
                        lambda: sub["ck_p"].at[pc].set(p),
                        lambda: sub["ck_p"],
                    )

                    def check_turns():
                        t = _trailing_ones(i)
                        idx_max = pc - 1
                        idx_min = pc - t

                        def scan_k(k, turning):
                            valid = jnp.logical_and(k >= idx_min, k <= idx_max)
                            turn_k = _is_turning(ck_q[k], ck_p[k], q, p, inv_mass)
                            return jnp.logical_or(
                                turning, jnp.logical_and(valid, turn_k)
                            )

                        return jax.lax.fori_loop(
                            0, max_depth + 1, scan_k, jnp.asarray(False)
                        )

                    turning = jax.lax.cond(
                        even, lambda: sub["turning"],
                        lambda: jnp.logical_or(sub["turning"], check_turns()),
                    )
                    return dict(
                        q=q, p=p, g=g, lp=lp,
                        q_cand=q_cand, lp_cand=lp_cand, logw=logw_new,
                        q_first=q_first, p_first=p_first,
                        turning=turning,
                        diverging=jnp.logical_or(sub["diverging"], diverging),
                        ck_q=ck_q, ck_p=ck_p, key=key,
                        sum_accept=sub["sum_accept"] + accept,
                        n=sub["n"] + 1.0,
                    )

                stop = jnp.logical_or(sub["turning"], sub["diverging"])
                return jax.lax.cond(stop, lambda s: s, do, sub)

            sub = jax.lax.fori_loop(0, n_steps, leaf_body, sub)
            return sub

        def doubling_body(carry):
            state, key = carry
            key, kd, kt, km = jr.split(key, 4)
            direction = jnp.where(
                jr.uniform(kd, ()) < 0.5, jnp.asarray(-1.0, q0.dtype),
                jnp.asarray(1.0, q0.dtype),
            )
            sub = build_subtree(kt, state, direction, state["depth"])
            ok = jnp.logical_not(
                jnp.logical_or(sub["turning"], sub["diverging"])
            )
            # biased progressive sampling between old tree and new subtree
            accept_new = jnp.log(jr.uniform(km, (), q0.dtype)) < (
                sub["logw"] - state["logw_tree"]
            )
            take = jnp.logical_and(ok, accept_new)
            q_cand = jnp.where(take, sub["q_cand"], state["q_cand"])
            lp_cand = jnp.where(take, sub["lp_cand"], state["lp_cand"])
            logw_tree = jnp.where(
                ok,
                jnp.logaddexp(state["logw_tree"], sub["logw"]),
                state["logw_tree"],
            )
            # update extremes only when subtree is valid
            upd = lambda new, old: jnp.where(ok, new, old)
            q_left = upd(
                jnp.where(direction > 0, state["q_left"], sub["q"]),
                state["q_left"],
            )
            p_left = upd(
                jnp.where(direction > 0, state["p_left"], sub["p"]),
                state["p_left"],
            )
            g_left = upd(
                jnp.where(direction > 0, state["g_left"], sub["g"]),
                state["g_left"],
            )
            q_right = upd(
                jnp.where(direction > 0, sub["q"], state["q_right"]),
                state["q_right"],
            )
            p_right = upd(
                jnp.where(direction > 0, sub["p"], state["p_right"]),
                state["p_right"],
            )
            g_right = upd(
                jnp.where(direction > 0, sub["g"], state["g_right"]),
                state["g_right"],
            )
            turning_global = _is_turning(
                q_left, p_left, q_right, p_right, inv_mass
            )
            state = dict(
                q_cand=q_cand, lp_cand=lp_cand, logw_tree=logw_tree,
                q_left=q_left, p_left=p_left, g_left=g_left,
                q_right=q_right, p_right=p_right, g_right=g_right,
                turning=jnp.logical_or(sub["turning"], turning_global),
                diverging=sub["diverging"],
                depth=state["depth"] + 1,
                sum_accept=state["sum_accept"] + sub["sum_accept"],
                n_leaves=state["n_leaves"] + sub["n"],
            )
            return state, key

        def doubling_cond(carry):
            state, _ = carry
            return jnp.logical_and(
                state["depth"] < max_depth,
                jnp.logical_not(
                    jnp.logical_or(state["turning"], state["diverging"])
                ),
            )

        state, _ = jax.lax.while_loop(
            doubling_cond, doubling_body, (init, key_tree)
        )
        accept_stat = state["sum_accept"] / jnp.maximum(state["n_leaves"], 1.0)
        n_steps = state["n_leaves"]
        return (
            state["q_cand"], state["lp_cand"], accept_stat, n_steps,
            state["diverging"],
        )

    return transition


def nuts(
    logprob_fn: Callable,
    q0: Any,
    key,
    num_samples: int = 500,
    num_warmup: int = 300,
    max_depth: int = 8,
    init_step_size: float = 0.1,
    target_accept: float = 0.8,
    adapt_pmean_axis: str = None,
) -> NUTSResult:
    """Single-chain NUTS over a pytree position; vmap/shard for chains."""
    q0_flat, unravel = ravel_pytree(q0)

    def lp_flat(qf):
        return logprob_fn(unravel(qf))

    lpg = jax.value_and_grad(lp_flat)
    transition = _nuts_kernel(lpg, max_depth)

    lp0, g0 = lpg(q0_flat)
    dim = q0_flat.shape[0]

    # two-phase warmup: (1) step size with identity mass while accumulating
    # Welford moments of q; (2) diagonal mass from the phase-1 variance
    # (Stan-style regularisation), step size re-adapted
    mu = jnp.log(10.0 * init_step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def make_warmup_step(inv_mass):
        def warmup_step(carry, key):
            q, lp, g, log_eps, log_eps_bar, h_bar, t, w_mean, w_m2 = carry
            eps = jnp.exp(log_eps)
            q_new, lp_new, accept, _, _ = transition(key, q, lp, g, eps, inv_mass)
            if adapt_pmean_axis is not None:
                accept = jax.lax.pmean(accept, adapt_pmean_axis)
            g_new = lpg(q_new)[1]
            t = t + 1.0
            eta = 1.0 / (t + t0)
            h_bar = (1.0 - eta) * h_bar + eta * (target_accept - accept)
            log_eps = mu - jnp.sqrt(t) / gamma * h_bar
            w = t ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            delta = q_new - w_mean
            w_mean = w_mean + delta / t
            w_m2 = w_m2 + delta * (q_new - w_mean)
            return (q_new, lp_new, g_new, log_eps, log_eps_bar, h_bar, t,
                    w_mean, w_m2), None
        return warmup_step

    ones = jnp.ones((dim,), q0_flat.dtype)
    log_e0 = jnp.log(jnp.asarray(init_step_size, q0_flat.dtype))
    zeros = jnp.zeros((dim,), q0_flat.dtype)
    n1 = max(num_warmup // 2, 1)
    n2 = max(num_warmup - n1, 1)
    init1 = (q0_flat, lp0, g0, log_e0, log_e0,
             jnp.zeros((), q0_flat.dtype), jnp.zeros((), q0_flat.dtype),
             zeros, zeros)
    (q, lp, g, _, log_eps_bar, _, cnt, w_mean, w_m2), _ = jax.lax.scan(
        make_warmup_step(ones), init1, jr.split(jr.fold_in(key, 0), n1)
    )
    var = w_m2 / jnp.maximum(cnt - 1.0, 1.0)
    inv_mass = (cnt / (cnt + 5.0)) * var + (5.0 / (cnt + 5.0)) * 1e-3
    inv_mass = jnp.where(inv_mass > 0, inv_mass, 1.0)

    init2 = (q, lp, g, log_eps_bar, log_eps_bar,
             jnp.zeros((), q0_flat.dtype), jnp.zeros((), q0_flat.dtype),
             zeros, zeros)
    (q, lp, g, _, log_eps_bar, _, _, _, _), _ = jax.lax.scan(
        make_warmup_step(inv_mass), init2, jr.split(jr.fold_in(key, 2), n2)
    )
    eps = jnp.exp(log_eps_bar)

    def sample_step(carry, key):
        q, lp, g = carry
        q_new, lp_new, accept, n_steps, div = transition(
            key, q, lp, g, eps, inv_mass
        )
        g_new = lpg(q_new)[1]
        return (q_new, lp_new, g_new), (q_new, accept, n_steps, div, lp_new)

    keys_s = jr.split(jr.fold_in(key, 1), num_samples)
    _, (qs, accepts, n_steps, divs, lps) = jax.lax.scan(
        sample_step, (q, lp, g), keys_s
    )
    samples = jax.vmap(unravel)(qs)
    return NUTSResult(samples, accepts, eps, n_steps, divs, lps, inv_mass)


def nuts_resume(
    logprob_fn: Callable,
    q0: Any,
    key,
    num_samples: int,
    step_size,
    inv_mass,
    max_depth: int = 8,
) -> NUTSResult:
    """Continue a chain from ``q0`` with FROZEN adaptation (``step_size`` /
    ``inv_mass`` from a prior :func:`nuts` run): no warmup, so segments of a
    long chain can be produced by repeated calls — each a moderate-size XLA
    program (the axon worker crashes on very large single programs) — and
    concatenated for R-hat/ESS. Statistically this is the standard
    post-adaptation sampling phase split across calls."""
    q0_flat, unravel = ravel_pytree(q0)

    def lp_flat(qf):
        return logprob_fn(unravel(qf))

    lpg = jax.value_and_grad(lp_flat)
    transition = _nuts_kernel(lpg, max_depth)
    lp0, g0 = lpg(q0_flat)
    eps = jnp.asarray(step_size, q0_flat.dtype)

    def sample_step(carry, key):
        q, lp, g = carry
        q_new, lp_new, accept, n_steps, div = transition(
            key, q, lp, g, eps, inv_mass
        )
        g_new = lpg(q_new)[1]
        return (q_new, lp_new, g_new), (q_new, accept, n_steps, div, lp_new)

    keys_s = jr.split(key, num_samples)
    _, (qs, accepts, n_steps, divs, lps) = jax.lax.scan(
        sample_step, (q0_flat, lp0, g0), keys_s
    )
    samples = jax.vmap(unravel)(qs)
    return NUTSResult(samples, accepts, eps, n_steps, divs, lps, inv_mass)


def nuts_chains_resume(
    logprob_fn: Callable,
    q0s: Any,
    keys: jnp.ndarray,
    num_samples: int,
    step_sizes,
    inv_masses,
    max_depth: int = 8,
) -> NUTSResult:
    """Vmapped :func:`nuts_resume` over a leading chain axis."""
    return jax.vmap(
        lambda q0, key, eps, im: nuts_resume(
            logprob_fn, q0, key, num_samples, eps, im, max_depth
        )
    )(q0s, keys, step_sizes, inv_masses)


def nuts_chains_collective(
    logprob_fn: Callable,
    q0s: Any,
    keys,
    mesh,
    axis: str = "dp",
    num_samples: int = 500,
    num_warmup: int = 300,
    max_depth: int = 8,
    init_step_size: float = 0.1,
) -> NUTSResult:
    """NUTS chains one-per-device under shard_map with collectively adapted
    step size (psum-averaged warmup acceptance; SURVEY.md §5.8).
    Requires num_chains == mesh.shape[axis]."""
    from jax.sharding import PartitionSpec

    assert keys.shape[0] == mesh.shape[axis]

    def per_device(q0, key):
        q0 = jax.tree_util.tree_map(lambda l: l[0], q0)
        res = nuts(
            logprob_fn, q0, key[0], num_samples, num_warmup, max_depth,
            init_step_size, adapt_pmean_axis=axis,
        )
        return jax.tree_util.tree_map(lambda l: jnp.asarray(l)[None], res)

    spec_q = jax.tree_util.tree_map(
        lambda l: PartitionSpec(axis, *([None] * (l.ndim - 1))), q0s
    )
    return jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(spec_q, PartitionSpec(axis)),
        out_specs=PartitionSpec(axis),
        check_vma=False,
    )(q0s, keys)


@partial(jax.jit, static_argnames=(
    "logprob_fn", "num_samples", "num_warmup", "max_depth"))
def nuts_chains(
    logprob_fn: Callable,
    q0s: Any,
    keys: jnp.ndarray,
    num_samples: int = 500,
    num_warmup: int = 300,
    max_depth: int = 8,
    init_step_size: float = 0.1,
) -> NUTSResult:
    """Vmapped chains; the chain axis shards one-per-chip under a "dp" mesh
    (BASELINE config 3)."""
    return jax.vmap(
        lambda q0, key: nuts(
            logprob_fn, q0, key, num_samples, num_warmup, max_depth,
            init_step_size,
        )
    )(q0s, keys)
