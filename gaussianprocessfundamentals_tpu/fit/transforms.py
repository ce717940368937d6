"""Constraint handling by log-reparameterisation.

The reference keeps hyperparameters in natural space and enforces positivity
by ``abs()``-clamping after each fit (``BaseKernels.py:429-432`` etc.) plus an
ad-hoc gradient push-back scheme for bounds (``Optimizer/Fitter.py:122-152``).
The TPU-native design optimises positives in log-space — smooth, unconstrained,
jit/grad-friendly — and applies box bounds (when requested) by clipping at
readout. SURVEY.md §7 "hard parts" #5 notes parity must compare converged
optima, not trajectories.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def unconstrain(positivity, params):
    """Natural → optimisation space (log where positive)."""
    return jax.tree_util.tree_map(
        lambda p, pos: jnp.log(p) if pos else p, params, positivity
    )


def constrain(positivity, uparams):
    """Optimisation → natural space (exp where positive)."""
    return jax.tree_util.tree_map(
        lambda p, pos: jnp.exp(p) if pos else p, uparams, positivity
    )


def clip_to_bounds(params, lower, upper):
    """Project params into [lower, upper] box bounds (reference bound checking,
    ``Fitter.py:122-152``, done here as a simple projection)."""
    return jax.tree_util.tree_map(
        lambda p, lo, hi: jnp.clip(p, jnp.asarray(lo, p.dtype), jnp.asarray(hi, p.dtype)),
        params,
        lower,
        upper,
    )
