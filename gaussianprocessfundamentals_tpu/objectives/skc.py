"""SKC (Scalable Kernel Compositions) log-likelihood bounds.

Reference: lower bound = Nyström LL + Titsias trace correction
(``Metrics/LogLikelihood.py:51-60``, exposed here via
:func:`~gaussianprocessfundamentals_tpu.models.svgp.collapsed_elbo`); upper
bound = partially optimised variational quadratic
(``Metrics/SkcLogLikelihood.py:26-69``): minimise over α

    ½·αᵀ(K̂+σ²I)α − αᵀy − ½·log|K̂+σ²I| − (n/2)·log 2π

The reference runs 10 steps of ``tfp.optimizer.VariationalSGD`` from α = 1;
the early stopping is load-bearing — for any α the quadratic upper-bounds the
data-fit term −½yᵀ(K̂+σ²I)⁻¹y, and K̂ ⪯ K makes −½log|K̂+σ²I| upper-bound the
complexity term, while *fully* optimising α against K̂ could undershoot the
true data fit. Here the inner optimisation is ``num_iters`` steps of CG on the
Woodbury-factored K̂ (each step is exact line search along a conjugate
direction — strictly better progress per iteration than SGD, same early-stop
structure).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianprocessfundamentals_tpu.linalg.cholesky import LOG_2PI
from gaussianprocessfundamentals_tpu.linalg.nystroem import (
    nystroem_factor,
    nystroem_logdet,
)


def skc_upper_bound(
    kernel, params, x, y, z, noise, jitter: float, num_iters: int = 10,
    _allow_unsound: bool = False,
) -> jnp.ndarray:
    """Upper bound on the log marginal likelihood (larger = looser).

    IMPORTANT — ``num_iters`` must stay ≤ 10 (the reference's own inner-SGD
    budget, ``SkcLogLikelihood.py:53-69``): the early stopping of the inner
    quadratic minimisation is LOAD-BEARING for the upper-bound property.
    The r4 adversarial measurement (``tests/test_block_cholesky.py::
    test_skc_upper_bound_adversarial``) shows the inner CG converging at
    ≥ 20 iterations undershoots the true data fit and VIOLATES the bound by
    up to −3019 at σ² = 1e-6. Values above 10 raise — pass
    ``num_iters=10`` and tighten via more inducing points instead
    (``_allow_unsound=True`` bypasses the guard for the adversarial tests
    that pin the violation).
    """
    if num_iters > 10 and not _allow_unsound:
        raise ValueError(
            f"skc_upper_bound(num_iters={num_iters}): more than 10 inner CG "
            "steps converges the inner quadratic and BREAKS the upper-bound "
            "property (measured violations up to -3019 at sigma^2=1e-6, r4 "
            "adversarial test). Use num_iters <= 10; tighten the bound with "
            "more inducing points, not more inner iterations."
        )
    n = x.shape[0]
    state = nystroem_factor(kernel, params, x, z, noise, jitter)

    def matvec(v):  # (K̂ + σ²I)·v in O(nm)
        return state.A @ (state.A.T @ v) + state.noise * v

    def quad(alpha):
        return 0.5 * jnp.dot(alpha, matvec(alpha)) - jnp.dot(alpha, y)

    # num_iters CG steps from α = 1 (reference inits tf.ones, SkcLogLikelihood.py:58)
    alpha0 = jnp.ones_like(y)
    r0 = y - matvec(alpha0)

    def body(_, carry):
        alpha, r, p = carry
        Ap = matvec(p)
        denom = jnp.dot(p, Ap)
        a = jnp.dot(r, r) / jnp.where(denom == 0, 1.0, denom)
        alpha = alpha + a * p
        r_new = r - a * Ap
        beta = jnp.dot(r_new, r_new) / jnp.where(
            jnp.dot(r, r) == 0, 1.0, jnp.dot(r, r)
        )
        return alpha, r_new, r_new + beta * p

    alpha, _, _ = jax.lax.fori_loop(0, num_iters, body, (alpha0, r0, r0))
    # Complexity: −½log|K̂+σ²I| ≥ −½log|K+σ²I| since K̂ ⪯ K — a true bound.
    # Data fit: quad(α) ≥ min_α quad = −½yᵀ(K̂+σ²I)⁻¹y, but K̂ ⪯ K makes that
    # MINIMUM sit *below* the true data fit −½yᵀ(K+σ²I)⁻¹y ((K̂+σ²I)⁻¹ ⪰
    # (K+σ²I)⁻¹), so a fully optimised α could undershoot. The EARLY STOPPING
    # is load-bearing (as in the reference's 10 VariationalSGD steps,
    # SkcLogLikelihood.py:53-69): num_iters CG steps leave quad(α) above the
    # K̂ minimum by more than the K-vs-K̂ gap in practice — an empirical upper
    # bound, verified across m and num_iters in tests/test_block_cholesky.py.
    # Adversarial margins (measured r4, tests/test_block_cholesky.py
    # ``test_skc_upper_bound_adversarial``: colliding inducing points →
    # near-singular K̂, σ² ∈ {1e-2, 1e-4, 1e-6}): at the default 10 CG steps
    # the bound holds with margins +0.04 / +388 / +6.9e4; at 20+ steps the
    # inner quadratic CONVERGES and the bound is VIOLATED by −13.8 (σ²=1e-4)
    # to −3019 (σ²=1e-6) — exactly the undershoot the theory above predicts.
    # Guidance: keep num_iters ≤ 10 (the reference's own budget); more inner
    # iterations make the "upper bound" tighter only until they break it.
    data_fit_upper = quad(alpha)
    complexity = -0.5 * nystroem_logdet(state, n)
    return data_fit_upper + complexity - 0.5 * n * LOG_2PI


def skc_lower_bound(kernel, params, x, y, z, noise, jitter: float) -> jnp.ndarray:
    """Titsias lower bound (reference ``LogLikelihood.py:51-60``)."""
    from gaussianprocessfundamentals_tpu.linalg.nystroem import nystroem_mll

    return nystroem_mll(
        kernel, params, x, y, z, noise, jitter, titsias_correction=True
    )
