"""Distributed block-cyclic Cholesky vs local LAPACK on the fake 8-device
mesh (SURVEY.md §7 hard part #1; BASELINE config 5 machinery)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.linalg import cholesky as chol
from gaussianprocessfundamentals_tpu.parallel.block_cholesky import (
    distributed_chol_solve,
    distributed_cholesky,
    distributed_nll,
    from_cyclic_blocks,
    to_cyclic_blocks,
)
from gaussianprocessfundamentals_tpu.parallel.meshes import single_axis_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 1, (n, 1)), axis=0)
    K = np.exp(-0.5 * (x - x.T) ** 2 / 0.04) + 0.3 * np.eye(n)
    y = rng.standard_normal(n)
    return jnp.asarray(K), jnp.asarray(y)


def test_cyclic_block_roundtrip():
    K, _ = _spd(64)
    A = to_cyclic_blocks(K, 4, 8)
    np.testing.assert_allclose(np.asarray(from_cyclic_blocks(A, 8)), np.asarray(K))


def test_distributed_cholesky_matches_lapack():
    K, _ = _spd(64)
    mesh = single_axis_mesh("tp")
    L_cyc, logdet = distributed_cholesky(K, mesh, block=4)
    L = np.asarray(from_cyclic_blocks(L_cyc, 8))
    L_ref = np.linalg.cholesky(np.asarray(K))
    np.testing.assert_allclose(np.tril(L), L_ref, atol=1e-8)
    # strictly upper part of our L may hold harmless garbage from the
    # trailing update of the diagonal row; only the lower triangle is L
    np.testing.assert_allclose(
        float(logdet), np.linalg.slogdet(np.asarray(K))[1], rtol=1e-9
    )


def test_distributed_solve_and_nll_match_local():
    K, y = _spd(64, seed=1)
    mesh = single_axis_mesh("tp")
    L_cyc, _ = distributed_cholesky(K, mesh, block=4)
    alpha = distributed_chol_solve(L_cyc, y, mesh, block=4)
    np.testing.assert_allclose(
        np.asarray(alpha), np.linalg.solve(np.asarray(K), np.asarray(y)), atol=1e-7
    )
    got = float(distributed_nll(K, y, 0.1, 1e-8, mesh, block=4))
    want = float(chol.nll(K, y, 0.1, 1e-8))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_distributed_cholesky_larger_blocks():
    K, y = _spd(128, seed=2)
    mesh = single_axis_mesh("tp")
    got = float(distributed_nll(K, y, 0.05, 1e-8, mesh, block=8))
    want = float(chol.nll(K, y, 0.05, 1e-8))
    np.testing.assert_allclose(got, want, rtol=1e-9)


import pytest


@pytest.mark.parametrize("m", [10, 25, 50])
@pytest.mark.parametrize("num_iters", [3, 10])
def test_skc_bounds_sandwich_exact(m, num_iters):
    """Sandwich across inducing counts AND inner iteration budgets: the upper
    bound's load-bearing piece is the EARLY-STOPPED inner optimisation (see
    skc.py — with K̂ ⪯ K the fully-optimised quadratic could undershoot the
    true data fit), so it must hold for every num_iters the API exposes."""
    from gaussianprocessfundamentals_tpu.objectives.skc import (
        skc_lower_bound,
        skc_upper_bound,
    )

    x, ynp = gpf.synth_se(n=120, lengthscale=0.2, noise_sd=0.1, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(ynp)
    k = gpf.SquaredExponentialKernel()
    p = {"lengthscale": jnp.asarray(0.2)}
    noise = 0.1
    z = x[:: len(x) // m][:m]
    exact = float(chol.mll(k.gram(p, x, x), y, noise, 1e-8))
    lower = float(skc_lower_bound(k, p, x, y, z, noise, 1e-8))
    upper = float(skc_upper_bound(k, p, x, y, z, noise, 1e-8,
                                  num_iters=num_iters))
    assert lower <= exact <= upper, (m, num_iters, lower, exact, upper)


@pytest.mark.parametrize("noise", [1e-2, 1e-4, 1e-6])
def test_skc_upper_bound_adversarial(noise):
    """Adversarial cases for the empirical upper bound (r4 VERDICT item 10):
    near-singular K-hat from COLLIDING inducing points, sigma^2 down to 1e-6.

    Documents the measured behaviour: at the reference's early-stop budget
    (num_iters <= 10) the bound HOLDS even adversarially; once the inner CG
    converges (20+ iterations) the quadratic undershoots the true data fit
    and the bound is VIOLATED (margins -13.8 at sigma^2=1e-4, -3019 at 1e-6)
    -- exactly the failure mode skc.py's docstring derives. The violation
    case is asserted too, so the guidance (keep num_iters <= 10) stays
    empirically pinned."""
    from gaussianprocessfundamentals_tpu.objectives.skc import (
        skc_upper_bound,
    )

    x, ynp = gpf.synth_se(n=160, lengthscale=0.2,
                          noise_sd=max(noise, 1e-3) ** 0.5, seed=3)
    x, y = jnp.asarray(x), jnp.asarray(ynp)
    k = gpf.SquaredExponentialKernel()
    p = {"lengthscale": jnp.asarray(0.2)}
    # colliding inducing points: 10 pairs 1e-9 apart -> K_mm numerically
    # singular
    base = x[:: len(x) // 10][:10]
    z = jnp.concatenate([base, base + 1e-9], axis=0)
    exact = float(chol.mll(k.gram(p, x, x), y, noise, 1e-8))
    for num_iters in (3, 10):
        upper = float(
            skc_upper_bound(k, p, x, y, z, noise, 1e-8, num_iters=num_iters)
        )
        assert np.isfinite(upper), (noise, num_iters)
        assert upper - exact >= 0.0, (
            f"bound violated at reference budget: noise={noise} "
            f"iters={num_iters} margin={upper - exact:.4g}"
        )
    # num_iters > 10 is guarded by default (r4 ADVICE #3): the API refuses
    # to hand out a silently-non-upper "upper bound"
    with pytest.raises(ValueError):
        skc_upper_bound(k, p, x, y, z, noise, 1e-8, num_iters=20)
    # over-optimised inner problem: documented bound breakdown at tiny noise
    # (reachable only through the explicit unsound escape hatch)
    upper40 = float(skc_upper_bound(k, p, x, y, z, noise, 1e-8, num_iters=40,
                                    _allow_unsound=True))
    assert np.isfinite(upper40)
    if noise <= 1e-4:
        assert upper40 - exact < 0.0, (
            "expected documented violation vanished -- margin "
            f"{upper40 - exact:.4g}; update skc.py guidance"
        )


@pytest.mark.parametrize("P", [1, 4])
def test_unrolled_block_cholesky_matches_lapack(P):
    """r5 fast path (statically-unrolled panels + cached diag inverses +
    matmul-only substitutions) must match LAPACK exactly on the CPU mesh."""
    import jax
    from jax.sharding import Mesh

    from gaussianprocessfundamentals_tpu.parallel.block_cholesky import (
        distributed_chol_solve_inv,
        distributed_cholesky_factor,
        distributed_nll,
        from_cyclic_blocks,
    )

    rng_l = np.random.default_rng(0)
    n, B = 512, 64
    mesh = Mesh(np.array(jax.devices()[:P]), ("tp",))
    A = rng_l.standard_normal((n, n))
    K = A @ A.T / n + np.eye(n)
    y = rng_l.standard_normal(n)
    L, Linv, logdet = distributed_cholesky_factor(jnp.asarray(K), mesh, "tp", B)
    Lt = np.linalg.cholesky(K)
    np.testing.assert_allclose(
        np.tril(np.asarray(from_cyclic_blocks(L, P))), Lt, atol=1e-10
    )
    np.testing.assert_allclose(
        float(logdet), 2 * np.sum(np.log(np.diag(Lt))), rtol=1e-12
    )
    al = distributed_chol_solve_inv(L, Linv, jnp.asarray(y), mesh, "tp", B)
    np.testing.assert_allclose(
        np.asarray(al), np.linalg.solve(K, y), atol=1e-10
    )
    nll_fast = float(distributed_nll(
        jnp.asarray(K), jnp.asarray(y), 0.0, 0.0, mesh, "tp", B, unroll=True
    ))
    nll_ref = float(distributed_nll(
        jnp.asarray(K), jnp.asarray(y), 0.0, 0.0, mesh, "tp", B
    ))
    np.testing.assert_allclose(nll_fast, nll_ref, rtol=1e-12)


@pytest.mark.parametrize("P", [1, 4])
def test_distributed_posterior_matches_dense(P):
    """r5: exact (non-stochastic) posterior moments via the unrolled
    block-cyclic factor + multi-RHS matmul-only substitutions must match the
    dense Cholesky posterior to machine precision on the CPU mesh."""
    import jax
    from jax.sharding import Mesh

    from gaussianprocessfundamentals_tpu.models.exact import (
        posterior as exact_posterior,
    )
    from gaussianprocessfundamentals_tpu.parallel.block_cholesky import (
        distributed_posterior,
    )

    rng_l = np.random.default_rng(0)
    n = 512
    x = jnp.asarray(np.sort(rng_l.uniform(0, 1, (n, 1)), 0))
    y = jnp.asarray(np.sin(6 * np.asarray(x)[:, 0])
                    + 0.1 * rng_l.standard_normal(n))
    xs = jnp.asarray(rng_l.uniform(0.1, 0.9, (33, 1)))
    k = gpf.SquaredExponentialKernel()
    p = {"lengthscale": jnp.asarray(0.2)}
    ref = exact_posterior(k, p, x, y, xs, 0.01, 1e-8, method="dense")
    mesh = Mesh(np.array(jax.devices()[:P]), ("tp",))
    mu, var = distributed_posterior(k, p, x, y, xs, 0.01, 1e-8, mesh, "tp", 64)
    np.testing.assert_allclose(
        np.asarray(mu), np.asarray(ref.posterior_mu), atol=1e-10
    )
    np.testing.assert_allclose(np.asarray(var), np.asarray(ref.var),
                               atol=1e-12)
