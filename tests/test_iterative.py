"""Iterative (mBCG + SLQ) exact-GP path vs the Cholesky oracle."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.linalg import cholesky as chol
from gaussianprocessfundamentals_tpu.linalg.mbcg import mbcg, slq_logdet
from gaussianprocessfundamentals_tpu.models.iterative import (
    fit_iterative,
    iterative_nll_and_grad,
    iterative_posterior_mean,
)
from gaussianprocessfundamentals_tpu.ops.gram_matvec import (
    gram_matvec,
    lowrank_gram_vjp,
)

K_SE = gpf.SquaredExponentialKernel()
P_SE = {"lengthscale": jnp.asarray(0.2)}


def _data(n=200, seed=0):
    x, y = gpf.synth_se(n=n, lengthscale=0.2, noise_sd=0.3, seed=seed)
    return jnp.asarray(x), jnp.asarray(y)


def test_gram_matvec_matches_dense():
    x, _ = _data(150)
    V = jnp.asarray(np.random.default_rng(0).standard_normal((150, 3)))
    got = np.asarray(gram_matvec(K_SE, P_SE, x, V, block=64))
    want = np.asarray(K_SE.gram(P_SE, x, x) @ V)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_mbcg_solves_match_direct():
    x, y = _data(100)
    K = K_SE.gram(P_SE, x, x)
    Kn = np.asarray(K) + 0.3 * np.eye(100)
    B = jnp.stack([y, y * 2.0], axis=1)
    res = mbcg(lambda V: K @ V + 0.3 * V, B, max_iters=200, tol=1e-12)
    want = np.linalg.solve(Kn, np.asarray(B))
    np.testing.assert_allclose(np.asarray(res.solves), want, atol=1e-6)


def test_slq_logdet_accuracy(key):
    x, _ = _data(150)
    K = K_SE.gram(P_SE, x, x)
    noise = 0.3
    Kn = np.asarray(K) + noise * np.eye(150)
    want = np.linalg.slogdet(Kn)[1]
    z = jr.rademacher(key, (150, 32)).astype(x.dtype)
    res = mbcg(lambda V: K @ V + noise * V, z, max_iters=150, tol=1e-12)
    got = float(slq_logdet(res.alphas, res.betas, jnp.sum(z * z, 0), 150))
    np.testing.assert_allclose(got, want, rtol=0.05)


def test_lowrank_vjp_matches_dense_vjp():
    x, _ = _data(120)
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((120, 4)))
    W = jnp.asarray(rng.standard_normal((120, 4)))

    def total_dense(p):
        return jnp.sum(K_SE.gram(p, x, x) * (U @ W.T))

    g_dense = jax.grad(total_dense)(P_SE)
    g_lr = lowrank_gram_vjp(K_SE, P_SE, x, U, W, block=32)
    np.testing.assert_allclose(
        float(g_lr["lengthscale"]), float(g_dense["lengthscale"]), rtol=1e-8
    )


def test_iterative_nll_and_grad_match_cholesky(key):
    x, y = _data(150)
    noise = 0.3

    def exact(p):
        return chol.nll(K_SE.gram(p, x, x), y, noise, 0.0)

    val_e, g_e = jax.value_and_grad(exact)(P_SE)
    nll, g, gn, resid = iterative_nll_and_grad(
        K_SE, P_SE, x, y, noise, key,
        num_probes=32, max_iters=150, block=64,
    )
    assert float(jnp.max(resid)) < 1e-4
    np.testing.assert_allclose(float(nll), float(val_e), rtol=0.02)
    np.testing.assert_allclose(
        float(g["lengthscale"]), float(g_e["lengthscale"]), rtol=0.15
    )


def test_fit_iterative_learns(key):
    x, y = _data(300, seed=1)
    kp, noise, hist = fit_iterative(
        gpf.SquaredExponentialKernel(scaled=True), x, y, key,
        steps=40, lr=0.1, num_probes=8, max_iters=100, block=128,
    )
    assert hist[-1] < hist[0]
    assert 0.02 < float(kp["lengthscale"]) < 1.0


def test_iterative_posterior_mean_matches_exact():
    x, y = _data(150)
    xs = jnp.linspace(0, 1, 40)[:, None].astype(x.dtype)
    noise = 0.3
    mu_it = iterative_posterior_mean(
        K_SE, P_SE, x, y, xs, noise, max_iters=300, block=64
    )
    st = chol.factor(K_SE.gram(P_SE, x, x), y, noise, 0.0)
    mu_ex = chol.posterior_mean(st, K_SE.gram(P_SE, x, xs))
    np.testing.assert_allclose(np.asarray(mu_it), np.asarray(mu_ex), atol=1e-5)


def test_iterative_posterior_variance_matches_exact():
    from gaussianprocessfundamentals_tpu.models.iterative import (
        iterative_posterior,
    )

    x, y = _data(150)
    xs = jnp.linspace(0, 1, 30)[:, None].astype(x.dtype)
    noise = 0.3
    mu_it, var_it = iterative_posterior(
        K_SE, P_SE, x, y, xs, noise, max_iters=300, block=64
    )
    st = chol.factor(K_SE.gram(P_SE, x, x), y, noise, 0.0)
    mu_ex = chol.posterior_mean(st, K_SE.gram(P_SE, x, xs))
    var_ex = chol.posterior_var(
        st, K_SE.gram(P_SE, x, xs), K_SE.diag(P_SE, xs)
    )
    np.testing.assert_allclose(np.asarray(mu_it), np.asarray(mu_ex), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_it), np.asarray(var_ex), atol=1e-5)


def test_mbcg_early_exit_matches_scan():
    """while_loop early-exit mBCG must be bit-identical to the fixed-length
    scan on converged problems (zero α/β tails are SLQ identity rows)."""
    import jax
    import jax.numpy as jnp

    from gaussianprocessfundamentals_tpu.linalg.mbcg import mbcg

    rng = np.random.default_rng(3)
    n = 300
    A = rng.standard_normal((n, n))
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    B = jnp.asarray(rng.standard_normal((n, 3)))
    mv = lambda V: jnp.matmul(K, V, precision=jax.lax.Precision.HIGHEST)
    r1 = mbcg(mv, B, max_iters=80, tol=1e-10)
    r2 = mbcg(mv, B, max_iters=80, tol=1e-10, early_exit=True)
    np.testing.assert_array_equal(np.asarray(r1.solves), np.asarray(r2.solves))
    np.testing.assert_array_equal(np.asarray(r1.alphas), np.asarray(r2.alphas))
    np.testing.assert_array_equal(np.asarray(r1.betas), np.asarray(r2.betas))


def test_device_slq_matches_host_and_cholesky(key):
    """Fully on-device NLL (Jacobi-eigh SLQ) == host-SLQ NLL == Cholesky NLL
    within probe tolerance; gradients identical between host/device paths."""
    from gaussianprocessfundamentals_tpu.models.iterative import (
        iterative_nll_and_grad_device,
    )

    x, y = _data(150)
    noise = 0.3
    val_e = float(chol.nll(K_SE.gram(P_SE, x, x), y, noise, 0.0))
    nll_h, g_h, gn_h, _ = iterative_nll_and_grad(
        K_SE, P_SE, x, y, noise, key, num_probes=32, max_iters=150, block=64
    )
    nll_d, g_d, gn_d, resid = iterative_nll_and_grad_device(
        K_SE, P_SE, x, y, noise, key, num_probes=32, max_iters=150, block=64
    )
    assert float(jnp.max(resid)) < 1e-4
    np.testing.assert_allclose(float(nll_d), float(nll_h), rtol=1e-5)
    np.testing.assert_allclose(float(nll_d), val_e, rtol=0.02)
    np.testing.assert_allclose(
        float(g_d["lengthscale"]), float(g_h["lengthscale"]), rtol=1e-5
    )
    np.testing.assert_allclose(float(gn_d), float(gn_h), rtol=1e-5)


def test_jacobi_eigh_small_matches_numpy():
    from gaussianprocessfundamentals_tpu.linalg.mbcg import jacobi_eigh_small

    rng = np.random.default_rng(0)
    for t in (4, 17, 50):
        A = rng.standard_normal((3, t, t))
        A = (A + A.transpose(0, 2, 1)) / 2
        w, V = jacobi_eigh_small(jnp.asarray(A))
        w, V = np.asarray(w), np.asarray(V)
        np.testing.assert_allclose(
            A @ V, V * w[:, None, :], atol=1e-10
        )
        np.testing.assert_allclose(
            np.sort(w, -1), np.sort(np.linalg.eigvalsh(A), -1), atol=1e-10
        )


def test_fit_iterative_scan_loop_matches_callback_loop(key):
    """The single-program lax.scan fit loop must track the step-at-a-time
    host loop (identical math, same PRNG stream)."""
    x, y = _data(200, seed=2)
    k = gpf.SquaredExponentialKernel(scaled=True)
    kp_s, nz_s, hist_s = fit_iterative(
        k, x, y, key, steps=15, lr=0.1, num_probes=8, max_iters=80, block=64
    )
    seen = []
    kp_c, nz_c, hist_c = fit_iterative(
        k, x, y, key, steps=15, lr=0.1, num_probes=8, max_iters=80, block=64,
        callback=lambda i, v: seen.append(v),
    )
    assert len(seen) == 15
    np.testing.assert_allclose(
        np.asarray(hist_s), np.asarray(hist_c), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        float(kp_s["lengthscale"]), float(kp_c["lengthscale"]), rtol=1e-4
    )


def test_build_preconditioner_spd_and_inverse():
    """P_inv must be SPD and act as P^-1 (P = sigma^2 I + A A^T): rz =
    v'P^-1 v > 0 even for vectors concentrated in range(W) — the r4 on-chip
    failure mode (rz < 0 from f32 range contamination) regression-tested
    here at CPU scale; the n=50k on-chip case is in the TPU gate."""
    import jax
    import jax.numpy as jnp

    from gaussianprocessfundamentals_tpu.linalg.pivchol import (
        partial_pivoted_cholesky,
    )
    from gaussianprocessfundamentals_tpu.models.iterative import (
        build_preconditioner,
    )

    x, _ = gpf.synth_se(n=800, lengthscale=0.1, noise_sd=0.1, seed=9)
    x = jnp.asarray(x, jnp.float32)
    k = gpf.SquaredExponentialKernel()
    p = {"lengthscale": jnp.asarray(0.1, jnp.float32)}
    noise = jnp.float32(0.01)
    m = 64
    P_inv, W_b, sv, d_rng, log_P = build_preconditioner(k, p, x, m, noise)
    A = partial_pivoted_cholesky(k, p, x, m)
    rng_l = np.random.default_rng(3)
    # adversarial: vectors mostly in range(W) (the amplified direction)
    v_range = np.asarray(W_b @ (np.asarray(sv) * rng_l.standard_normal(m)),
                         np.float32)
    v_rand = rng_l.standard_normal(800).astype(np.float32)
    for v in (jnp.asarray(v_range), jnp.asarray(v_rand)):
        piv = P_inv(v)
        rz = float(jnp.dot(v, piv))
        assert rz > 0.0, rz
        # P @ P_inv(v) == v
        Pv = noise * piv + A @ (A.T @ piv)
        rel = float(jnp.linalg.norm(Pv - v) / jnp.linalg.norm(v))
        assert rel < 0.05, rel
    # logdet consistency vs dense eigendecomposition of P
    Pd = np.asarray(noise) * np.eye(800, dtype=np.float64) + np.asarray(
        A, np.float64
    ) @ np.asarray(A, np.float64).T
    want = float(np.linalg.slogdet(Pd)[1])
    np.testing.assert_allclose(float(log_P), want, rtol=1e-3)


# ---------------------------------------------------------------------------
# r5: f64-grade posterior variance (df32 energy form) — the last north-star
# parity clause (reference f64 variance, Statistics/Auxiliary.py:83-103)
# ---------------------------------------------------------------------------


def test_df32_dot_resolves_cancellation():
    """df32 dot must resolve a 100k-term cancelling sum to ~1e-12 where
    naive f32 is ~1e-4."""
    from gaussianprocessfundamentals_tpu.linalg.df32 import df_dot, two_prod

    rng_l = np.random.default_rng(0)
    n = 100_000
    a = rng_l.standard_normal(n)
    b = rng_l.standard_normal(n)
    b -= (a @ b) / (a @ a) * a  # true dot ~ 0
    a32, b32 = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    true = np.dot(np.asarray(a32, np.float64), np.asarray(b32, np.float64))
    h, l = df_dot(a32, b32)
    assert abs(float(np.float64(h) + np.float64(l)) - true) < 1e-9
    # two_prod is EXACT (error-free transform)
    p, e = two_prod(a32[:1000], b32[:1000])
    exact = np.asarray(a32[:1000], np.float64) * np.asarray(b32[:1000], np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    assert np.max(np.abs(got - exact)) == 0.0


def test_iterative_variance_f64_grade_adversarial_density():
    """f32 iterative posterior variances vs a dense f64 oracle at a density
    where the true variance (~2e-5·k_ii) sits far below the old naive-f32
    floor (~1e-3·k_ii, r4 BENCHMARKS). The energy-form df32 path must land
    within 1e-5·k_ii absolute."""
    from gaussianprocessfundamentals_tpu.models.iterative import (
        iterative_posterior,
    )
    import scipy.linalg as sla

    n = 4096
    rng_l = np.random.default_rng(0)
    x64 = np.sort(rng_l.uniform(0, 1, n))[:, None]
    noise = 1e-2
    k = gpf.SquaredExponentialKernel()
    p64 = {"lengthscale": jnp.asarray(0.3)}
    xs64 = np.linspace(0.05, 0.95, 64)[:, None]
    y64 = np.sin(2 * np.pi * 2 * x64[:, 0]) + 0.1 * rng_l.standard_normal(n)

    K = np.asarray(k.gram(p64, jnp.asarray(x64), jnp.asarray(x64)), np.float64)
    Ks = np.asarray(k.gram(p64, jnp.asarray(x64), jnp.asarray(xs64)), np.float64)
    L = np.linalg.cholesky(K + noise * np.eye(n))
    V = sla.solve_triangular(L, Ks, lower=True)
    var_true = 1.0 - np.sum(V * V, axis=0)
    assert var_true.max() < 1e-4  # genuinely adversarial density

    p32 = {"lengthscale": jnp.asarray(0.3, jnp.float32)}
    _, var_it = iterative_posterior(
        k, p32, jnp.asarray(x64, jnp.float32), jnp.asarray(y64, jnp.float32),
        jnp.asarray(xs64, jnp.float32), jnp.float32(noise),
        max_iters=300, block=2048, tol=1e-7, precond_m=128,
    )
    err = np.abs(np.asarray(var_it, np.float64) - var_true)
    assert err.max() < 1e-5, err.max()


def test_iterative_variance_vs_toeplitz_oracle_16k():
    """f32 iterative posterior (generic streamed-matvec path) vs the
    independent f64 Toeplitz/FFT CPU oracle at n=16,384 — the CI-scale
    version of the on-TPU n=50k gate check (benchmarks/check_pallas_tpu.py).
    Bar: ≤1e-3·k_ii (north star); measured headroom ~70× (r5)."""
    from gaussianprocessfundamentals_tpu.models.iterative import (
        iterative_posterior,
    )
    from gaussianprocessfundamentals_tpu.utils.toeplitz_oracle import (
        se_grid_posterior_oracle,
    )

    n, ell, noise = 16_384, 0.05, 1e-2
    rng_l = np.random.default_rng(1)
    xs = rng_l.uniform(0.05, 0.95, 32)
    g = np.arange(n) / (n - 1)
    y = np.sin(2 * np.pi * 3 * g) + 0.1 * rng_l.standard_normal(n)
    mu_t, var_t, rel = se_grid_posterior_oracle(n, ell, noise, xs, y)
    assert rel < 1e-10  # oracle itself must be converged
    assert var_t.max() < 1e-4  # cancellation regime

    k = gpf.SquaredExponentialKernel()
    p32 = {"lengthscale": jnp.asarray(ell, jnp.float32)}
    _, var_it = iterative_posterior(
        k, p32, jnp.asarray(g.astype(np.float32)[:, None]),
        jnp.asarray(y, jnp.float32), jnp.asarray(xs[:, None], jnp.float32),
        jnp.float32(noise), max_iters=100, block=4096, tol=1e-7,
        precond_m=256,
    )
    err = np.abs(np.asarray(var_it, np.float64) - var_t)
    assert err.max() < 1e-3, err.max()   # north-star bar
    assert err.max() < 5e-5, err.max()   # measured r5 headroom, with margin


def test_streamed_gram_matvec_symmetric_matches_full():
    """Symmetry-exploiting tile matvec (opt-in GPF_SYM route) must equal the
    full-row streamed form for leaf and composite kernels, any n/block."""
    from gaussianprocessfundamentals_tpu.ops.gram_matvec import (
        streamed_gram_matvec,
        streamed_gram_matvec_symmetric,
    )

    rng_l = np.random.default_rng(0)
    for n, blk in [(777, 128), (1024, 256)]:
        x = jnp.asarray(np.sort(rng_l.uniform(0, 1, (n, 1)), 0))
        V = jnp.asarray(rng_l.standard_normal((n, 5)))
        a = streamed_gram_matvec(K_SE, P_SE, x, V, blk)
        b = streamed_gram_matvec_symmetric(K_SE, P_SE, x, V, blk)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)
    k2 = (gpf.SquaredExponentialKernel(scaled=True) * gpf.PeriodicKernel()
          + gpf.LinearKernel())
    xr = jnp.stack([x.min(0), x.max(0)], -1)
    p2 = k2.init_params(xr, n)
    a = streamed_gram_matvec(k2, p2, x, V, 256)
    b = streamed_gram_matvec_symmetric(k2, p2, x, V, 256)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_preconditioner_qr_soundness_guard(monkeypatch):
    """r5 regression: a garbage QR (the bisected XLA:TPU content-dependent
    failure -- ||Q'Q - I|| ~ 10 on some pivchol factors) must degrade the
    preconditioner to sigma^2*I (correct-but-slower) instead of silently
    poisoning every solve (frozen_frac 1.0 with resid exactly 1.0,
    BENCHMARKS.md r5 late finding)."""
    import jax.numpy as jnp

    import gaussianprocessfundamentals_tpu.linalg.mbcg as mbcg_mod
    from gaussianprocessfundamentals_tpu.models.iterative import (
        build_preconditioner,
    )

    n, m = 600, 32
    x, _ = gpf.synth_se(n=n, lengthscale=0.1, noise_sd=0.1, seed=11)
    x = jnp.asarray(x, jnp.float32)
    k = gpf.SquaredExponentialKernel()
    p = {"lengthscale": jnp.asarray(0.1, jnp.float32)}
    noise = jnp.float32(0.01)

    rng = np.random.default_rng(0)

    def garbage_qr(A, max_rows=4096):
        nn, mm = A.shape
        return (
            jnp.asarray(rng.standard_normal((nn, mm)) * 1e3, A.dtype),
            jnp.asarray(rng.standard_normal((mm, mm)), A.dtype),
        )

    monkeypatch.setattr(mbcg_mod, "tall_qr", garbage_qr)
    P_inv, W_b, sv, d_rng, log_P = build_preconditioner(k, p, x, m, noise)
    # basis zeroed -> P^-1 v = v / sigma^2 and log|P| = n log sigma^2
    assert float(jnp.max(jnp.abs(W_b))) == 0.0
    v = jnp.asarray(rng.standard_normal(n), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(P_inv(v)), np.asarray(v) / float(noise), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(log_P), n * np.log(float(noise)), rtol=1e-4
    )
    # and the healthy path keeps a live basis (guard must not over-fire)
    monkeypatch.undo()
    _, W_ok, sv_ok, _, log_ok = build_preconditioner(k, p, x, m, noise)
    assert float(jnp.max(jnp.abs(W_ok))) > 0.0
    assert float(log_ok) > n * np.log(float(noise))
