"""Numerical-equivalence tests for the linear-algebra core against NumPy/SciPy
f64 oracles (SURVEY.md §4.1/4.3)."""
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.linalg import cholesky as chol
from gaussianprocessfundamentals_tpu.linalg.cg import cg_solve_dense


def _problem(n=30, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 1, (n, 1)), axis=0)
    d2 = (x - x.T) ** 2
    K = np.exp(-0.5 * d2 / 0.04)
    y = rng.standard_normal(n)
    return x, K, y


def test_nll_matches_direct():
    _, K, y = _problem()
    noise, jitter = 0.1, 1e-8
    Kn = K + (noise + jitter) * np.eye(len(y))
    sign, logdet = np.linalg.slogdet(Kn)
    expected = -(
        -0.5 * y @ np.linalg.solve(Kn, y)
        - 0.5 * logdet
        - 0.5 * len(y) * np.log(2 * np.pi)
    )
    got = float(chol.nll(jnp.asarray(K), jnp.asarray(y), noise, jitter))
    np.testing.assert_allclose(got, expected, rtol=3e-8)


def test_factor_alpha_and_logdet():
    _, K, y = _problem()
    st = chol.factor(jnp.asarray(K), jnp.asarray(y), 0.05, 1e-8)
    Kn = K + (0.05 + 1e-8) * np.eye(len(y))
    np.testing.assert_allclose(np.asarray(st.alpha), np.linalg.solve(Kn, y), rtol=1e-8)
    np.testing.assert_allclose(float(st.logdet), np.linalg.slogdet(Kn)[1], rtol=3e-8)


def test_posterior_matches_textbook():
    rng = np.random.default_rng(1)
    x, K, y = _problem(40)
    xs = np.linspace(0, 1, 15)[:, None]
    d2s = (x - xs.T) ** 2
    Ks = np.exp(-0.5 * d2s / 0.04)
    d2ss = (xs - xs.T) ** 2
    Kss = np.exp(-0.5 * d2ss / 0.04)
    noise = 0.1
    Kn = K + noise * np.eye(len(y))
    mu_expected = Ks.T @ np.linalg.solve(Kn, y)
    cov_expected = Kss - Ks.T @ np.linalg.solve(Kn, Ks)

    st = chol.factor(jnp.asarray(K), jnp.asarray(y), noise, 0.0)
    mu = chol.posterior_mean(st, jnp.asarray(Ks))
    cov = chol.posterior_cov(st, jnp.asarray(Ks), jnp.asarray(Kss))
    var = chol.posterior_var(st, jnp.asarray(Ks), jnp.asarray(np.diag(Kss)))
    np.testing.assert_allclose(np.asarray(mu), mu_expected, atol=1e-8)
    np.testing.assert_allclose(np.asarray(cov), cov_expected, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var), np.diag(cov_expected), atol=1e-8)


def test_batched_factor():
    _, K1, y1 = _problem(20, seed=0)
    _, K2, y2 = _problem(20, seed=1)
    Kb = jnp.stack([jnp.asarray(K1), jnp.asarray(K2)])
    yb = jnp.stack([jnp.asarray(y1), jnp.asarray(y2)])
    nll_b = np.asarray(chol.nll(Kb, yb, 0.1, 1e-8))
    for i, (K, y) in enumerate([(K1, y1), (K2, y2)]):
        np.testing.assert_allclose(
            nll_b[i], float(chol.nll(jnp.asarray(K), jnp.asarray(y), 0.1, 1e-8)),
            rtol=3e-8,
        )


def test_cg_matches_direct_solve():
    _, K, y = _problem(50)
    A = K + 0.5 * np.eye(50)
    x_direct = np.linalg.solve(A, y)
    x_cg = np.asarray(cg_solve_dense(jnp.asarray(A), jnp.asarray(y), tol=1e-10, max_iters=500))
    np.testing.assert_allclose(x_cg, x_direct, atol=1e-6)


def test_gp_end_to_end_posterior_matches_oracle():
    """Full-stack parity: GaussianProcess posterior vs a NumPy oracle with
    identical jitter/noise conventions (the 1e-3 north-star check at f64)."""
    rng = np.random.default_rng(3)
    n = 60
    x = np.sort(rng.uniform(0, 1, (n, 1)), axis=0)
    y = np.sin(6 * x[:, 0]) + 0.05 * rng.standard_normal(n)
    xs = np.linspace(0, 1, 25)[:, None]
    ls, noise, jitter = 0.15, 0.01, 1e-8

    gp = gpf.GaussianProcess(gpf.SquaredExponentialKernel())
    gp.set_data(jnp.asarray(x), jnp.asarray(y))
    gp.kernel_params = {"lengthscale": jnp.asarray(ls)}
    gp.mean_params = {}
    gp.noise = noise
    post = gp.posterior(jnp.asarray(xs))

    d2 = (x - x.T) ** 2
    K = np.exp(-0.5 * d2 / ls**2)
    Ks = np.exp(-0.5 * (x - xs.T) ** 2 / ls**2)
    Kss = np.exp(-0.5 * (xs - xs.T) ** 2 / ls**2)
    Kn = K + (noise + jitter) * np.eye(n)
    mu_o = Ks.T @ np.linalg.solve(Kn, y)
    var_o = np.diag(Kss - Ks.T @ np.linalg.solve(Kn, Ks))
    np.testing.assert_allclose(np.asarray(post.mean), mu_o, atol=1e-6)
    np.testing.assert_allclose(np.asarray(post.var), var_o, atol=1e-6)


def test_mll_custom_vjp_matches_autodiff():
    """chol.mll's closed-form VJP (½(ααᵀ−Kn⁻¹) one-solve backward) must match
    differentiating through the factorisation, including the noise gradient
    (which flows through noised()) and batched inputs."""
    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    from gaussianprocessfundamentals_tpu.linalg import cholesky as chol

    rng = np.random.default_rng(5)
    n = 80
    A = rng.standard_normal((n, n))
    K0 = jnp.asarray(A @ A.T / n)
    y = jnp.asarray(rng.standard_normal(n))

    def mll_auto(K, noise):
        Kn = chol.noised(K, noise, 1e-8)
        L = jnp.linalg.cholesky(Kn)
        z = solve_triangular(L, y[:, None], lower=True)
        alpha = solve_triangular(L, z, lower=True, trans=1)[:, 0]
        logdet = 2 * jnp.sum(jnp.log(jnp.diag(L)))
        return -0.5 * jnp.sum(y * alpha) - 0.5 * logdet - 0.5 * n * chol.LOG_2PI

    def mll_custom(K, noise):
        return chol.mll(K, y, noise, 1e-8)

    v1, (gK1, gn1) = jax.value_and_grad(mll_auto, argnums=(0, 1))(K0, 0.1)
    v2, (gK2, gn2) = jax.value_and_grad(mll_custom, argnums=(0, 1))(K0, 0.1)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gK1), np.asarray(gK2), atol=1e-10)
    np.testing.assert_allclose(float(gn1), float(gn2), rtol=1e-9)

    # batched leading dim
    Kb = jnp.stack([K0, 2.0 * K0])
    yb = jnp.stack([y, -y])
    f = lambda K: jnp.sum(chol.mll(K, yb, 0.05, 1e-8))
    g = jax.grad(f)(Kb)
    assert g.shape == Kb.shape and np.all(np.isfinite(np.asarray(g)))


def test_slq_sanitizes_nonfinite_coefficients():
    """f32 overflow on catastrophically conditioned K can leave inf/NaN in
    the CG α/β recurrence; the SLQ tridiagonal assembly must degrade those
    columns to identity rows (biased estimate) instead of returning NaN."""
    import numpy as np
    from gaussianprocessfundamentals_tpu.linalg.mbcg import (
        slq_logdet,
        slq_logdet_host,
    )

    t, r = 6, 4
    rng = np.random.default_rng(0)
    alphas = np.abs(rng.standard_normal((t, r))) + 0.5
    betas = np.abs(rng.standard_normal((t, r))) * 0.1
    alphas[3, 1] = np.nan
    betas[2, 2] = np.inf
    zw = np.full((r,), 10.0)
    v_dev = float(slq_logdet(jnp.asarray(alphas), jnp.asarray(betas),
                             jnp.asarray(zw), 10))
    v_host = slq_logdet_host(alphas, betas, zw, 10)
    assert np.isfinite(v_dev) and np.isfinite(v_host)


class TestPivotedCholesky:
    """linalg/pivchol.py — the iterative path's preconditioner factor."""

    def _x(self, n, d=1, seed=0):
        import numpy as np

        rng = np.random.default_rng(seed)
        return jnp.asarray(np.sort(rng.uniform(0, 1, (n, d)), 0))

    def test_full_rank_reconstructs(self):
        import numpy as np

        import gaussianprocessfundamentals_tpu as gpf
        from gaussianprocessfundamentals_tpu.linalg.pivchol import (
            partial_pivoted_cholesky,
        )

        x = self._x(80)
        k = gpf.Matern52Kernel(scaled=True)
        p = {"lengthscale": jnp.asarray(0.2), "variance": jnp.asarray(1.5)}
        K = np.asarray(k.gram(p, x, x))
        L = np.asarray(partial_pivoted_cholesky(k, p, x, 80))
        np.testing.assert_allclose(L @ L.T, K, atol=1e-8)

    def test_low_rank_dominates_spectrum_and_psd(self):
        import numpy as np

        import gaussianprocessfundamentals_tpu as gpf
        from gaussianprocessfundamentals_tpu.linalg.pivchol import (
            partial_pivoted_cholesky,
        )

        x = self._x(300)
        k = gpf.SquaredExponentialKernel()
        p = {"lengthscale": jnp.asarray(0.1)}
        K = np.asarray(k.gram(p, x, x))
        L = np.asarray(partial_pivoted_cholesky(k, p, x, 64))
        # SE at ls=0.1 has numerical rank far below 64: near-exact capture,
        # and the greedy bound err ≤ trace of the remaining diagonal
        rel = np.linalg.norm(L @ L.T - K) / np.linalg.norm(K)
        assert rel < 1e-3, rel
        # K − LLᵀ must stay PSD (pivoted Cholesky is a PSD Schur complement)
        w = np.linalg.eigvalsh(K - L @ L.T)
        assert w.min() > -1e-6, w.min()

    def test_rank_beyond_numerical_rank_freezes(self):
        import numpy as np

        import gaussianprocessfundamentals_tpu as gpf
        from gaussianprocessfundamentals_tpu.linalg.pivchol import (
            partial_pivoted_cholesky,
        )

        # LinearKernel has exact rank 2: columns beyond it must be zero,
        # not NaN from a sqrt of a zero/negative pivot
        x = self._x(50)
        k = gpf.LinearKernel()
        p = k.init_params([[0.0, 1.0]], 50)
        L = np.asarray(partial_pivoted_cholesky(k, p, x, 8))
        assert np.all(np.isfinite(L))
        K = np.asarray(k.gram(p, x, x))
        np.testing.assert_allclose(L @ L.T, K, atol=1e-8)
        # residual pivots beyond the true rank are f64 round-off (~1e-16
        # diag), so trailing columns are ~√eps-tiny, not necessarily exact 0
        assert np.abs(L[:, 3:]).max() < 1e-6


def test_mbcg_one_step_convergence_records_best_iterate():
    """Regression (r3 advisor, medium): a column converging on the very step
    where the rz<=0 freeze fires must still record its iterate — with an
    identity matvec, CG converges exactly in one step; the old gating on the
    post-rz `done` returned the ZERO solve with resid == ||b||."""
    import jax.numpy as jnp

    from gaussianprocessfundamentals_tpu.linalg.mbcg import mbcg

    rng = np.random.default_rng(5)
    B = jnp.asarray(rng.standard_normal((16, 3)))
    for early_exit in (False, True):
        res = mbcg(lambda V: V, B, max_iters=10, tol=1e-10,
                   early_exit=early_exit)
        np.testing.assert_allclose(np.asarray(res.solves), np.asarray(B),
                                   rtol=1e-12, atol=1e-12)
        assert np.all(np.asarray(res.resid_norm) < 1e-10)


def test_mbcg_transient_excursion_does_not_freeze():
    """Regression (r3 advisor, low): a single transient residual-2-norm
    excursion past 4x best must NOT permanently freeze a column; CG on an
    ill-conditioned SPD system must still converge to its floor."""
    import jax.numpy as jnp

    from gaussianprocessfundamentals_tpu.linalg.mbcg import mbcg

    rng = np.random.default_rng(6)
    n = 64
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.geomspace(1e-6, 1.0, n)
    A = jnp.asarray(Q @ np.diag(w) @ Q.T)
    b = jnp.asarray(rng.standard_normal((n, 1)))
    res = mbcg(lambda V: A @ V, b, max_iters=400, tol=1e-12)
    rel = float(res.resid_norm[0]) / float(np.linalg.norm(np.asarray(b)))
    # unfrozen textbook CG reaches ~5.5e-4 best relative residual on this
    # system in 400 iterations (measured); the freeze must not do worse than
    # ~2x that — the old single-excursion freeze stopped at ~6e-3
    assert rel < 1.5e-3, rel


def test_tall_qr_matches_householder_grade():
    """r5: one-level TSQR (``tall_qr``) replaces XLA:TPU's batched Householder
    QR in vmapped preconditioner builds (18x slowdown, BENCHMARKS.md r5).
    Orthogonality and reconstruction must be Householder-grade, including the
    zero-pad path (n not divisible by max_rows) and under vmap."""
    import jax
    import jax.numpy as jnp

    from gaussianprocessfundamentals_tpu.linalg.mbcg import tall_qr

    rng = np.random.default_rng(0)
    for n, m in ((9000, 32), (4096, 16)):  # 9000 % 2048 != 0 -> pad path
        A = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
        Q, R = tall_qr(A, max_rows=2048)
        assert Q.shape == (n, m) and R.shape == (m, m)
        eye = jnp.eye(m, dtype=Q.dtype)
        assert float(jnp.max(jnp.abs(Q.T @ Q - eye))) < 1e-5
        rec = float(jnp.max(jnp.abs(Q @ R - A)) / jnp.max(jnp.abs(A)))
        assert rec < 1e-5
        # R upper-triangular (combine-QR output)
        assert float(jnp.max(jnp.abs(jnp.tril(R, -1)))) == 0.0
    # vmapped batch must equal the per-item results (the lax.map block loop
    # becomes a scan over small-row batched QRs -- the fast batched regime)
    Ab = jnp.asarray(rng.standard_normal((3, 4096, 16)), jnp.float32)
    Qb, Rb = jax.vmap(lambda a: tall_qr(a, max_rows=1024))(Ab)
    for i in range(3):
        Qi, Ri = tall_qr(Ab[i], max_rows=1024)
        np.testing.assert_array_equal(np.asarray(Qb[i]), np.asarray(Qi))
        np.testing.assert_array_equal(np.asarray(Rb[i]), np.asarray(Ri))
