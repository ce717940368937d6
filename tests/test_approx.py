"""Approximate-inference tests: Nyström/Woodbury, SKI, SVGP (SURVEY.md §3.4)."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.linalg import cholesky as chol
from gaussianprocessfundamentals_tpu.linalg.nystroem import (
    nystroem_factor,
    nystroem_logdet,
    nystroem_mll,
    nystroem_posterior,
    woodbury_solve,
)
from gaussianprocessfundamentals_tpu.linalg.ski import ski_factor, ski_matvec, ski_mll
from gaussianprocessfundamentals_tpu.models.svgp import (
    collapsed_elbo,
    fit_svgp,
    svgp_predict,
)

K_SE = gpf.SquaredExponentialKernel()


def _data(n=120, seed=0):
    x, y = gpf.synth_se(n=n, lengthscale=0.2, noise_sd=0.1, seed=seed)
    return jnp.asarray(x), jnp.asarray(y)


def test_woodbury_matches_dense():
    x, y = _data()
    p = {"lengthscale": jnp.asarray(0.2)}
    z = x[::6]
    noise = 0.1
    st = nystroem_factor(K_SE, p, x, z, noise, 1e-10)
    # dense K̂ = A Aᵀ
    Khat = np.asarray(st.A @ st.A.T)
    expected = np.linalg.solve(Khat + noise * np.eye(len(y)), np.asarray(y))
    got = np.asarray(woodbury_solve(st, y))
    np.testing.assert_allclose(got, expected, atol=1e-7)
    # determinant lemma
    sign, ld = np.linalg.slogdet(Khat + noise * np.eye(len(y)))
    np.testing.assert_allclose(float(nystroem_logdet(st, len(y))), ld, rtol=1e-6)


def test_nystroem_mll_approaches_exact_with_all_inducing():
    x, y = _data(80)
    p = {"lengthscale": jnp.asarray(0.2)}
    noise = 0.1
    exact = float(chol.mll(K_SE.gram(p, x, x), y, noise, 1e-8))
    approx = float(nystroem_mll(K_SE, p, x, y, x, noise, 1e-8))
    np.testing.assert_allclose(approx, exact, rtol=1e-3)


def test_titsias_bound_is_lower_bound():
    x, y = _data(100)
    p = {"lengthscale": jnp.asarray(0.2)}
    noise = 0.1
    exact = float(chol.mll(K_SE.gram(p, x, x), y, noise, 1e-8))
    for m in (10, 25, 50):
        bound = float(collapsed_elbo(K_SE, p, x, y, x[:: len(x) // m], noise, 1e-8))
        # small slack: at m→n the bound approaches equality and f64 rounding
        # in the two very different computation paths dominates
        assert bound <= exact + 1e-5 * abs(exact) + 1e-5, (m, bound, exact)


def test_nystroem_posterior_close_to_exact():
    x, y = _data(150)
    xs = jnp.linspace(0, 1, 30)[:, None].astype(x.dtype)
    p = {"lengthscale": jnp.asarray(0.2)}
    noise = 0.05
    mu_a, var_a = nystroem_posterior(K_SE, p, x, y, x[::3], xs, noise, 1e-8)
    st = chol.factor(K_SE.gram(p, x, x), y, noise, 1e-8)
    mu_e = chol.posterior_mean(st, K_SE.gram(p, x, xs))
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_e), atol=0.05)
    assert np.all(np.asarray(var_a) >= 0)


def test_ski_matvec_matches_dense():
    x, y = _data(60)
    grid = jnp.linspace(-0.05, 1.05, 40)[:, None].astype(x.dtype)
    p = {"lengthscale": jnp.asarray(0.2)}
    st = ski_factor(K_SE, p, x, grid)
    # dense W
    W = np.zeros((60, 40))
    idx, w = np.asarray(st.idx), np.asarray(st.w)
    for i in range(60):
        W[i, idx[i, 0]] += w[i, 0]
        W[i, idx[i, 1]] += w[i, 1]
    dense = W @ np.asarray(st.K_mm) @ W.T + 0.3 * np.eye(60)
    got = np.asarray(ski_matvec(st, 0.3, y))
    np.testing.assert_allclose(got, dense @ np.asarray(y), atol=1e-8)
    np.testing.assert_allclose(W.sum(1), 1.0, atol=1e-9)


def test_ski_mll_reasonable():
    x, y = _data(100)
    grid = jnp.linspace(-0.05, 1.05, 64)[:, None].astype(x.dtype)
    p = {"lengthscale": jnp.asarray(0.2)}
    approx = float(ski_mll(K_SE, p, x, y, grid, 0.1, 1e-8))
    assert np.isfinite(approx)
    # the CG data-fit term against K̂ must be tight: compare to a dense solve
    # of the SKI matrix (the logdet is intentionally crude — the reference's
    # eigenvalue-scaling approximation, StructuredKernelInterpolation.py:52-62)
    st = ski_factor(K_SE, p, x, grid)
    W = np.zeros((100, 64))
    idx, w = np.asarray(st.idx), np.asarray(st.w)
    for i in range(100):
        W[i, idx[i, 0]] += w[i, 0]
        W[i, idx[i, 1]] += w[i, 1]
    dense = W @ np.asarray(st.K_mm) @ W.T + (0.1 + 1e-8) * np.eye(100)
    from gaussianprocessfundamentals_tpu.linalg.ski import ski_logdet_approx
    from gaussianprocessfundamentals_tpu.linalg.cholesky import LOG_2PI

    alpha = np.linalg.solve(dense, np.asarray(y))
    expected = (
        -0.5 * np.asarray(y) @ alpha
        - 0.5 * float(ski_logdet_approx(st, 100, 0.1 + 1e-8))
        - 0.5 * 100 * LOG_2PI
    )
    np.testing.assert_allclose(approx, expected, rtol=1e-5)


def test_svgp_fit_learns(key):
    x, y = _data(400, seed=3)
    params, hist = fit_svgp(
        gpf.SquaredExponentialKernel(scaled=True), x, y,
        m=32, steps=400, batch_size=128, key=key,
    )
    assert float(hist[-1]) < float(hist[0])
    fm, fv = svgp_predict(gpf.SquaredExponentialKernel(scaled=True), params, x)
    mse = float(jnp.mean((fm - y) ** 2))
    assert mse < 0.1, mse
    assert np.all(np.asarray(fv) >= 0)


def test_toeplitz_matvec_matches_dense():
    from gaussianprocessfundamentals_tpu.linalg.ski import toeplitz_matvec

    rng = np.random.default_rng(0)
    grid = jnp.linspace(0, 1, 33)[:, None]
    col = K_SE.gram({"lengthscale": jnp.asarray(0.2)}, grid, grid[:1])[:, 0]
    T = np.asarray(K_SE.gram({"lengthscale": jnp.asarray(0.2)}, grid, grid))
    v = jnp.asarray(rng.standard_normal((33, 2)))
    got = np.asarray(toeplitz_matvec(col, v))
    np.testing.assert_allclose(got, T @ np.asarray(v), atol=1e-8)
    got1 = np.asarray(toeplitz_matvec(col, v[:, 0]))
    np.testing.assert_allclose(got1, T @ np.asarray(v[:, 0]), atol=1e-8)


def test_ski_toeplitz_matches_dense_ski():
    from gaussianprocessfundamentals_tpu.linalg.ski import (
        ski_matvec_toeplitz,
        ski_interp,
        ski_mll_toeplitz,
    )

    x, y = _data(80)
    grid = jnp.linspace(-0.05, 1.05, 32)[:, None].astype(x.dtype)
    p = {"lengthscale": jnp.asarray(0.2)}
    st = ski_factor(K_SE, p, x, grid)
    idx, w = ski_interp(x, grid)
    col = K_SE.gram(p, grid, grid[:1])[:, 0]
    got = np.asarray(ski_matvec_toeplitz(idx, w, col, 0.3, y))
    want = np.asarray(ski_matvec(st, 0.3, y))
    np.testing.assert_allclose(got, want, atol=1e-8)
    mll_t = float(ski_mll_toeplitz(K_SE, p, x, y, grid, 0.1, 1e-8))
    assert np.isfinite(mll_t)


def test_svgp_f32_stable(key):
    """f32 SVGP regression (r2): jitter floor + NaN-guard must survive
    inducing-point collisions during optimisation (TPU-native precision)."""
    from gaussianprocessfundamentals_tpu.models.svgp import svgp_predict

    rng = np.random.default_rng(0)
    n = 3000
    x = jnp.asarray(rng.uniform(0, 1, (n, 1)), jnp.float32)
    y = jnp.asarray(
        np.sin(12 * np.asarray(x)[:, 0]) + 0.1 * rng.standard_normal(n),
        jnp.float32,
    )
    params, hist = fit_svgp(
        gpf.SquaredExponentialKernel(scaled=True), x, y,
        m=64, steps=400, batch_size=2048, key=key,
    )
    h = np.asarray(hist)
    assert np.isnan(h).sum() == 0
    assert h[-1] < h[0]
    fm, _ = svgp_predict(gpf.SquaredExponentialKernel(scaled=True), params, x)
    assert float(jnp.mean((fm - y) ** 2)) < 0.1 * float(jnp.var(y))


def test_ski_interp_knn_d2_matches_reference_weights():
    """Generic-d SKI weights (r2 VERDICT missing #3) vs a NumPy re-derivation
    of the reference formula (StructuredKernelInterpolation.py:32-49):
    two nearest inducing points, weight_1 = 1 − d1/(d1+d2)."""
    from gaussianprocessfundamentals_tpu.linalg.ski import ski_interp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (50, 2)))
    grid = jnp.asarray(rng.uniform(0, 1, (12, 2)))
    idx, w = ski_interp(x, grid)
    idx, w = np.asarray(idx), np.asarray(w)
    D = np.linalg.norm(np.asarray(x)[:, None, :] - np.asarray(grid)[None], axis=-1)
    for i in range(50):
        order = np.argsort(D[i])
        assert set(idx[i]) == set(order[:2]), i
        d1, d2 = D[i, order[0]], D[i, order[1]]
        w_ref = {order[0]: 1 - d1 / (d1 + d2), order[1]: d1 / (d1 + d2)}
        for j, wj in zip(idx[i], w[i]):
            np.testing.assert_allclose(wj, w_ref[j], atol=1e-10)
    np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-12)


def test_ski_d2_matvec_matches_dense():
    """d=2 SKI matvec vs dense W·K_mm·Wᵀ (r2 VERDICT item 6 done-criterion)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (40, 2)))
    grid = jnp.asarray(rng.uniform(0, 1, (15, 2)))
    p = {"lengthscale": jnp.asarray(0.4)}
    st = ski_factor(K_SE, p, x, grid)
    W = np.zeros((40, 15))
    idx, w = np.asarray(st.idx), np.asarray(st.w)
    for i in range(40):
        W[i, idx[i, 0]] += w[i, 0]
        W[i, idx[i, 1]] += w[i, 1]
    dense = W @ np.asarray(st.K_mm) @ W.T + 0.2 * np.eye(40)
    v = jnp.asarray(rng.standard_normal(40))
    got = np.asarray(ski_matvec(st, 0.2, v))
    np.testing.assert_allclose(got, dense @ np.asarray(v), atol=1e-8)
    mll = float(ski_mll(K_SE, p, x, v, grid, 0.2, 1e-8))
    assert np.isfinite(mll)


def test_nystroem_posterior_colliding_inducing_finite():
    """Regression (r4): a fit with optimize_inducing can leave inducing
    points ~1e-7 apart; K_mm is then numerically singular in f32 and the
    Cholesky NaN'd even with the jitter floor, silently poisoning every
    downstream posterior. The device-side jitter escalation must keep the
    factor — and the posterior — finite."""
    import jax.numpy as jnp

    from gaussianprocessfundamentals_tpu.linalg.nystroem import (
        nystroem_factor,
        nystroem_posterior,
    )

    x, y = gpf.synth_se(n=400, lengthscale=0.2, noise_sd=0.1, seed=7)
    x, y = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    k = gpf.SquaredExponentialKernel()
    p = {"lengthscale": jnp.float32(0.05)}
    base = x[:: 400 // 16][:16]
    z = jnp.concatenate([base, base + 5e-7], axis=0)  # collided pairs
    st = nystroem_factor(k, p, x, z, jnp.float32(0.005), 1e-8)
    assert bool(jnp.isfinite(st.L_mm).all())
    assert bool(jnp.isfinite(st.L_core).all())
    xt = jnp.linspace(0.0, 1.0, 50)[:, None].astype(jnp.float32)
    mu, var = nystroem_posterior(k, p, x, y, z, xt, jnp.float32(0.005), 1e-8)
    assert bool(jnp.isfinite(mu).all()) and bool(jnp.isfinite(var).all())
    assert bool((var >= 0).all())
