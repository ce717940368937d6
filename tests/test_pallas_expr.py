"""In-tile AST engine (``ops.pallas_expr``): composite/ARD fused tiles.

Interpret-mode here (formula/indexing correctness); on-chip rounding is
covered by the gate (``benchmarks/check_pallas_tpu.py`` /
``tests/test_pallas_tpu.py``) per the repo's Pallas rule.
"""
import jax
import jax.numpy as jnp
import numpy as np

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.ops import pallas_expr as pe

HP = jax.lax.Precision.HIGHEST


def _x(n, d, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.sort(rng.uniform(0, 1, (n, d)), axis=0), jnp.float32)


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.max(np.abs(a - b)) / max(1e-30, np.max(np.abs(b))))


MAUNA = (
    gpf.SquaredExponentialKernel(scaled=True) * gpf.PeriodicKernel()
    + gpf.SquaredExponentialKernel()
    + gpf.LinearKernel()
    + gpf.WhiteNoiseKernel(scaled=True)
)


def test_split_white_noise():
    p = MAUNA.init_params([[0.0, 1.0]], 100, dtype=jnp.float32)
    core, core_p, wn = pe.split_white_noise(MAUNA, p)
    assert len(core.children) == 3
    np.testing.assert_allclose(
        float(wn), float(p["children"][3]["variance"])
    )
    # no WN: passthrough
    k2 = gpf.SquaredExponentialKernel()
    p2 = {"lengthscale": jnp.float32(0.1)}
    c2, cp2, wn2 = pe.split_white_noise(k2, p2)
    assert c2 is k2 and wn2 == 0.0


def test_composite_matvec_matches_dense():
    """The flagship Mauna Loa composite (SE·PER + SE + LIN + WN) routes and
    matches the dense K@V (r4 VERDICT item 4)."""
    x = _x(700, 1)
    p = MAUNA.init_params([[0.0, 1.0]], 700, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    V = jnp.asarray(rng.standard_normal((700, 4)), jnp.float32)
    mv = pe.expr_matvec_for(MAUNA, p, x, interpret=True)
    assert mv is not None
    want = jnp.matmul(MAUNA.gram(p, x, x), V, precision=HP)
    assert _rel(mv(V), want) < 1e-5


def test_ard_se_matvec():
    """Per-dimension (ARD) lengthscales — excluded from the scalar-leaf
    kernels — are exact in the per-dim tile walk."""
    k = gpf.SquaredExponentialKernel(scaled=True)
    x = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (600, 3)), jnp.float32
    )
    p = {
        "lengthscale": jnp.asarray([0.2, 0.3, 0.4], jnp.float32),
        "variance": jnp.float32(1.5),
    }
    V = jnp.asarray(
        np.random.default_rng(3).standard_normal((600, 4)), jnp.float32
    )
    mv = pe.expr_matvec_for(k, p, x, interpret=True)
    assert mv is not None
    want = jnp.matmul(k.gram(p, x, x), V, precision=HP)
    assert _rel(mv(V), want) < 1e-5


def test_composite_vjp_matches_autodiff():
    """In-kernel self-differentiation of the tile body == dense autodiff,
    including the algebraic WhiteNoise variance gradient."""
    x = _x(700, 1, seed=4)
    p = MAUNA.init_params([[0.0, 1.0]], 700, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    U = jnp.asarray(rng.standard_normal((700, 3)) / 700, jnp.float32)
    W = jnp.asarray(rng.standard_normal((700, 3)), jnp.float32)
    vjp = pe.expr_lowrank_vjp_for(MAUNA, p, x, interpret=True)
    assert vjp is not None
    got = vjp(U, W)
    want = jax.grad(
        lambda pp: jnp.sum(
            MAUNA.gram(pp, x, x) * jnp.matmul(U, W.T, precision=HP)
        )
    )(p)
    lg = jax.tree_util.tree_leaves(got)
    lw = jax.tree_util.tree_leaves(want)
    assert len(lg) == len(lw)
    for a, b in zip(lg, lw):
        assert _rel(a, b) < 1e-3


def test_cross_matvec_and_vjp_rectangular():
    """The mesh-panel (rectangular) forms match dense on non-tile-aligned
    shapes."""
    k = gpf.RationalQuadraticKernel() + gpf.Matern32Kernel(scaled=True)
    x1 = _x(300, 2, seed=6)
    x2 = _x(540, 2, seed=7)
    p = k.init_params([[0.0, 1.0], [0.0, 1.0]], 540, dtype=jnp.float32)
    rng = np.random.default_rng(8)
    V = jnp.asarray(rng.standard_normal((540, 3)), jnp.float32)
    mv = pe.expr_matvec_cross_for(k, p, x1, x2, interpret=True)
    assert mv is not None
    want = jnp.matmul(k.gram(p, x1, x2), V, precision=HP)
    assert _rel(mv(V), want) < 1e-5

    U = jnp.asarray(rng.standard_normal((300, 3)) / 300, jnp.float32)
    vjp = pe.expr_lowrank_vjp_cross_for(k, p, x1, x2, interpret=True)
    assert vjp is not None
    got = vjp(U, V)
    want_g = jax.grad(
        lambda pp: jnp.sum(
            k.gram(pp, x1, x2) * jnp.matmul(U, V.T, precision=HP)
        )
    )(p)
    for a, b in zip(
        jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want_g)
    ):
        assert _rel(a, b) < 1e-3


def test_unsupported_returns_none():
    """ChangePoint operators and f64 inputs fall back (None) rather than
    producing wrong tiles."""
    from gaussianprocessfundamentals_tpu.kernels.operators import ChangePoint

    cp = ChangePoint(
        children=(gpf.SquaredExponentialKernel(), gpf.Matern32Kernel())
    )
    x = _x(100, 1)
    p = cp.init_params([[0.0, 1.0]], 100, dtype=jnp.float32)
    assert pe.expr_matvec_for(cp, p, x, interpret=True) is None
    x64 = _x(100, 1).astype(jnp.float64)
    k = gpf.SquaredExponentialKernel()
    assert (
        pe.expr_matvec_for(k, {"lengthscale": jnp.float64(0.1)}, x64,
                           interpret=True)
        is None
    )


def test_gram_matvec_routes_composite_interpret():
    """ops.gram_matvec's router reaches the expr engine for composites (the
    production entry point of the iterative path)."""
    from gaussianprocessfundamentals_tpu.ops.pallas_gram import (
        fused_matvec_for,
    )

    x = _x(300, 1, seed=9)
    p = MAUNA.init_params([[0.0, 1.0]], 300, dtype=jnp.float32)
    mv = fused_matvec_for(MAUNA, p, x, interpret=True)
    assert mv is not None
    rng = np.random.default_rng(10)
    V = jnp.asarray(rng.standard_normal((300, 2)), jnp.float32)
    want = jnp.matmul(MAUNA.gram(p, x, x), V, precision=HP)
    assert _rel(mv(V), want) < 1e-5


def test_wn_gradient_exact_on_duplicated_rows():
    """Review regression (r4): the WhiteNoise variance gradient must use the
    EXACT coincidence cotangent, matching the forward's exact-equality Gram
    on duplicated input rows (the diagonal-only sum is biased there)."""
    k = gpf.SquaredExponentialKernel() + gpf.WhiteNoiseKernel(scaled=True)
    base = _x(60, 2, seed=11)
    x = jnp.concatenate([base, base[:20]], axis=0)  # 20 duplicated rows
    p = {
        "children": (
            {"lengthscale": jnp.float32(0.3)},
            {"variance": jnp.float32(0.5)},
        )
    }
    rng = np.random.default_rng(12)
    U = jnp.asarray(rng.standard_normal((80, 3)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((80, 3)), jnp.float32)
    vjp = pe.expr_lowrank_vjp_for(k, p, x, interpret=True)
    assert vjp is not None
    got = vjp(U, W)
    want = jax.grad(
        lambda pp: jnp.sum(
            k.gram(pp, x, x) * jnp.matmul(U, W.T, precision=HP)
        )
    )(p)
    g_wn = float(got["children"][1]["variance"])
    w_wn = float(want["children"][1]["variance"])
    # with 20 duplicated rows the off-diagonal coincident terms are a large
    # fraction of the gradient — the old diag-only sum missed them entirely
    diag_only = float(jnp.sum(U * W))
    assert abs(g_wn - w_wn) / abs(w_wn) < 1e-4, (g_wn, w_wn)
    assert abs(diag_only - w_wn) / abs(w_wn) > 0.05  # proves the case matters
