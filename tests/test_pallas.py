"""Pallas Gram kernels vs the XLA builder (interpret mode on CPU; the same
kernels run compiled on TPU — validated by bench/TPU smoke runs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.ops.pallas_gram import matern_gram, se_gram


def _x(n, d=1, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, (n, d)), jnp.float32)


@pytest.mark.parametrize("n,m,d", [(64, 64, 1), (100, 80, 3), (256, 256, 2)])
def test_se_gram_matches_xla(n, m, d):
    x1, x2 = _x(n, d, 0), _x(m, d, 1)
    got = np.asarray(se_gram(x1, x2, 0.3, 1.5, interpret=True))
    ref = np.asarray(
        gpf.SquaredExponentialKernel(dim=d, scaled=True).gram(
            {"lengthscale": jnp.float32(0.3), "variance": jnp.float32(1.5)}, x1, x2
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_se_gram_fused_diagonal():
    x = _x(96, 1)
    got = np.asarray(se_gram(x, x, 0.3, 1.0, diag_add=0.7, interpret=True))
    ref = np.asarray(
        gpf.SquaredExponentialKernel().gram({"lengthscale": jnp.float32(0.3)}, x, x)
    ) + 0.7 * np.eye(96, dtype=np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_matern_gram_matches_formula():
    import math

    x1, x2 = _x(64, 1, 0), _x(64, 1, 1)
    for nu, c in (("32", math.sqrt(3)), ("52", math.sqrt(5))):
        got = np.asarray(matern_gram(x1, x2, 0.25, nu=nu, interpret=True))
        d = np.abs(np.asarray(x1) - np.asarray(x2).T)
        f = c * d / 0.25
        ref = (1 + f) * np.exp(-f)
        if nu == "52":
            ref = (1 + f + 5 * d * d / (3 * 0.25**2)) * np.exp(-f)
        np.testing.assert_allclose(got, ref, atol=5e-5)


@pytest.mark.parametrize("n,d,r,kind", [(300, 1, 5, "se"), (64, 3, 2, "se"),
                                        (200, 1, 3, "mat52"),
                                        (128, 1, 1, "mat32")])
def test_fused_gram_matvec_matches_streamed(n, d, r, kind):
    """Fused VMEM-tile K·V vs the dense K @ V oracle (interpret mode)."""
    from gaussianprocessfundamentals_tpu.ops.pallas_gram import (
        fused_gram_matvec,
    )

    rng = np.random.default_rng(0)
    x = _x(n, d, 0)
    V = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
    got = np.asarray(fused_gram_matvec(x, V, 0.3, 1.4, kind=kind,
                                       interpret=True))
    kmap = {"se": gpf.SquaredExponentialKernel(scaled=True),
            "mat32": gpf.Matern32Kernel(scaled=True),
            "mat52": gpf.Matern52Kernel(scaled=True)}
    K = np.asarray(kmap[kind].gram(
        {"lengthscale": jnp.float32(0.3), "variance": jnp.float32(1.4)}, x, x))
    np.testing.assert_allclose(got, K @ np.asarray(V), rtol=2e-4, atol=2e-4)


def test_fused_matvec_for_dispatch():
    from gaussianprocessfundamentals_tpu.ops.pallas_gram import fused_matvec_for

    x1 = _x(64, 1)
    x3 = _x(64, 3)
    p = {"lengthscale": jnp.float32(0.3)}
    # supported combinations (interpret forces eligibility off-TPU)
    assert fused_matvec_for(gpf.SquaredExponentialKernel(), p, x1,
                            interpret=True) is not None
    assert fused_matvec_for(gpf.Matern52Kernel(), p, x1, interpret=True) is not None
    # Matérn d>1 is Manhattan in the reference — the scalar-kind Euclidean
    # tiles must not serve it, but since r4 the expr AST engine (exact
    # per-dim Manhattan) DOES: it must route AND match the XLA oracle
    mv3 = fused_matvec_for(gpf.Matern52Kernel(), p, x3, interpret=True)
    assert mv3 is not None
    V3 = jnp.asarray(
        np.random.default_rng(0).standard_normal((64, 2)), jnp.float32
    )
    want3 = jnp.matmul(
        gpf.Matern52Kernel().gram(p, x3, x3), V3,
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(
        np.asarray(mv3(V3)), np.asarray(want3), rtol=2e-5, atol=2e-5
    )
    # composite kernels route through the expr engine too (r4)
    comp = gpf.SquaredExponentialKernel() + gpf.LinearKernel()
    cp = comp.init_params([[0.0, 1.0]], 64)
    assert fused_matvec_for(comp, cp, x1, interpret=True) is not None
    # off-TPU (no interpret): no routing
    assert fused_matvec_for(gpf.SquaredExponentialKernel(), p, x1) is None


@pytest.mark.parametrize("n,d,r,kind,scaled", [
    (300, 1, 7, "se", True), (70, 3, 4, "se", False),
    (200, 1, 5, "mat52", True), (128, 1, 3, "mat32", False),
])
def test_fused_lowrank_vjp_matches_autodiff(n, d, r, kind, scaled):
    """One-pass analytic in-tile gradient vs the streamed autodiff VJP."""
    import jax

    from gaussianprocessfundamentals_tpu.ops.gram_matvec import (
        lowrank_gram_vjp,
    )
    from gaussianprocessfundamentals_tpu.ops.pallas_gram import (
        fused_lowrank_vjp_for,
    )

    rng = np.random.default_rng(1)
    x = _x(n, d, 0)
    U = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
    kmap = {"se": gpf.SquaredExponentialKernel, "mat32": gpf.Matern32Kernel,
            "mat52": gpf.Matern52Kernel}
    kern = kmap[kind](scaled=scaled)
    p = {"lengthscale": jnp.float32(0.3)}
    if scaled:
        p["variance"] = jnp.float32(1.4)
    fused = fused_lowrank_vjp_for(kern, p, x, interpret=True)
    assert fused is not None
    got = fused(U, W)
    ref = lowrank_gram_vjp(kern, p, x, U, W, block=64)
    assert set(got) == set(ref)
    # same pytree structure as params (required by the tree_map in iterative)
    jax.tree_util.tree_map(lambda a, b: None, got, p)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=3e-3, atol=3e-3)


def test_fused_lowrank_vjp_dispatch():
    from gaussianprocessfundamentals_tpu.ops.pallas_gram import (
        fused_lowrank_vjp_for,
    )

    x1, x3 = _x(64, 1), _x(64, 3)
    p = {"lengthscale": jnp.float32(0.3)}
    assert fused_lowrank_vjp_for(gpf.SquaredExponentialKernel(), p, x3,
                                 interpret=True) is not None
    # Matérn d>1 routes through the expr AST engine since r4 (exact per-dim
    # Manhattan; correctness covered by test_pallas_expr + the on-TPU gate)
    assert fused_lowrank_vjp_for(gpf.Matern32Kernel(), p, x3,
                                 interpret=True) is not None
    assert fused_lowrank_vjp_for(gpf.SquaredExponentialKernel(), p, x1) is None
