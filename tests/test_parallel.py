"""Distributed tests on the fake 8-device CPU mesh (SURVEY.md §4.4):
sharded Gram panels, distributed CG, dp-sharded restart fitting, and the
graft dry run — the same code paths that run on a real slice."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import gaussianprocessfundamentals_tpu as gpf
from gaussianprocessfundamentals_tpu.linalg import cholesky as chol
from gaussianprocessfundamentals_tpu.parallel.meshes import make_mesh, single_axis_mesh
from gaussianprocessfundamentals_tpu.parallel.sharded import (
    sharded_cg_solve,
    sharded_gram,
    sharded_nll,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

K_SE = gpf.SquaredExponentialKernel()
P_SE = {"lengthscale": jnp.asarray(0.2)}


def _data(n=64):
    x, y = gpf.synth_se(n=n, lengthscale=0.2, noise_sd=0.1, seed=0)
    return jnp.asarray(x), jnp.asarray(y)


def test_sharded_gram_matches_local():
    x, _ = _data()
    mesh = single_axis_mesh("tp")
    with mesh:
        K = jax.jit(lambda x: sharded_gram(K_SE, P_SE, x, mesh))(x)
    np.testing.assert_allclose(
        np.asarray(K), np.asarray(K_SE.gram(P_SE, x, x)), atol=1e-10
    )
    # rows must actually be sharded over the tp axis
    shard_shapes = {s.data.shape for s in K.addressable_shards}
    assert shard_shapes == {(64 // 8, 64)}, shard_shapes


def test_sharded_nll_matches_local():
    x, y = _data()
    mesh = single_axis_mesh("tp")
    with mesh:
        nll_sharded = jax.jit(
            lambda: sharded_nll(K_SE, P_SE, x, y, 0.1, 1e-8, mesh)
        )()
    nll_local = chol.nll(K_SE.gram(P_SE, x, x), y, 0.1, 1e-8)
    np.testing.assert_allclose(float(nll_sharded), float(nll_local), rtol=1e-8)


def test_sharded_cg_matches_direct():
    x, y = _data()
    mesh = single_axis_mesh("tp")
    with mesh:
        v = jax.jit(
            lambda: sharded_cg_solve(K_SE, P_SE, x, y, 0.5, 1e-8, mesh, tol=1e-10)
        )()
    Kn = np.asarray(K_SE.gram(P_SE, x, x)) + (0.5 + 1e-8) * np.eye(64)
    np.testing.assert_allclose(np.asarray(v), np.linalg.solve(Kn, np.asarray(y)), atol=1e-6)


def test_sharded_nll_gradient_matches_local():
    x, y = _data()
    mesh = single_axis_mesh("tp")

    def f_sharded(p):
        return sharded_nll(K_SE, p, x, y, 0.1, 1e-8, mesh)

    def f_local(p):
        return chol.nll(K_SE.gram(p, x, x), y, 0.1, 1e-8)

    with mesh:
        g_s = jax.jit(jax.grad(f_sharded))(P_SE)
    g_l = jax.grad(f_local)(P_SE)
    np.testing.assert_allclose(
        float(g_s["lengthscale"]), float(g_l["lengthscale"]), rtol=1e-6
    )


def test_dp_tp_mesh_training_step():
    """2×4 mesh: restarts on dp, covariance rows on tp — the full multi-chip
    training step the driver dry-runs."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_hmc_chains_shard_over_mesh(key):
    """Chains sharded one-per-device over an 8-way dp mesh produce the same
    statistics as unsharded vmap (BASELINE config 3 sharding)."""
    import jax.random as jr

    from gaussianprocessfundamentals_tpu.mcmc.hmc import hmc_chains

    logprob = lambda q: -0.5 * jnp.sum(q["x"] ** 2)
    q0s = {"x": jnp.zeros((8, 2))}
    keys = jr.split(key, 8)
    mesh = single_axis_mesh("dp")
    dp = NamedSharding(mesh, P("dp"))
    q0s_sharded = jax.device_put(q0s, NamedSharding(mesh, P("dp", None)))
    keys_sharded = jax.device_put(keys, dp)
    with mesh:
        res = hmc_chains(
            logprob, q0s_sharded, keys_sharded,
            num_samples=200, num_warmup=100, num_leapfrog=8,
        )
    s = np.asarray(res.samples["x"])  # [chains, samples, 2]
    assert s.shape[0] == 8
    np.testing.assert_allclose(s.mean(), 0.0, atol=0.2)
    np.testing.assert_allclose(s.std(), 1.0, atol=0.2)


def test_iterative_nll_mesh_sharded(key):
    """Mesh-sharded iterative exact GP matches the single-device result and
    actually shards the K panels (multi-chip large-N path)."""
    import jax.numpy as jnp

    from gaussianprocessfundamentals_tpu.models.iterative import (
        iterative_nll_and_grad,
    )

    x, y = gpf.synth_se(n=96, lengthscale=0.2, noise_sd=0.3, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(y)
    k = gpf.SquaredExponentialKernel()
    p = {"lengthscale": jnp.asarray(0.2)}
    nll0, g0, gn0, r0 = iterative_nll_and_grad(
        k, p, x, y, 0.3, key, num_probes=8, max_iters=120, block=32
    )
    mesh = single_axis_mesh("tp")
    with mesh:
        nll1, g1, gn1, r1 = iterative_nll_and_grad(
            k, p, x, y, 0.3, key, num_probes=8, max_iters=120, block=32,
            mesh=mesh,
        )
    np.testing.assert_allclose(float(nll1), float(nll0), rtol=1e-5)
    np.testing.assert_allclose(
        float(g1["lengthscale"]), float(g0["lengthscale"]), rtol=1e-4
    )


def test_hmc_collective_step_size(key):
    """shard_map chains with psum-averaged warmup acceptance: all chains end
    with the SAME adapted step size and still sample correctly."""
    import jax.random as jr

    from gaussianprocessfundamentals_tpu.mcmc.hmc import hmc_chains_collective

    logprob = lambda q: -0.5 * jnp.sum(q["x"] ** 2)
    mesh = single_axis_mesh("dp")
    q0s = {"x": jnp.zeros((8, 2))}
    keys = jr.split(key, 8)
    res = hmc_chains_collective(
        logprob, q0s, keys, mesh, axis="dp",
        num_samples=300, num_warmup=200, num_leapfrog=8,
    )
    eps = np.asarray(res.step_size).reshape(-1)
    np.testing.assert_allclose(eps, eps[0], rtol=1e-6)  # shared step size
    s = np.asarray(res.samples["x"])
    np.testing.assert_allclose(s.mean(), 0.0, atol=0.2)
    np.testing.assert_allclose(s.std(), 1.0, atol=0.2)


def test_nuts_collective_step_size(key):
    import jax.random as jr

    from gaussianprocessfundamentals_tpu.mcmc.nuts import nuts_chains_collective

    logprob = lambda q: -0.5 * jnp.sum(q["x"] ** 2)
    mesh = single_axis_mesh("dp")
    q0s = {"x": jnp.zeros((8, 2))}
    keys = jr.split(key, 8)
    res = nuts_chains_collective(
        logprob, q0s, keys, mesh, axis="dp",
        num_samples=200, num_warmup=200, max_depth=5,
    )
    eps = np.asarray(res.step_size).reshape(-1)
    np.testing.assert_allclose(eps, eps[0], rtol=1e-6)
    s = np.asarray(res.samples["x"])
    np.testing.assert_allclose(s.mean(), 0.0, atol=0.2)
    np.testing.assert_allclose(s.std(), 1.0, atol=0.2)


def test_mesh_gram_matvec_matches_dense():
    """Sharded streaming matvec (no resident K panels) is exact vs dense."""
    from gaussianprocessfundamentals_tpu.parallel.mesh_matvec import (
        mesh_gram_matvec,
    )

    x, _ = _data(n=100)  # NOT divisible by 8: exercises the pad path
    rng = np.random.default_rng(1)
    V = jnp.asarray(rng.standard_normal((100, 5)))
    K = K_SE.gram(P_SE, x, x)
    want = np.asarray(K @ V)
    mesh = single_axis_mesh("tp")
    with mesh:
        got = np.asarray(mesh_gram_matvec(K_SE, P_SE, x, V, mesh, "tp", 16))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    # vector form
    with mesh:
        got1 = np.asarray(mesh_gram_matvec(K_SE, P_SE, x, V[:, 0], mesh, "tp", 16))
    np.testing.assert_allclose(got1, want[:, 0], rtol=1e-10, atol=1e-12)


def test_mesh_lowrank_vjp_matches_autodiff():
    """Sharded low-rank cotangent gradient == dense autodiff gradient."""
    from gaussianprocessfundamentals_tpu.parallel.mesh_matvec import (
        mesh_lowrank_vjp,
    )

    x, _ = _data(n=72)
    rng = np.random.default_rng(2)
    U = jnp.asarray(rng.standard_normal((72, 3)))
    W = jnp.asarray(rng.standard_normal((72, 3)))
    k = gpf.SquaredExponentialKernel(scaled=True)
    p = {"lengthscale": jnp.asarray(0.25), "variance": jnp.asarray(0.7)}
    want = jax.grad(
        lambda pp: jnp.sum(k.gram(pp, x, x) * (U @ W.T))
    )(p)
    mesh = single_axis_mesh("tp")
    with mesh:
        got = mesh_lowrank_vjp(k, p, x, U, W, mesh, "tp", 16)
    for name in want:
        np.testing.assert_allclose(
            float(got[name]), float(want[name]), rtol=1e-8
        )


def test_iterative_mesh_streaming_no_materialize(key):
    """The default mesh path is STREAMING (no resident K row panels): NLL and
    gradient match both the single-device iterative result and the explicit
    materialized-panel mesh path at n≈2k (r4 VERDICT item 1's criterion)."""
    from gaussianprocessfundamentals_tpu.models.iterative import (
        iterative_nll_and_grad,
    )

    x, y = gpf.synth_se(n=2048, lengthscale=0.2, noise_sd=0.3, seed=3)
    x, y = jnp.asarray(x), jnp.asarray(y)
    nll0, g0, gn0, r0 = iterative_nll_and_grad(
        K_SE, P_SE, x, y, 0.3, key, num_probes=8, max_iters=150, block=512
    )
    mesh = single_axis_mesh("tp")
    with mesh:
        nll1, g1, gn1, r1 = iterative_nll_and_grad(
            K_SE, P_SE, x, y, 0.3, key, num_probes=8, max_iters=150,
            block=512, mesh=mesh,
        )
        nll2, g2, gn2, _ = iterative_nll_and_grad(
            K_SE, P_SE, x, y, 0.3, key, num_probes=8, max_iters=150,
            block=512, mesh=mesh, materialize=True,
        )
    np.testing.assert_allclose(float(nll1), float(nll0), rtol=1e-5)
    np.testing.assert_allclose(
        float(g1["lengthscale"]), float(g0["lengthscale"]), rtol=1e-4
    )
    np.testing.assert_allclose(float(gn1), float(gn0), rtol=1e-4)
    np.testing.assert_allclose(float(nll2), float(nll1), rtol=1e-5)
    np.testing.assert_allclose(
        float(g2["lengthscale"]), float(g1["lengthscale"]), rtol=1e-4
    )


def test_fit_iterative_mesh_streaming(key):
    """fit_iterative(mesh=...) runs the sharded streaming path end-to-end and
    learns (NLL decreases, nothing frozen)."""
    from gaussianprocessfundamentals_tpu.models.iterative import fit_iterative

    x, y = gpf.synth_se(n=128, lengthscale=0.2, noise_sd=0.3, seed=4)
    x, y = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    mesh = single_axis_mesh("tp")
    with mesh:
        kp, noise, hist, diag = fit_iterative(
            gpf.SquaredExponentialKernel(), x, y, key, steps=10, lr=0.1,
            num_probes=4, max_iters=100, block=32, mesh=mesh,
            precond_m=16, return_diagnostics=True,
        )
    hist = np.asarray(hist)
    assert np.all(np.isfinite(hist))
    assert hist[-1] < hist[0]
    assert diag["frozen_frac"] < 0.5


def test_mesh_early_exit_stops_and_matches(key):
    """mBCG's while_loop early exit works UNDER A MESH (r4 VERDICT weak #6:
    multi-chip solves used to always run max_iters): the mesh-sharded matvec
    inside the while_loop body compiles and executes, stops well before
    max_iters on a converged problem, and matches the fixed-length scan."""
    from gaussianprocessfundamentals_tpu.linalg.mbcg import mbcg
    from gaussianprocessfundamentals_tpu.models.iterative import (
        iterative_nll_and_grad,
    )
    from gaussianprocessfundamentals_tpu.parallel.mesh_matvec import (
        mesh_gram_matvec,
    )

    x, y = gpf.synth_se(n=1024, lengthscale=0.2, noise_sd=0.3, seed=5)
    x, y = jnp.asarray(x), jnp.asarray(y)
    noise = 0.3
    mesh = single_axis_mesh("tp")
    B = jnp.stack([y, y * 0.5], axis=1)
    with mesh:
        mv = lambda V: mesh_gram_matvec(K_SE, P_SE, x, V, mesh, "tp", 256) + noise * V
        res_ee = jax.jit(
            lambda B: mbcg(mv, B, max_iters=400, tol=1e-9, early_exit=True)
        )(B)
        res_fx = jax.jit(
            lambda B: mbcg(mv, B, max_iters=400, tol=1e-9, early_exit=False)
        )(B)
    assert int(res_ee.iters) < 400  # actually exited early
    np.testing.assert_allclose(
        np.asarray(res_ee.solves), np.asarray(res_fx.solves), atol=1e-8
    )
    # composed program: mesh NLL+grad with early exit matches fixed-length
    with mesh:
        nll_ee, g_ee, gn_ee, _ = iterative_nll_and_grad(
            K_SE, P_SE, x, y, noise, key, max_iters=150, block=256,
            mesh=mesh, early_exit=True,
        )
        nll_fx, g_fx, gn_fx, _ = iterative_nll_and_grad(
            K_SE, P_SE, x, y, noise, key, max_iters=150, block=256,
            mesh=mesh, early_exit=False,
        )
    np.testing.assert_allclose(float(nll_ee), float(nll_fx), rtol=1e-6)
    np.testing.assert_allclose(
        float(g_ee["lengthscale"]), float(g_fx["lengthscale"]), rtol=1e-5
    )
    np.testing.assert_allclose(float(gn_ee), float(gn_fx), rtol=1e-5)


def test_iterative_posterior_chunked_mesh_matches_single():
    """r5: the chunked posterior runs its solves over a mesh (prediction
    scales over chips like training) and matches the single-device result."""
    from gaussianprocessfundamentals_tpu.models.iterative import (
        iterative_posterior_chunked,
    )

    rng_l = np.random.default_rng(0)
    n = 2000
    x = jnp.asarray(np.sort(rng_l.uniform(0, 1, (n, 1)), 0), jnp.float32)
    y = jnp.asarray(np.sin(6 * np.asarray(x)[:, 0])
                    + 0.1 * rng_l.standard_normal(n), jnp.float32)
    xs = jnp.asarray(rng_l.uniform(0.1, 0.9, (40, 1)), jnp.float32)
    k = gpf.SquaredExponentialKernel()
    p = {"lengthscale": jnp.float32(0.2)}
    mu0, v0 = iterative_posterior_chunked(
        k, p, x, y, xs, jnp.float32(0.01), block=512, precond_m=64,
    )
    mesh = single_axis_mesh("tp")
    mu1, v1 = iterative_posterior_chunked(
        k, p, x, y, xs, jnp.float32(0.01), block=512, precond_m=64,
        mesh=mesh, mesh_axis="tp",
    )
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=5e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), atol=1e-6)
