"""On-TPU Pallas numeric gate: every Pallas kernel vs its XLA oracle ON CHIP.

Exists because interpret-mode CI tests run f32-exact on CPU and CANNOT catch
on-chip numerics bugs — the r3 MXU-bf16 truncation (default-precision in-tile
``jnp.dot`` cancelling catastrophically in the distance expansion) shipped
through a green interpret-mode suite and floored CG residuals at O(1) on real
hardware. This gate is the automated form of the r3 ad-hoc bench runs
(r4 VERDICT "next round" item 3): run it on the real chip each round, FAIL on
tolerance breach, record the result in BENCHMARKS.md.

Usage:  python benchmarks/check_pallas_tpu.py          # full gate (TPU)
        python benchmarks/check_pallas_tpu.py --quick  # small sizes only

Exit code 0 = all kernels within tolerance; 1 = breach (details on stderr).
``tests/test_pallas_tpu.py`` wraps the same checks as pytest cases gated on
``jax.default_backend() == "tpu"``.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = max(float(np.max(np.abs(b))), 1e-30)
    return float(np.max(np.abs(a - b))) / denom


def run_checks(quick: bool = False, interpret: bool = False):
    """Yield (name, rel_err, tol, ok) for every Pallas kernel vs XLA oracle.

    ``interpret=True`` runs the same sweep in interpret mode (CPU CI smoke of
    the harness itself; the real gate is on TPU where MXU/VPU rounding and
    the Mosaic lowering differ from the interpreter).
    """
    import jax
    import jax.numpy as jnp

    import gaussianprocessfundamentals_tpu as gpf
    from gaussianprocessfundamentals_tpu.ops import pallas_gram as pg

    hp = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    n = 1024 if quick else 4096
    n_big = 4096 if quick else 65536  # accumulation-depth check (gradients)
    r = 8

    def mk(n, d):
        return jnp.asarray(
            np.sort(rng.uniform(0, 1, (n, d)), axis=0), jnp.float32
        )

    checks = []

    # --- Gram builders (se any-d, matern d=1) vs XLA kernel.gram ---------
    for name, build, kernel, params, d in [
        (
            "se_gram_d1",
            lambda x: pg.se_gram(x, x, 0.1, 1.3, 0.25, interpret=interpret),
            gpf.SquaredExponentialKernel(scaled=True),
            {"lengthscale": jnp.float32(0.1), "variance": jnp.float32(1.3)},
            1,
        ),
        (
            "se_gram_d3",
            lambda x: pg.se_gram(x, x, 0.1, 1.3, 0.25, interpret=interpret),
            gpf.SquaredExponentialKernel(scaled=True),
            {"lengthscale": jnp.float32(0.1), "variance": jnp.float32(1.3)},
            3,
        ),
        (
            "matern32_gram_d1",
            lambda x: pg.matern_gram(
                x, x, 0.1, 1.0, 0.25, nu="32", interpret=interpret
            ),
            gpf.Matern32Kernel(),
            {"lengthscale": jnp.float32(0.1)},
            1,
        ),
        (
            "matern52_gram_d1",
            lambda x: pg.matern_gram(
                x, x, 0.1, 1.0, 0.25, nu="52", interpret=interpret
            ),
            gpf.Matern52Kernel(),
            {"lengthscale": jnp.float32(0.1)},
            1,
        ),
    ]:
        x = mk(n, d)
        got = jax.device_get(build(x))
        want = jax.device_get(
            kernel.gram(params, x, x)
            + 0.25 * jnp.eye(n, dtype=jnp.float32)
        )
        err = _rel(got, want)
        # d=1 tiles use exact VPU differences; d>1 shares the oracle's own
        # MXU expansion, so agreement is tight in both cases
        checks.append((name, err, 2e-5, err < 2e-5))

    # --- fused matvec (square + cross) vs K@V at HIGHEST ------------------
    for kind, kernel, params in [
        ("se", gpf.SquaredExponentialKernel(), {"lengthscale": jnp.float32(0.1)}),
        ("mat32", gpf.Matern32Kernel(), {"lengthscale": jnp.float32(0.1)}),
        ("mat52", gpf.Matern52Kernel(), {"lengthscale": jnp.float32(0.1)}),
    ]:
        x = mk(n, 1)
        V = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
        got = jax.device_get(
            pg.fused_gram_matvec(x, V, 0.1, 1.0, kind=kind, interpret=interpret)
        )
        want = jax.device_get(
            jnp.matmul(kernel.gram(params, x, x), V, precision=hp)
        )
        err = _rel(got, want)
        checks.append((f"fused_matvec_{kind}", err, 5e-5, err < 5e-5))

    # cross (rectangular, non-tile-aligned n1): the mesh-sharded panel unit
    x1 = mk(n // 2 + 40, 1)
    x2 = mk(n, 1)
    V = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
    k_se = gpf.SquaredExponentialKernel()
    p_se = {"lengthscale": jnp.float32(0.1)}
    got = jax.device_get(
        pg.fused_gram_matvec_cross(x1, x2, V, 0.1, 1.0, kind="se",
                                   interpret=interpret)
    )
    want = jax.device_get(
        jnp.matmul(k_se.gram(p_se, x1, x2), V, precision=hp)
    )
    err = _rel(got, want)
    checks.append(("fused_matvec_cross_se", err, 5e-5, err < 5e-5))

    # --- SE with d=3 matvec (MXU expansion path) --------------------------
    x3 = mk(n, 3)
    got = jax.device_get(
        pg.fused_gram_matvec(x3, V, 0.2, 1.0, kind="se", interpret=interpret)
    )
    want = jax.device_get(
        jnp.matmul(k_se.gram(p_se | {"lengthscale": jnp.float32(0.2)}, x3, x3),
                   V, precision=hp)
    )
    err = _rel(got, want)
    checks.append(("fused_matvec_se_d3", err, 5e-4, err < 5e-4))

    # --- fused low-rank VJP vs autodiff oracle, small AND large n ---------
    for nn, label in [(n, "n"), (n_big, "nbig")]:
        x = mk(nn, 1)
        rr = 4
        U = jnp.asarray(rng.standard_normal((nn, rr)) / nn, jnp.float32)
        W = jnp.asarray(rng.standard_normal((nn, rr)), jnp.float32)
        for kind, kernel, ls in [
            ("se", gpf.SquaredExponentialKernel(scaled=True), 0.1),
            ("mat52", gpf.Matern52Kernel(scaled=True), 0.1),
        ]:
            params = {
                "lengthscale": jnp.float32(ls),
                "variance": jnp.float32(1.2),
            }
            g_ls, g_var = jax.device_get(
                pg.fused_lowrank_vjp(
                    x, U, W, params["lengthscale"], params["variance"],
                    kind=kind, interpret=interpret,
                )
            )
            if nn <= 8192:
                def total(p):
                    K = kernel.gram(p, x, x)
                    return jnp.sum(
                        K * jnp.matmul(U, W.T, precision=hp)
                    )

                g = jax.device_get(jax.grad(total)(params))
                err_ls = abs(float(g_ls) - float(g["lengthscale"])) / max(
                    abs(float(g["lengthscale"])), 1e-20
                )
                err_var = abs(float(g_var) - float(g["variance"])) / max(
                    abs(float(g["variance"])), 1e-20
                )
                err = max(err_ls, err_var)
                checks.append(
                    (f"fused_lrvjp_{kind}_{label}", err, 1e-3, err < 1e-3)
                )
            else:
                # autodiff oracle at 65k would need the dense K; use the
                # streamed XLA low-rank VJP as the oracle instead
                from gaussianprocessfundamentals_tpu.ops.gram_matvec import (
                    lowrank_gram_vjp,
                )

                g = jax.device_get(
                    lowrank_gram_vjp(kernel, params, x, U, W, block=4096)
                )
                err_ls = abs(float(g_ls) - float(g["lengthscale"])) / max(
                    abs(float(g["lengthscale"])), 1e-20
                )
                err_var = abs(float(g_var) - float(g["variance"])) / max(
                    abs(float(g["variance"])), 1e-20
                )
                err = max(err_ls, err_var)
                checks.append(
                    (f"fused_lrvjp_{kind}_{label}", err, 3e-3, err < 3e-3)
                )

    # cross VJP (rectangular) vs autodiff
    x1 = mk(n // 4 + 24, 1)
    x2 = mk(n, 1)
    U = jnp.asarray(rng.standard_normal((x1.shape[0], 4)) / n, jnp.float32)
    W = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    p_sc = {"lengthscale": jnp.float32(0.1), "variance": jnp.float32(1.2)}
    k_sc = gpf.SquaredExponentialKernel(scaled=True)
    g_ls, g_var = jax.device_get(
        pg.fused_lowrank_vjp_cross(
            x1, x2, U, W, p_sc["lengthscale"], p_sc["variance"], kind="se",
            interpret=interpret,
        )
    )
    g = jax.device_get(
        jax.grad(
            lambda p: jnp.sum(
                k_sc.gram(p, x1, x2) * jnp.matmul(U, W.T, precision=hp)
            )
        )(p_sc)
    )
    err = max(
        abs(float(g_ls) - float(g["lengthscale"]))
        / max(abs(float(g["lengthscale"])), 1e-20),
        abs(float(g_var) - float(g["variance"]))
        / max(abs(float(g["variance"])), 1e-20),
    )
    checks.append(("fused_lrvjp_cross_se", err, 1e-3, err < 1e-3))

    # --- composite AST engine (pallas_expr): flagship Mauna Loa composite,
    # ARD SE, and the in-kernel self-differentiated VJP — the jax.grad-in-
    # tile lowering is exactly the kind of thing only real Mosaic can vet --
    from gaussianprocessfundamentals_tpu.ops import pallas_expr as pe

    mauna = (
        gpf.SquaredExponentialKernel(scaled=True) * gpf.PeriodicKernel()
        + gpf.SquaredExponentialKernel()
        + gpf.LinearKernel()
        + gpf.WhiteNoiseKernel(scaled=True)
    )
    xm = mk(n, 1)
    pm = mauna.init_params([[0.0, 1.0]], n, dtype=jnp.float32)
    Vm = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
    mv = pe.expr_matvec_for(mauna, pm, xm, interpret=interpret)
    if mv is None:
        checks.append(("expr_matvec_mauna_routed", 1.0, 0.0, False))
    else:
        got = jax.device_get(mv(Vm))
        want = jax.device_get(
            jnp.matmul(mauna.gram(pm, xm, xm), Vm, precision=hp)
        )
        err = _rel(got, want)
        checks.append(("expr_matvec_mauna", err, 5e-5, err < 5e-5))

    k_ard = gpf.SquaredExponentialKernel(scaled=True)
    x_ard = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    p_ard = {
        "lengthscale": jnp.asarray([0.2, 0.3, 0.4], jnp.float32),
        "variance": jnp.float32(1.5),
    }
    mv = pe.expr_matvec_for(k_ard, p_ard, x_ard, interpret=interpret)
    if mv is None:
        checks.append(("expr_matvec_ard_routed", 1.0, 0.0, False))
    else:
        got = jax.device_get(mv(Vm))
        want = jax.device_get(
            jnp.matmul(k_ard.gram(p_ard, x_ard, x_ard), Vm, precision=hp)
        )
        err = _rel(got, want)
        checks.append(("expr_matvec_ard_d3", err, 5e-5, err < 5e-5))

    Um = jnp.asarray(rng.standard_normal((n, 4)) / n, jnp.float32)
    Wm = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    vjp = pe.expr_lowrank_vjp_for(mauna, pm, xm, interpret=interpret)
    if vjp is None:
        checks.append(("expr_vjp_mauna_routed", 1.0, 0.0, False))
    else:
        got_g = jax.device_get(vjp(Um, Wm))
        want_g = jax.device_get(
            jax.grad(
                lambda p: jnp.sum(
                    mauna.gram(p, xm, xm)
                    * jnp.matmul(Um, Wm.T, precision=hp)
                )
            )(pm)
        )
        lg = jax.tree_util.tree_leaves(got_g)
        lw = jax.tree_util.tree_leaves(want_g)
        err = max(
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            / max(float(np.max(np.abs(np.asarray(b)))), 1e-20)
            for a, b in zip(lg, lw)
        )
        checks.append(("expr_vjp_mauna", err, 3e-3, err < 3e-3))

    # --- preconditioned-CG health at scale (r4 regression gate): at n=50k,
    # ℓ=range/10, σ²=1e-2, the single-projection P⁻¹ made rᵀP⁻¹r NEGATIVE on
    # the first CG step (f32 matmul-rounding range contamination × sv²
    # amplification) and every solve froze at relative residual exactly 1.0
    # — a failure only real-chip rounding exhibits at this n. The
    # twice-is-enough complement projection must keep solves converging. --
    if not quick:
        from gaussianprocessfundamentals_tpu.linalg.mbcg import mbcg
        from gaussianprocessfundamentals_tpu.models.iterative import (
            build_preconditioner,
        )
        from gaussianprocessfundamentals_tpu.ops.gram_matvec import (
            gram_matvec,
        )

        np_ = 50_000
        xp_ = mk(np_, 1)
        yp_ = jnp.asarray(
            np.sin(8 * np.asarray(xp_)[:, 0])
            + 0.1 * rng.standard_normal(np_),
            jnp.float32,
        )
        kp_ = gpf.SquaredExponentialKernel()
        pp_ = {"lengthscale": jnp.float32(0.1)}
        noise_ = jnp.float32(0.01)

        @jax.jit
        def pcg_health():
            P_inv, W_b, sv, d_rng, _ = build_preconditioner(
                kp_, pp_, xp_, 256, noise_
            )
            import jax.random as jrr

            ku, kw = jrr.split(jrr.PRNGKey(0))
            u = jrr.normal(ku, (np_, 4), jnp.float32)
            w = jrr.normal(kw, (256, 4), jnp.float32)
            z = jnp.sqrt(noise_) * u + jnp.matmul(
                W_b, sv[:, None] * w,
                precision=jax.lax.Precision.HIGHEST,
            )
            B = jnp.concatenate([yp_[:, None], z], axis=1)
            mv = lambda V: gram_matvec(kp_, pp_, xp_, V, 4096) + noise_ * V
            res = mbcg(mv, B, max_iters=30, tol=3e-3, precond=P_inv,
                       early_exit=True)
            return res.resid_norm / jnp.linalg.norm(B, axis=0)

        rel = jax.device_get(pcg_health())
        err = float(np.max(np.asarray(rel)))
        checks.append(("pcg_precond_50k", err, 0.05, err < 0.05))

    # --- every leaf kernel's diag/gram consistency ON CHIP (r4 VERDICT item
    # 8): diag(params, x) must equal diagonal(gram(params, x, x)) under real
    # f32 rounding for each leaf (the WhiteNoise d²≤0 bug was exactly a
    # diag-vs-gram inconsistency only visible on-chip) ---
    xl = mk(512, 2)
    leaf_cases = [
        ("const", gpf.ConstantKernel(), {"c": jnp.float32(1.3)}),
        ("wn", gpf.WhiteNoiseKernel(), {}),
        ("lin", gpf.LinearKernel(),
         {"offset": jnp.asarray([0.4, 0.6], jnp.float32)}),
        ("se", gpf.SquaredExponentialKernel(scaled=True),
         {"lengthscale": jnp.float32(0.2), "variance": jnp.float32(1.4)}),
        ("per", gpf.PeriodicKernel(),
         {"lengthscale": jnp.float32(0.5), "period": jnp.float32(0.3)}),
        ("mat32", gpf.Matern32Kernel(), {"lengthscale": jnp.float32(0.2)}),
        ("mat52", gpf.Matern52Kernel(), {"lengthscale": jnp.float32(0.2)}),
        ("rq", gpf.RationalQuadraticKernel(),
         {"lengthscale": jnp.float32(0.2), "alpha": jnp.float32(0.7)}),
    ]
    for name, kl, pl in leaf_cases:
        # ONE batched transfer per leaf (tunnel round trips are ~28 ms each)
        dg, dd = jax.device_get(
            (jnp.diagonal(kl.gram(pl, xl, xl)), kl.diag(pl, xl))
        )
        err = _rel(dg, dd)
        # distance-expansion rounding can leave tiny positive d² on the
        # diagonal: tolerance covers exp/poly of that, not semantic drift
        checks.append((f"leaf_diag_{name}", err, 1e-4, err < 1e-4))

    # --- WhiteNoise coincidence on-chip (r3 VERDICT weak #6): duplicated
    # rows must be detected as coincident in f32 on the real rounding path --
    xw = mk(256, 3)
    xw = jnp.concatenate([xw, xw[:64] + 0.0], axis=0)  # rows 256+j ≡ rows j
    wn = gpf.WhiteNoiseKernel()
    Kw = jax.device_get(wn.gram({}, xw, xw[:64]))
    # each of the 64 test columns coincides with exactly two rows (original
    # + duplicate); with the old d²≤0 expansion test, f32 rounding silently
    # dropped ~20% of these hits
    want_hits = 128
    hits = int(np.sum(np.asarray(Kw) > 0.5))
    ok = hits == want_hits
    checks.append(("whitenoise_coincidence_d3", float(hits), want_hits, ok))

    # --- N=50k posterior VARIANCE vs the f64 CPU oracle (r4 VERDICT missing
    # #3 / next-round #1): the on-chip df32 energy-form variances must land
    # within 1e-3·k_ii of the f64 Toeplitz/FFT oracle in the cancellation
    # regime (true var ~7e-6·k_ii at this density — far below the old
    # naive-f32 floor of ~1e-3·k_ii). This is the north-star clause
    # "posterior moments matching gpbasics to 1e-3" for variances. ---
    if not quick:
        from gaussianprocessfundamentals_tpu.models.iterative import (
            iterative_posterior,
        )
        from gaussianprocessfundamentals_tpu.utils.toeplitz_oracle import (
            se_grid_posterior_oracle,
        )

        n50, ell50, nz50 = 50_000, 0.05, 1e-2
        rng50 = np.random.default_rng(1)
        xs50 = rng50.uniform(0.05, 0.95, 32)
        g50 = np.arange(n50) / (n50 - 1)
        y50 = np.sin(2 * np.pi * 3 * g50) + 0.1 * rng50.standard_normal(n50)
        mu_t, var_t, orc_rel = se_grid_posterior_oracle(
            n50, ell50, nz50, xs50, y50
        )
        assert orc_rel < 1e-10, orc_rel  # the oracle itself must converge
        k50 = gpf.SquaredExponentialKernel()
        p50 = {"lengthscale": jnp.float32(ell50)}
        mu_i, var_i = jax.device_get(iterative_posterior(
            k50, p50, jnp.asarray(g50.astype(np.float32)[:, None]),
            jnp.asarray(y50, jnp.float32),
            jnp.asarray(xs50[:, None], jnp.float32), jnp.float32(nz50),
            max_iters=100, block=4096, tol=1e-7, precond_m=256,
        ))
        verr = float(np.max(np.abs(np.asarray(var_i, np.float64) - var_t)))
        checks.append(("posterior_var_50k_vs_f64_oracle", verr, 1e-3,
                       verr < 1e-3))

    return checks


def main() -> int:
    import jax

    quick = "--quick" in sys.argv
    interpret = "--interpret" in sys.argv
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    if not interpret and backend != "tpu":
        print(f"SKIP: backend={backend}, the gate needs a TPU "
              f"(use --interpret for the CPU harness smoke)", file=sys.stderr)
        return 0
    checks = run_checks(quick=quick, interpret=interpret)
    bad = [c for c in checks if not c[3]]
    for name, err, tol, ok in checks:
        print(f"{'PASS' if ok else 'FAIL'} {name}: err={err:.3g} tol={tol:.3g}")
    if bad:
        print(f"{len(bad)} Pallas kernels OUT OF TOLERANCE on {backend}",
              file=sys.stderr)
        return 1
    print(f"pallas gate OK on {backend}: {len(checks)} checks")
    return 0


if __name__ == "__main__":
    sys.exit(main())
