"""Modified batched conjugate gradients (mBCG) + stochastic Lanczos logdet.

The TPU-first replacement for the Cholesky hot path at scale (GPyTorch's
BBMM insight, PAPERS.md "Blackbox Matrix-Matrix Gaussian Process Inference"):
one batched CG run against [y, z₁ … z_s] simultaneously yields

  * the solve α = Kₙ⁻¹y (exact to CG tolerance),
  * probe solves Kₙ⁻¹zᵢ for the trace/logdet machinery,
  * per-RHS Lanczos tridiagonal coefficients (from the CG α/β recurrence),
    giving log|Kₙ| by stochastic Lanczos quadrature:
        log|Kₙ| ≈ (n/s)·Σᵢ e₁ᵀ·log(Tᵢ)·e₁·‖zᵢ‖²  (Ubaru et al. 2017)

Why this wins on TPU: profiling (see bench notes) shows XLA's triangular solve
is latency-bound (~30 ms for ONE rhs at n=10k on v5e) and Cholesky backward
costs ~4× the forward. mBCG replaces the factorisation with t iterations of
a single [n,n]×[n,s+1] matmul — pure MXU/HBM-bandwidth work — and the same
matmuls serve value, solve, and gradient. With a matvec operator that builds
K tiles on the fly (``ops.pallas_matvec``), K is never materialised and n is
bounded by HBM for x, not K.

Preconditioning: any SPD ``precond(v) ≈ Kₙ⁻¹v``; with the Nyström/partial
pivoted preconditioner the Lanczos coefficients estimate
log|P^{-1/2}KₙP^{-1/2}| — we use the *unpreconditioned* recurrence for the
logdet probes and the preconditioned one for the solve RHS, keeping both
exactness paths simple.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class MBCGResult(NamedTuple):
    solves: jnp.ndarray  # [n, r] best-residual Kₙ⁻¹ B iterates
    alphas: jnp.ndarray  # [t, r] CG step sizes
    betas: jnp.ndarray  # [t, r] CG conjugacy coefficients
    resid_norm: jnp.ndarray  # [r] BEST (returned-iterate) residual norms
    iters: jnp.ndarray = None  # scalar: iterations actually executed


def mbcg(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    B: jnp.ndarray,
    max_iters: int = 100,
    tol: float = 1e-8,
    precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    early_exit: bool = False,
) -> MBCGResult:
    """Batched CG on A X = B with B: [n, r]; matvec maps [n, r] → [n, r].

    Runs up to ``max_iters`` iterations, recording the α/β recurrence per
    column for Lanczos quadrature. Converged columns freeze via masking
    (static shapes, no host sync). With ``early_exit=True`` the loop is a
    ``lax.while_loop`` that stops once EVERY column has converged — legal here
    because nothing differentiates through mBCG (the NLL gradient is assembled
    from the solves themselves, ``models/iterative.py``), and a device-side
    all-reduce on the done mask costs nothing next to an [n,n]×[n,r] matvec.
    The α/β tails stay zero, which the SLQ tridiagonal assembly already treats
    as identity rows (``lanczos_tridiag_from_cg`` ``dead`` handling), so both
    variants return identical results for converged problems.

    Finite-precision hardening (the r3 N=50k lesson): in f32 the attainable
    residual floor is ~eps·κ(Kₙ)·‖b‖ — once CG reaches it, further iterations
    DIVERGE (measured: relative resid 5–7 at n=50k after 50 iterations while
    the best intermediate iterate was ~1e-2). The returned ``solves`` are
    therefore the per-column BEST-residual iterates, and a column is frozen
    as exhausted when its residual grows past ``_DIVERGE_FACTOR ×`` its best
    (which also zeroes its subsequent α/β so SLQ never sees post-breakdown
    garbage coefficients).
    """
    n, r = B.shape
    M = precond if precond is not None else (lambda v: v)

    X = jnp.zeros_like(B)
    R = B
    Z = M(R)
    P = Z
    rz = jnp.sum(R * Z, axis=0)  # [r]
    b_norm = jnp.linalg.norm(B, axis=0)

    _DIVERGE_FACTOR = 4.0
    # consecutive >4×best excursions before freezing a column. Measured on a
    # legitimately converging κ=1e6 f64 system: 8–15+ consecutive 2-norm
    # excursions occur mid-convergence (the count is trajectory-sensitive),
    # so the window must comfortably exceed that. At the f32 floor the
    # divergence persists indefinitely, so 25 still catches every real
    # breakdown — and the excursion iterations themselves are legitimate CG
    # steps (rz, pAp > 0), so their SLQ coefficients are valid and the only
    # cost of a wide window is wasted matvecs.
    _EXHAUST_ITERS = 25

    def step(carry):
        X, R, Z, P, rz, done, bX, bR, stall = carry
        AP = matvec(P)
        pAp = jnp.sum(P * AP, axis=0)
        # f32 hardening: a non-positive or non-finite curvature means the
        # Krylov space is exhausted at this precision — freeze the column
        # with its current iterate instead of poisoning it (cf. the
        # reference's NaN bail-out, LinearConjugateGradients.py:21-24)
        bad = jnp.logical_or(pAp <= 0.0, ~jnp.isfinite(pAp))
        # mask under which alpha is zeroed (X untouched this step): columns
        # frozen in PRIOR iterations plus this step's pAp breakdown
        done_alpha = jnp.logical_or(done, bad)
        alpha = rz / jnp.where(pAp > 0, pAp, 1.0)
        alpha = jnp.where(done_alpha, 0.0, alpha)
        X = X + alpha * P
        R_new = R - alpha * AP
        Z_new = M(R_new)
        rz_new = jnp.sum(R_new * Z_new, axis=0)
        # rz = rᵀP⁻¹r ≤ 0 is impossible for SPD P in exact arithmetic: in f32
        # it means the column sits at its attainable floor (the inner product
        # is cancellation noise) — freeze it; iterating on garbage β poisons
        # both the iterate and the SLQ coefficients (measured r3 at n=50k:
        # β ~ ±100 and pAp overflow within 3 iterations of an rz sign flip)
        done = jnp.logical_or(done_alpha, rz_new <= 0.0)
        beta = rz_new / jnp.where(rz > 0, rz, 1.0)
        beta = jnp.where(done, 0.0, beta)
        P_new = Z_new + beta * P
        resid = jnp.linalg.norm(R_new, axis=0)
        # best-iterate bookkeeping gates on done_ALPHA, not done: a column
        # whose rz froze THIS step still took a valid alpha step (alpha was
        # computed from the pre-update rz > 0), so its — possibly exactly
        # converged — iterate must remain recordable. Gating on the post-rz
        # `done` discarded it (one-step convergence returned the ZERO solve).
        improved = jnp.logical_and(resid < bR, jnp.isfinite(resid))
        improved = jnp.logical_and(improved, ~done_alpha)
        bX = jnp.where(improved[None, :], X, bX)
        bR = jnp.where(improved, resid, bR)
        # exhaustion = bouncing at the f32 floor AFTER real progress, for
        # several CONSECUTIVE iterations. The progress gate matters: CG's
        # residual 2-NORM legitimately overshoots early (only the A-norm of
        # the error is monotone); the consecutive-count gate keeps a single
        # transient 2-norm excursion past 4×best from permanently freezing a
        # column that would have kept converging.
        excursion = jnp.logical_and(
            bR < 0.01 * b_norm, ~(resid <= _DIVERGE_FACTOR * bR)
        )
        stall = jnp.where(excursion, stall + 1, 0)
        exhausted = stall >= _EXHAUST_ITERS
        done_new = jnp.logical_or(jnp.logical_or(done, resid < tol), exhausted)
        done_new = jnp.logical_or(done_new, ~jnp.isfinite(resid))
        keep = jnp.isfinite(R_new)
        R_new = jnp.where(keep, R_new, R)
        return (
            (X, R_new, Z_new, P_new, rz_new, done_new, bX, bR, stall),
            (alpha, beta),
        )

    init = (X, R, Z, P, rz, jnp.zeros((r,), bool), X, b_norm,
            jnp.zeros((r,), jnp.int32))
    if early_exit:
        dtype = B.dtype
        buf = jnp.zeros((max_iters, r), dtype)

        def cond(state):
            i, carry, _, _ = state
            return jnp.logical_and(i < max_iters, ~jnp.all(carry[5]))

        def body(state):
            i, carry, alphas, betas = state
            carry, (alpha, beta) = step(carry)
            return (
                i + 1,
                carry,
                jax.lax.dynamic_update_slice(alphas, alpha[None], (i, 0)),
                jax.lax.dynamic_update_slice(betas, beta[None], (i, 0)),
            )

        iters, carry_out, alphas, betas = jax.lax.while_loop(
            cond, body, (jnp.asarray(0), init, buf, buf)
        )
        bX, bR = carry_out[6], carry_out[7]
    else:
        carry_out, (alphas, betas) = jax.lax.scan(
            lambda c, _: step(c), init, None, length=max_iters
        )
        bX, bR = carry_out[6], carry_out[7]
        iters = jnp.asarray(max_iters)
    return MBCGResult(bX, alphas, betas, bR, iters)


def lanczos_tridiag_from_cg(
    alphas: jnp.ndarray, betas: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CG coefficients → Lanczos tridiagonal (diag, offdiag) per column.

    T_jj = 1/α_j + β_{j-1}/α_{j-1};  T_{j,j+1} = √β_j / α_j
    (Saad; the standard CG↔Lanczos correspondence). alphas/betas: [t, r].
    """
    t = alphas.shape[0]
    safe_a = jnp.where(alphas != 0, alphas, 1.0)
    prev_ba = jnp.concatenate(
        [jnp.zeros_like(alphas[:1]), betas[:-1] / safe_a[:-1]], axis=0
    )
    diag = 1.0 / safe_a + prev_ba  # [t, r]
    off = jnp.sqrt(jnp.maximum(betas, 0.0)) / safe_a  # [t, r]
    # columns that converged early have alpha=0 tail: give them identity rows.
    # Non-finite coefficients (f32 overflow on catastrophically conditioned K
    # — measured r3 at N=100k once ℓ grows) get the same treatment: the SLQ
    # estimate is then merely biased instead of NaN-poisoning the whole step.
    dead = jnp.logical_or(alphas == 0, ~jnp.isfinite(alphas))
    dead = jnp.logical_or(dead, ~jnp.isfinite(betas))
    diag = jnp.where(jnp.logical_or(dead, ~jnp.isfinite(diag)), 1.0, diag)
    off = jnp.where(jnp.logical_or(dead, ~jnp.isfinite(off)), 0.0, off)
    return diag, off[:-1]


def slq_logdet(
    alphas: jnp.ndarray, betas: jnp.ndarray, z_norms2: jnp.ndarray, n: int
) -> jnp.ndarray:
    """Stochastic Lanczos quadrature log-determinant estimate.

    log|A| ≈ (1/s)·Σᵢ ‖zᵢ‖²·e₁ᵀ log(Tᵢ) e₁ with Rademacher zᵢ (‖zᵢ‖²=n).
    """
    diag, off = lanczos_tridiag_from_cg(alphas, betas)  # [t, r], [t-1, r]

    def one(dg, od, zn2):
        T = jnp.diag(dg) + jnp.diag(od, 1) + jnp.diag(od, -1)
        w, V = jnp.linalg.eigh(T)
        w = jnp.maximum(w, 1e-30)
        tau = V[0, :] ** 2
        return zn2 * jnp.sum(tau * jnp.log(w))

    vals = jax.vmap(one, in_axes=(1, 1, 0))(diag, off, z_norms2)
    return jnp.mean(vals)


def tall_qr(A: jnp.ndarray, max_rows: int = 4096):
    """Thin QR of a tall [n, m] matrix, vmap/batch-friendly.

    XLA:TPU's Householder QR degrades ~18× when BATCHED at large row counts
    (measured r5: [10k,128] 23 ms single → 412 ms at batch 4, while batch-4
    [1250,128] stays 27 ms) — which made vmapped-restart fits pay a ~13 s
    fixed overhead in their per-step preconditioner builds. One-level TSQR
    (Demmel et al.) keeps every QR small: row blocks are QR'd batched, the
    stacked R factors get one [nb·m, m] combine QR, and Q = Q_blocks·Q2.
    Orthogonality is Householder-grade (each factor is), which the
    downstream Newton passes in ``build_preconditioner`` polish further.
    Zero-padding rows is exact ([A; 0] = [Q; 0]·R).
    """
    n, m = A.shape
    if n <= max_rows:
        return jnp.linalg.qr(A)
    hp = jax.lax.Precision.HIGHEST
    nb = -(-n // max_rows)
    npad = nb * max_rows
    if npad > n:
        A = jnp.concatenate([A, jnp.zeros((npad - n, m), A.dtype)], 0)
    blocks = A.reshape(nb, max_rows, m)
    # lax.map, NOT vmap: the block QRs would otherwise re-enter the
    # batched-QR slow path at large nb (measured r5: n=200k/m=256 → nb=49
    # batched [4096,256] QRs cost seconds; the sequential pipeline is ms).
    # Under an OUTER vmap (restarts) this becomes a scan whose body is a
    # small-row batched QR — the fast batched regime.
    Qs, Rs = jax.lax.map(jnp.linalg.qr, blocks)  # [nb, max_rows, m], [nb, m, m]
    Q2, R = jnp.linalg.qr(Rs.reshape(nb * m, m))
    Q = jnp.matmul(
        Qs, Q2.reshape(nb, m, m), precision=hp
    ).reshape(npad, m)[:n]
    return Q, R


def _round_robin_pairs(t: int):
    """Round-robin (circle method) schedule: t-1 rounds of t/2 disjoint pairs
    covering every index pair exactly once per sweep. Host-side/static."""
    import numpy as np

    assert t % 2 == 0
    arr = list(range(t))
    rounds = []
    for _ in range(t - 1):
        pairs = [
            (min(arr[i], arr[t - 1 - i]), max(arr[i], arr[t - 1 - i]))
            for i in range(t // 2)
        ]
        rounds.append(pairs)
        arr = [arr[0]] + [arr[-1]] + arr[1:-1]
    return np.asarray(rounds, np.int32)  # [t-1, t/2, 2]


def jacobi_eigh_small(A: jnp.ndarray, sweeps: int = 12):
    """Eigendecomposition of small symmetric matrices A [..., t, t] by
    parallel-ordered cyclic Jacobi with a fixed sweep count — jit/TPU-friendly
    (pure matmul/scatter loop, no LAPACK call, seconds not minutes of XLA:TPU
    compile unlike ``jnp.linalg.eigh`` at these shapes). Returns (w, V) with
    A ≈ V·diag(w)·Vᵀ; w unsorted. Intended for t ≲ 200 (the SLQ tridiagonals);
    use ``jnp.linalg.eigh`` on CPU or for large t.
    """
    import numpy as np

    t = A.shape[-1]
    pad = t % 2
    if pad:
        # pad with a decoupled unit eigenpair; the small-angle rotation below
        # (|θ| ≤ π/4, zero when apq = 0) never mixes or permutes it, so the
        # pad provably stays in the last position
        A = jnp.pad(A, [(0, 0)] * (A.ndim - 2) + [(0, 1), (0, 1)])
        A = A.at[..., t, t].set(1.0)
        t = t + 1
    pairs_np = _round_robin_pairs(t)
    batch = A.shape[:-2]
    A2 = A.reshape((-1, t, t))
    V2 = jnp.broadcast_to(jnp.eye(t, dtype=A.dtype), A2.shape)

    def one_round(carry, pq):
        A, V = carry
        p, q = pq[:, 0], pq[:, 1]
        app = A[:, p, p]
        aqq = A[:, q, q]
        apq = A[:, p, q]
        # classic small-angle rotation (Golub & Van Loan §8.5): |θ| ≤ π/4,
        # exactly zero when apq = 0 — never permutes decoupled eigenpairs
        apq_safe = jnp.where(apq == 0.0, 1.0, apq)
        tau = (aqq - app) / (2.0 * apq_safe)
        sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
        tt = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        tt = jnp.where(apq == 0.0, 0.0, tt)
        c = 1.0 / jnp.sqrt(1.0 + tt * tt)
        s = tt * c
        J = jnp.zeros_like(A)
        J = J.at[:, p, p].set(c)
        J = J.at[:, q, q].set(c)
        J = J.at[:, p, q].set(s)
        J = J.at[:, q, p].set(-s)
        hp = jax.lax.Precision.HIGHEST
        A = jnp.matmul(
            jnp.matmul(J.transpose(0, 2, 1), A, precision=hp), J, precision=hp
        )
        # re-symmetrise against f32 drift
        A = 0.5 * (A + A.transpose(0, 2, 1))
        V = jnp.matmul(V, J, precision=hp)
        return (A, V), None

    sched = jnp.asarray(np.tile(pairs_np, (sweeps, 1, 1)))
    (A2, V2), _ = jax.lax.scan(one_round, (A2, V2), sched)
    w = jnp.diagonal(A2, axis1=-2, axis2=-1)
    if pad:
        w = w[..., : t - 1]
        V2 = V2[..., : t - 1, : t - 1]
        t = t - 1
    return w.reshape(batch + (t,)), V2.reshape(batch + (t, t))


def jacobi_svd_small(A: jnp.ndarray, sweeps: int = 12):
    """One-sided Jacobi SVD of a small square matrix A [t, t]: returns
    (U, s, V) with A ≈ U·diag(s)·Vᵀ, s unsorted, U/V orthogonal.

    Column rotations orthogonalise A directly — the spectrum is NEVER squared
    (no AᵀA), so small singular values come out with high RELATIVE accuracy
    (Demmel & Veselić 1992). This is the property the iterative-GP
    preconditioner needs in f32: forming RrRrᵀ commits an eps·s_max² absolute
    error that wipes out the σ-scale singular values (measured r3: the
    Woodbury core solve at κ ≈ 2.5e6 left P⁻¹ applications ~15% wrong and
    stalled PCG at n=100k). Same batched-rotation machinery as
    :func:`jacobi_eigh_small`; jit/TPU-friendly, t ≲ 512.
    """
    import numpy as np

    t = A.shape[-1]
    pad = t % 2
    if pad:
        A = jnp.pad(A, [(0, 1), (0, 1)])
        t = t + 1
    pairs_np = _round_robin_pairs(t)
    V = jnp.eye(t, dtype=A.dtype)
    hp = jax.lax.Precision.HIGHEST

    def one_round(carry, pq):
        A, V = carry
        p, q = pq[:, 0], pq[:, 1]
        ap = A[:, p]  # [t, t/2] column bundles
        aq = A[:, q]
        app = jnp.sum(ap * ap, axis=0)
        aqq = jnp.sum(aq * aq, axis=0)
        apq = jnp.sum(ap * aq, axis=0)
        # 2×2 symmetric Jacobi angle on the column Gram [app apq; apq aqq]
        apq_safe = jnp.where(apq == 0.0, 1.0, apq)
        tau = (aqq - app) / (2.0 * apq_safe)
        sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
        tt = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        tt = jnp.where(apq == 0.0, 0.0, tt)
        c = 1.0 / jnp.sqrt(1.0 + tt * tt)
        s = tt * c
        J = jnp.zeros_like(A)
        J = J.at[p, p].set(c)
        J = J.at[q, q].set(c)
        J = J.at[p, q].set(s)
        J = J.at[q, p].set(-s)
        A = jnp.matmul(A, J, precision=hp)
        V = jnp.matmul(V, J, precision=hp)
        return (A, V), None

    sched = jnp.asarray(np.tile(pairs_np, (sweeps, 1, 1)))
    (A, V), _ = jax.lax.scan(one_round, (A, V), sched)
    s = jnp.linalg.norm(A, axis=0)  # [t]
    U = A / jnp.where(s > 0, s, 1.0)[None, :]
    if pad:
        t0 = t - 1
        return U[:t0, :t0], s[:t0], V[:t0, :t0]
    return U, s, V


def slq_logdet_device(
    alphas: jnp.ndarray, betas: jnp.ndarray, z_weights: jnp.ndarray, n: int
) -> jnp.ndarray:
    """Device-side SLQ logdet — same math as :func:`slq_logdet_host`, with the
    t×t tridiagonal eigenproblems solved by :func:`jacobi_eigh_small` so the
    whole NLL step stays ONE device program (no per-step host round trip; the
    tunnel to a remote chip costs ~30 ms per call, BENCHMARKS.md)."""
    diag, off = lanczos_tridiag_from_cg(alphas, betas)  # [t, r], [t-1, r]
    t, r = diag.shape
    T = (
        jax.vmap(jnp.diag, in_axes=1, out_axes=0)(diag)
        + jax.vmap(lambda o: jnp.diag(o, 1) + jnp.diag(o, -1), 1, 0)(off)
    )  # [r, t, t]
    w, V = jacobi_eigh_small(T)
    w = jnp.maximum(w, jnp.finfo(w.dtype).tiny)
    tau = V[:, 0, :] ** 2
    vals = z_weights * jnp.sum(tau * jnp.log(w), axis=-1)
    return jnp.mean(vals)


def slq_logdet_host(alphas, betas, z_weights, n: int) -> float:
    """Host-side (NumPy) SLQ — identical math to :func:`slq_logdet` on tiny
    t×t tridiagonals. Exists because ``jnp.linalg.eigh`` inside a jitted TPU
    program costs minutes of compile time for matrices this small; the
    O(t³·s) host work is microseconds."""
    import numpy as np

    a = np.asarray(alphas, np.float64)
    b = np.asarray(betas, np.float64)
    zw = np.asarray(z_weights, np.float64)
    safe_a = np.where(a != 0, a, 1.0)
    prev_ba = np.concatenate([np.zeros_like(a[:1]), b[:-1] / safe_a[:-1]], 0)
    diag = 1.0 / safe_a + prev_ba
    off = np.sqrt(np.maximum(b, 0.0)) / safe_a
    dead = (a == 0) | ~np.isfinite(a) | ~np.isfinite(b)
    diag = np.where(dead | ~np.isfinite(diag), 1.0, diag)
    off = np.where(dead | ~np.isfinite(off), 0.0, off)[:-1]
    vals = []
    for i in range(a.shape[1]):
        T = np.diag(diag[:, i]) + np.diag(off[:, i], 1) + np.diag(off[:, i], -1)
        w, V = np.linalg.eigh(T)
        w = np.maximum(w, 1e-300)
        vals.append(zw[i] * float(np.sum(V[0, :] ** 2 * np.log(w))))
    return float(np.mean(vals))
