"""Double-float32 ("df32") compensated arithmetic — f64-grade accumulation
on TPU without f64 hardware.

TPUs have no f64 ALUs; enabling ``jax_enable_x64`` on TPU falls back to slow
emulation and changes global promotion rules. The posterior-variance
correction k_ss − k_sᵀKₙ⁻¹k_s is a difference of two O(k_ss) quantities whose
true value at extreme training density sits at ~1e-8·k_ss — far below what a
plain f32 dot product can resolve (r4 floor: ~1e-3·k_ss, BENCHMARKS.md; the
last unmet clause of the BASELINE north star "posterior moments matching
gpbasics to 1e-3", reference f64 variance path
``/root/reference/main/gpbasics/Statistics/Auxiliary.py:83-103``,
``global_parameters.py:43``).

df32 represents each value as an unevaluated sum (hi, lo) of two f32s
(~48-bit effective mantissa) using only IEEE f32 add/mul — native VPU ops:

* ``two_sum``   — Knuth's exact error-free addition transform;
* ``two_prod``  — Dekker's exact product via Veltkamp splitting (no FMA
  needed; XLA does not reassociate IEEE float ops, so the error terms
  survive compilation);
* ``df_add``    — double-float addition (Dekker add22, "sloppy" variant:
  relative error O(eps²) per op — ample for 2× precision accumulation);
* ``df_sum``    — log-depth pairwise df reduction (static shapes, maps to
  full-width VPU elementwise ops — O(n) work, O(log n) depth);
* ``df_dot``    — exact products + df accumulation: a dot product whose
  only irreducible error is the f32 REPRESENTATION of its inputs.

Cost: ~20 VPU flops per element — invisible next to the n²-flop matvecs that
produce the vectors being reduced.
"""
from __future__ import annotations

import jax.numpy as jnp

# Veltkamp splitting constant: 2^ceil(p/2) + 1 for precision p
_SPLIT = {jnp.dtype(jnp.float32): 4097.0,  # p=24
          jnp.dtype(jnp.float64): 134217729.0}  # p=53 (CPU oracle/tests)


def two_sum(a, b):
    """Error-free transform: a + b = s + e exactly (Knuth). Any magnitudes."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free a + b = s + e, requiring |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Veltkamp split: a = hi + lo with hi, lo each fitting in 12 mantissa
    bits, so products of halves are exact in f32."""
    c = jnp.asarray(_SPLIT[jnp.dtype(a.dtype)], a.dtype) * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free transform: a·b = p + e exactly (Dekker, FMA-free)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_add(xh, xl, yh, yl):
    """Double-float addition (x + y) with relative error O(eps²)."""
    sh, se = two_sum(xh, yh)
    se = se + (xl + yl)
    return fast_two_sum(sh, se)


def df_sum(h, l, axis: int = 0):
    """Pairwise double-float reduction of (h, l) along ``axis``. Returns the
    reduced (h, l) with that axis removed. Log-depth: pads to even length and
    halves until one element remains — each level is one full-width
    vectorised :func:`df_add`."""
    h = jnp.moveaxis(h, axis, 0)
    l = jnp.moveaxis(l, axis, 0)
    while h.shape[0] > 1:
        n = h.shape[0]
        if n % 2:
            h = jnp.concatenate([h, jnp.zeros_like(h[:1])], axis=0)
            l = jnp.concatenate([l, jnp.zeros_like(l[:1])], axis=0)
            n += 1
        h, l = df_add(h[0::2], l[0::2], h[1::2], l[1::2])
    return h[0], l[0]


def df_dot(a, b, axis: int = 0):
    """Σ aᵢ·bᵢ along ``axis`` in double-f32: exact products (two_prod) +
    compensated pairwise accumulation. Returns (hi, lo); ``hi + lo`` carries
    ~2× f32 precision — the only remaining error is the f32 representation
    of a and b themselves."""
    ph, pl = two_prod(a, b)
    return df_sum(ph, pl, axis=axis)
