"""Double-f32 ("two-float" / Dekker) compensated arithmetic.

TPUs have no f64 ALU: XLA emulates every f64 op in software, and the f64
solve path runs ~37x slower than f32 (PARITY.md). This module provides the
building blocks for a SPLIT-PRECISION f64 tier (VERDICT r4 #3): numbers are
(hi, lo) pairs of f32 with hi = fl(hi+lo) and |lo| <= ulp(hi)/2, giving
~2^-48 relative accuracy (49-bit effective mantissa vs f64's 53) out of
native-f32 VPU arithmetic — a few f32 issues per op instead of XLA's f64
emulation sequences.

Every function here is pure jnp on f32 arrays, so it runs in plain XLA
and inside Pallas TPU kernels. Mosaic (the real TPU target) compiles the
ops individually and is verified exact on chip; XLA:CPU can contract the
error-free transforms inside fusions — see the CONTRACTION HAZARD note
below for the measured failure mode and which pieces are hardened.

References (algorithms are classical, public domain):
- Dekker 1971, "A floating-point technique for extending the available
  precision" (two_sum / two_prod / df arithmetic).
- Hida, Li, Bailey 2000 (QD library): double-double exp via base-2 range
  reduction + polynomial.

Used by the df64 LW solve tier (ops/pallas_mega_df.py) and gated on-chip
against the exact XLA f64 path at the reference's f64 clear-sky tolerance
(1e-4 W/m^2, /root/reference/test/runtests.jl:21-23).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_F32 = jnp.float32


def _f(x):
    return jnp.asarray(x, _F32)


# -- error-free transformations ---------------------------------------------

# CONTRACTION HAZARD NOTE (XLA:CPU): the CPU backend emits fused loops with
# LLVM fp-contraction, which rewrites ``s = p + e`` into ``fma(a, b, e)``
# when ``p = a*b`` feeds the add — DOUBLE-COUNTING the product error that
# ``e`` already carries (measured: a uniform ~2^-24 relative error on df
# products, fusion-context-dependent; immune to HLO-level optimization
# barriers, which XLA:CPU deletes, and which Pallas cannot lower at all).
# The Veltkamp split is bit-masked (no float mul -> uncontractable); the
# residual CPU hazard is detected by tests/test_df32.py's in-context cases
# and bounded by the df64 tier's end-to-end flux gates. Mosaic (the real
# TPU target) compiles ops individually and is verified exact on chip
# (tests_tpu/test_tpu_df64.py).


def two_sum(a, b):
    """s + e == a + b exactly, s = fl(a+b). 6 flops (Knuth)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def fast_two_sum(a, b):
    """s + e == a + b exactly, REQUIRES |a| >= |b| (or a == 0). 3 flops."""
    s = a + b
    e = b - (s - a)
    return s, e


def _veltkamp(a):
    """Split a into (<=12, <=12)-bit halves: a == h + l exactly.

    BIT-MASKED, not the classical multiply-based Veltkamp: XLA's CPU
    backend emits fusions with LLVM fp-contraction enabled, and
    ``(SPLIT*a) - a`` contracts into an exact fused multiply-sub that
    destroys the split (h degenerates to ~a, the two_prod error terms
    collapse, and df products lose their 2^-24 compensation — measured as
    a uniform 5.9e-8 relative error, fusion-context-dependent, immune to
    HLO-level optimization barriers because the rewrite happens INSIDE
    the fused loop at IR level). Clearing the low 12 mantissa bits is an
    exact split with no float multiply — nothing to contract — and is
    cheaper (1 int-and vs 3 float ops). l = a - h is exact (Sterbenz),
    and all half-products stay exactly representable (12x12 bits).
    """
    if isinstance(a, (float, np.floating)):
        # concrete scalar (e.g. ln2 words, quadrature secants): split in
        # numpy — Mosaic cannot bitcast rank-0 values
        af = np.float32(a)
        h = np.int32(af.view(np.int32) & np.int32(-4096)).view(np.float32)
        return h, np.float32(af - h)
    ai = jax.lax.bitcast_convert_type(a, jnp.int32)
    h = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(ai, jnp.int32(-4096)), _F32
    )
    return h, a - h


def two_prod(a, b):
    """p + e == a * b exactly, p = fl(a*b). Veltkamp-based (no FMA needed)."""
    p = a * b
    ah, al = _veltkamp(a)
    bh, bl = _veltkamp(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# -- double-f32 pair arithmetic ---------------------------------------------
# A df number is a tuple (hi, lo) of equal-shape f32 arrays.

def df(hi, lo=None):
    """Make a df pair (normalizing if lo given)."""
    hi = _f(hi)
    if lo is None:
        return hi, jnp.zeros_like(hi)
    return fast_two_sum(hi, _f(lo))


def from_f64(x) -> tuple[jax.Array, jax.Array]:
    """Exact split of an f64 array into a df32 pair (hi = f32(x),
    lo = f32(x - hi); exact when |x| is in f32 range)."""
    x = jnp.asarray(x, jnp.float64)
    hi = x.astype(_F32)
    lo = (x - hi.astype(jnp.float64)).astype(_F32)
    return hi, lo


def to_f64(x):
    """df pair -> f64 (for gating against the XLA f64 oracle)."""
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)


def df_neg(x):
    return -x[0], -x[1]


def df_add(x, y):
    """df + df, accurate variant (Joldes/Muller AccurateDWPlusDW): relative
    error ~3*2^-48 of the RESULT even under catastrophic cancellation (the
    sloppy one-two_sum version is unbounded there). 11 flops."""
    s, e = two_sum(x[0], y[0])
    t, f = two_sum(x[1], y[1])
    s, e2 = fast_two_sum(s, e + t)
    return fast_two_sum(s, e2 + f)


def df_add_f(x, b):
    """df + f32."""
    s, e = two_sum(x[0], b)
    e = e + x[1]
    return fast_two_sum(s, e)


def df_sub(x, y):
    return df_add(x, df_neg(y))


def df_mul(x, y):
    """df * df. ~2^-47 relative."""
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return fast_two_sum(p, e)


def df_mul_f(x, b):
    """df * f32."""
    p, e = two_prod(x[0], b)
    e = e + x[1] * b
    return fast_two_sum(p, e)


def df_div(x, y):
    """df / df via one correction of the f32 quotient."""
    q1 = x[0] / y[0]
    # r = x - q1*y, computed in df (q1*y exactly via two_prod)
    p, pe = two_prod(q1, y[0])
    r_hi, r_e = two_sum(x[0], -p)
    r = r_hi + (r_e + x[1] - pe - q1 * y[1])
    q2 = r / y[0]
    return fast_two_sum(q1, q2)


def df_recip(y):
    one = jnp.ones_like(y[0])
    return df_div((one, jnp.zeros_like(one)), y)


def df_sqrt(x):
    """sqrt(df) via one Newton correction of the f32 sqrt (Karp-Markstein)."""
    s1 = jnp.sqrt(jnp.maximum(x[0], 0.0))
    safe = jnp.where(s1 > 0, s1, 1.0)
    p, pe = two_prod(s1, s1)
    # r = x - s1^2
    r = (x[0] - p) + (x[1] - pe)
    s2 = r / (2.0 * safe)
    hi, lo = fast_two_sum(s1, jnp.where(s1 > 0, s2, 0.0))
    return hi, lo


def df_where(m, x, y):
    return jnp.where(m, x[0], y[0]), jnp.where(m, x[1], y[1])


def df_max_f(x, b):
    """max(df, f32 scalar) — branch on hi (exact enough for clamps)."""
    m = x[0] > b
    return jnp.where(m, x[0], b), jnp.where(m, x[1], 0.0)


# -- exp --------------------------------------------------------------------

# ln2 as a df32 pair (exact split of the f64 value)
_LN2_HI = np.float32(0.6931472)
_LN2_LO = np.float32(np.log(2.0) - np.float64(np.float32(0.6931472)))
_INV_LN2 = np.float32(1.4426950408889634)

# Taylor coefficients 1/k! for exp on |r| <= ln2/2 after /16 reduction
# (|r'| <= 0.0217): degree 6 leaves |r'|^7/7! ~ 2e-15 relative — below the
# df32 2^-48 noise floor after the 4 squarings.
_EXP_COEFS = [1.0 / 720, 1.0 / 120, 1.0 / 24, 1.0 / 6, 0.5, 1.0, 1.0]


def df_exp(x):
    """exp of a df pair, ~2^-44 relative on |x| <~ 80.

    Base-2 range reduction x = k*ln2 + r (|r| <= ln2/2), a further /16
    scaling, degree-6 Taylor in df arithmetic, 4 df squarings, then exact
    2^k scaling. Inputs below the f32 exp floor (-87) flush to 0 exactly
    (the f64 value there is < 1e-38, far below any flux tolerance).
    """
    xh, xl = x
    k = jnp.round(xh * _INV_LN2)
    # r = x - k*ln2 in df (k*ln2 via two_prod with the hi word + lo term)
    p, pe = two_prod(k, _LN2_HI)
    r_hi, r_e = two_sum(xh, -p)
    r = fast_two_sum(r_hi, r_e + xl - pe - k * _LN2_LO)
    # scale r by 1/16
    r = (r[0] * 0.0625, r[1] * 0.0625)
    # Taylor in df (Horner)
    acc = df(jnp.full_like(xh, np.float32(_EXP_COEFS[0])))
    for c in _EXP_COEFS[1:]:
        acc = df_add_f(df_mul(acc, r), np.float32(c))
    # undo the /16: square 4 times
    for _ in range(4):
        acc = df_mul(acc, acc)
    # 2^k scaling — built EXACTLY via the exponent field (jnp.exp2 is a
    # polynomial approximation with ~2^-18 relative error even at integer
    # arguments — measured 3.5e-6 at 2^-99 on XLA:CPU); clamp k to the
    # normal range
    ki = jnp.clip(k, -126.0, 127.0).astype(jnp.int32)
    # explicit i32 shift: under jax_enable_x64 a python shift amount
    # promotes the result to i64, whose Mosaic lowering recurses infinitely
    scale = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(ki + jnp.int32(127), jnp.int32(23)), _F32
    )
    hi = acc[0] * scale
    lo = acc[1] * scale
    # flush true underflow to exact zero
    tiny = xh < -87.0
    hi = jnp.where(tiny, 0.0, hi)
    lo = jnp.where(tiny, 0.0, lo)
    return hi, lo


def df_log(x):
    """log of a POSITIVE df pair via one Newton step off the f32 log:
    y1 = log32(hi); y = y1 + x*exp(-y1) - 1 (df). ~2^-45 relative."""
    y1 = jnp.log(jnp.maximum(x[0], np.float32(1e-38)))
    e = df_exp((-y1, jnp.zeros_like(y1)))
    t = df_mul(x, e)  # ~ 1 + (log(x) - y1)
    return df_add_f(df_add_f(t, np.float32(-1.0)), y1)


def df_pow(x, y):
    """x**y for positive x (pow_fast semantics, ref RRTMGP.jl:6 — the
    reference itself uses exp(y*log(x)))."""
    return df_exp(df_mul(y, df_log(x)))


# -- compensated reductions -------------------------------------------------

def df_sum(x, axis):
    """Compensated (df) sum of an f32 array along ``axis`` -> df pair.

    Error ~2^-48 * sum|x| instead of f32's ~n*2^-24: the g-point flux
    reduction (256 terms) and vertical accumulations need this to meet the
    f64 1e-4 W/m^2 gate.
    """
    xs = jnp.moveaxis(x, axis, 0)

    def step(carry, v):
        return df_add_f(carry, v), None

    z = jnp.zeros_like(xs[0])
    out, _ = jax.lax.scan(step, (z, z), xs)
    return out


def df_dot_pairs(a_hi, a_lo, b_hi, b_lo, axis):
    """Compensated sum_axis(df(a) * df(b)) -> df pair."""
    xs_ah = jnp.moveaxis(a_hi, axis, 0)
    xs_al = jnp.moveaxis(a_lo, axis, 0)
    xs_bh = jnp.moveaxis(b_hi, axis, 0)
    xs_bl = jnp.moveaxis(b_lo, axis, 0)

    def step(carry, v):
        ah, al, bh, bl = v
        prod = df_mul((ah, al), (bh, bl))
        return df_add(carry, prod), None

    z = jnp.zeros_like(xs_ah[0])
    out, _ = jax.lax.scan(step, (z, z), (xs_ah, xs_al, xs_bh, xs_bl))
    return out
