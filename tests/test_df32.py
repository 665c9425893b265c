"""Double-f32 arithmetic (ops/df32.py) pinned against the f64 oracle.

The split-precision f64 tier's foundation: every primitive must deliver
~2^-45-or-better relative accuracy out of pure f32 ops, verified here on
CPU against numpy f64 (which the TPU XLA f64 path reproduces bitwise for
basic arithmetic).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rrtmgp_tpu.ops import df32 as D

RNG = np.random.default_rng(42)


def _pairs(n=4096, lo=-1e4, hi=1e4):
    x = RNG.uniform(lo, hi, n)
    return x, D.from_f64(x)


def _rel(err, ref):
    return np.max(np.abs(err) / np.maximum(np.abs(ref), 1e-300))


def test_from_to_f64_roundtrip_exact():
    x = RNG.uniform(-1e6, 1e6, 10000)
    hi, lo = D.from_f64(x)
    back = np.asarray(D.to_f64((hi, lo)))
    # 48-bit split: |x - (hi+lo)| <= 2^-49 |x| (spot: exactly representable)
    assert _rel(back - x, x) < 2**-46
    # normalization invariant: |lo| <= ulp(hi)/2
    assert np.all(np.abs(np.asarray(lo)) <= np.spacing(np.abs(np.asarray(hi))))


def test_two_sum_two_prod_exact():
    a = RNG.uniform(-1e6, 1e6, 10000).astype(np.float32)
    b = RNG.uniform(-1e-3, 1e-3, 10000).astype(np.float32)
    s, e = jax.jit(D.two_sum)(a, b)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64),
        a.astype(np.float64) + b.astype(np.float64),
    )
    p, e = jax.jit(D.two_prod)(a, b)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64),
        a.astype(np.float64) * b.astype(np.float64),
    )


@pytest.mark.parametrize("op,ref", [
    (D.df_add, np.add),
    (D.df_sub, np.subtract),
    (D.df_mul, np.multiply),
    (D.df_div, np.divide),
])
def test_df_arithmetic(op, ref):
    x, dx = _pairs()
    y, dy = _pairs(lo=0.3, hi=7e3)  # avoid div-by-0
    out = np.asarray(D.to_f64(jax.jit(op)(dx, dy)))
    # compare against the exact op on the ROUNDTRIPPED df inputs — the
    # from_f64 split itself drops f64 bits 49-53, which under catastrophic
    # cancellation (x ~ -y in add) dominates and is not the algorithm's error
    want = ref(np.asarray(D.to_f64(dx)), np.asarray(D.to_f64(dy)))
    assert _rel(out - want, want) < 2**-44


def test_df_sqrt():
    x, dx = _pairs(lo=1e-6, hi=1e8)
    out = np.asarray(D.to_f64(jax.jit(D.df_sqrt)(dx)))
    want = np.sqrt(x)
    assert _rel(out - want, want) < 2**-44


def test_df_exp():
    # the solve's exp arguments: -tau*D in [-90, 0] plus moderate positives
    x = np.concatenate([
        RNG.uniform(-86.0, 0.0, 4096),
        RNG.uniform(-2.0, 2.0, 4096),
        RNG.uniform(0.0, 60.0, 1024),
    ])
    dx = D.from_f64(x)
    out = np.asarray(D.to_f64(jax.jit(D.df_exp)(dx)))
    want = np.exp(x)
    # tight gate where the lo word is comfortably f32-normal; between 1e-30
    # and 1e-25 the lo word brushes the subnormal range and accuracy
    # degrades gracefully toward plain f32 (transmittances there are
    # radiatively zero — the flux tolerance is 1e-4 W/m^2 on ~1e2 fluxes)
    big = want > 1e-25
    mid = (want > 1e-30) & ~big
    assert _rel((out - want)[big], want[big]) < 2**-38
    assert _rel((out - want)[mid], want[mid]) < 1e-7
    assert _rel((out - want)[~big & ~mid], want[~big & ~mid]) < 2**-22


def test_df_exp_underflow_flushes_to_zero():
    x = np.array([-90.0, -200.0, -1000.0])
    out = np.asarray(D.to_f64(D.df_exp(D.from_f64(x))))
    np.testing.assert_array_equal(out, 0.0)


def test_df_log_pow():
    x, dx = _pairs(lo=1e-5, hi=1e5)
    out = np.asarray(D.to_f64(jax.jit(D.df_log)(dx)))
    want = np.log(x)
    assert np.max(np.abs(out - want)) < 2**-36  # absolute: log ~ O(10)
    y = RNG.uniform(-3.0, 3.0, x.size)
    dy = D.from_f64(y)
    outp = np.asarray(D.to_f64(jax.jit(D.df_pow)(dx, dy)))
    wantp = x ** y
    ok = np.isfinite(wantp) & (wantp > 1e-30) & (wantp < 1e30)
    assert _rel((outp - wantp)[ok], wantp[ok]) < 2**-34


def test_df_sum_compensated():
    # adversarial: large + many tiny values; f32 loses them, df keeps all
    x = np.concatenate([[1e8], RNG.uniform(-1.0, 1.0, 65535)]).astype(np.float32)
    x = np.broadcast_to(x[:, None], (x.size, 3)).copy()
    out = np.asarray(D.to_f64(jax.jit(lambda a: D.df_sum(a, 0))(x)))
    want = np.sum(x.astype(np.float64), axis=0)
    assert _rel(out - want, want) < 2**-40
    f32_err = _rel(np.sum(x, axis=0, dtype=np.float32) - want, want)
    assert f32_err > 2**-24  # the compensation is doing real work


def test_df_where_max():
    x, dx = _pairs()
    m = x > 0
    out = np.asarray(D.to_f64(D.df_where(m, dx, D.df_neg(dx))))
    np.testing.assert_allclose(out, np.abs(x), rtol=2**-45)
    out2 = np.asarray(D.to_f64(D.df_max_f(dx, np.float32(100.0))))
    np.testing.assert_allclose(out2, np.maximum(x, np.float64(np.float32(100.0))),
                               rtol=2**-45)
