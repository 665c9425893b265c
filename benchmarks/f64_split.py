"""Measure XLA-f64-emulation vs double-f32 (ops/df32) op costs on TPU.

VERDICT r4 #3 step 0: before building a split-precision f64 solve tier,
measure whether df32 arithmetic actually beats XLA's software f64 on this
chip, per op class the solve uses:
  - mul-add chains (the optics accumulations)
  - exp (the transport transmittance)
  - a serial layer recurrence (the radiance sweep)
  - a g-point reduction (flux accumulation)

Each benchmark runs the same logical work in
  f32 (lower bound), f64 (XLA emulation), df32 (ops/df32 pairs)
on (N,) arrays sized like a DYAMOND-chunk spectral slab.

Usage: python benchmarks/f64_split.py [N_millions]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 7_680_000
# heavy per-element op counts: the axon tunnel's per-dispatch overhead
# (~ms) swamps thin microbenchmarks (CLAUDE.md) — chain enough work that
# compute dominates
CHAIN = 64
EXP_CHAIN = 8
REPS = 5
ITERS = 10


def timeit(fn, *args):
    import jax

    out = jax.block_until_ready(fn(*args))
    best = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf.reshape(-1)[0]))
        best.append((time.perf_counter() - t0) / ITERS)
    return min(best)


def main():
    from rrtmgp_tpu.utils.compile import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.ops import df32 as D

    jax.config.update("jax_enable_x64", True)

    rng = np.random.default_rng(0)
    x64 = rng.uniform(0.1, 10.0, N)
    y64 = rng.uniform(1e-8, 1e-7, N)  # keeps the 64-deep chain finite
    x32 = jnp.asarray(x64, jnp.float32)
    y32 = jnp.asarray(y64, jnp.float32)
    xd = D.from_f64(x64)
    yd = D.from_f64(y64)
    x64 = jnp.asarray(x64)
    y64 = jnp.asarray(y64)

    def chain_f(x, y):  # CHAIN fused mul-adds
        for _ in range(CHAIN):
            x = x * y + x
        return x

    def chain_df(x, y):
        for _ in range(CHAIN):
            x = D.df_add(D.df_mul(x, y), x)
        return x

    def exp_f(x):
        acc = x * 0.0
        for _ in range(EXP_CHAIN):
            acc = acc + jnp.exp(-x)
            x = x * 1.0009765625
        return acc

    def exp_df(x):
        acc = (x[0] * 0.0, x[1] * 0.0)
        for _ in range(EXP_CHAIN):
            acc = D.df_add(acc, D.df_exp(D.df_neg(x)))
            x = D.df_mul_f(x, np.float32(1.0009765625))
        return acc

    NLAY = 60
    assert N % NLAY == 0, N

    def sweep_f(t):  # serial transmittance recurrence over layers
        t = t.reshape(NLAY, -1)

        def step(carry, tr):
            rad = carry * tr + (1.0 - tr)
            return rad, rad

        out, _ = jax.lax.scan(step, jnp.zeros_like(t[0]), t)
        return out

    def sweep_df(t):
        th = t[0].reshape(NLAY, -1)
        tl = t[1].reshape(NLAY, -1)

        def step(carry, tr):
            rad = D.df_add(D.df_mul(carry, tr),
                           D.df_add_f(D.df_neg(tr), np.float32(1.0)))
            return rad, rad[0]

        z = (jnp.zeros_like(th[0]), jnp.zeros_like(th[0]))
        out, _ = jax.lax.scan(step, z, (th, tl))
        return out

    G = 256

    def reduce_f(x):
        return jnp.sum(x.reshape(-1, G), axis=-1)

    def reduce_df(x):
        return D.df_sum(x.reshape(-1, G), -1)

    cases = [
        ("mulladd x8", chain_f, (x32, y32), (x64, y64), chain_df, (xd, yd)),
        ("exp", exp_f, (x32,), (x64,), exp_df, (xd,)),
        ("layer sweep", sweep_f, (x32,), (x64,), sweep_df, (xd,)),
        ("gpt reduce", reduce_f, (x32,), (x64,), reduce_df, (x32,)),
    ]
    print(f"# N = {N/1e6:.0f}M elements, min of {REPS}x{ITERS}")
    print(f"{'case':12s} {'f32':>9s} {'f64':>9s} {'df32':>9s}   f64/df32")
    for name, f, a32, a64, fdf, adf in cases:
        t32 = timeit(jax.jit(f), *a32)
        t64 = timeit(jax.jit(f), *a64)
        tdf = timeit(jax.jit(fdf), *adf)
        print(f"{name:12s} {t32*1e3:8.2f}m {t64*1e3:8.2f}m {tdf*1e3:8.2f}m"
              f"   {t64/tdf:6.2f}x")


if __name__ == "__main__":
    main()
