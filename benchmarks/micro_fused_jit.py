"""Microbenchmark: separate LW/SW jits vs ONE jit wrapping both clear-sky
solves, at the bench.py workload. Measures whether the host dispatch gap
between the two jitted calls is visible at 32k columns (it is amortized in
the chunked DYAMOND harness; bench.py currently uses two jits).

Measured (1x TPU v5e, 32768 cols): separate 157.1 ms/iter vs fused 156.8
ms/iter (+0.2%) — async dispatch already overlaps the host gap at this
size, so bench.py keeps the two-jit structure."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

NCOL = 32768
NLAY = 60


def timeit(fn, *args, n=20):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from rrtmgp_tpu.utils.compile import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
    from rrtmgp_tpu.models.rrtmgp import solve_lw, solve_sw
    from rrtmgp_tpu.ops.gas_optics_pallas import build_pallas_tables, compute_min_window
    from rrtmgp_tpu.states import LwBCs, SwBCs
    from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

    dtype = np.float32
    lkp_lw = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=dtype)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype)
    bcs_lw = LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jnp.float32))
    bcs_sw = SwBCs(
        cos_zenith=jnp.full((NCOL,), 0.6, jnp.float32),
        toa_flux=jnp.full((NCOL,), 1361.0, jnp.float32),
        sfc_alb_direct=jnp.full((14, NCOL), 0.2, jnp.float32),
        sfc_alb_diffuse=jnp.full((14, NCOL), 0.2, jnp.float32),
    )

    on_tpu = jax.default_backend() == "tpu"
    tabs_lw = build_pallas_tables(lkp_lw) if on_tpu else None
    tabs_sw = build_pallas_tables(lkp_sw) if on_tpu else None
    win_lw = compute_min_window(lkp_lw, atm, mega=True) if on_tpu else 96
    win_sw = compute_min_window(lkp_sw, atm, mega=True) if on_tpu else 96
    copts = tpu_compiler_options()
    scols = sweep_block_cols()

    def lw(a, b):
        return solve_lw(
            lkp_lw, a, b, pallas_tables=tabs_lw, pallas_windowed="force",
            pallas_window=win_lw, pallas_sweep_cols=scols,
        )[0]

    def sw(a, b):
        return solve_sw(
            lkp_sw, a, b, pallas_tables=tabs_sw, pallas_windowed="force",
            pallas_window=win_sw, pallas_sweep_cols=scols,
        )[0]

    f_lw = jax.jit(lw, compiler_options=copts)
    f_sw = jax.jit(sw, compiler_options=copts)
    f_both = jax.jit(lambda a, bl, bs: (lw(a, bl), sw(a, bs)), compiler_options=copts)

    def separate(a, bl, bs):
        return f_lw(a, bl), f_sw(a, bs)

    t_sep = timeit(separate, atm, bcs_lw, bcs_sw)
    t_both = timeit(f_both, atm, bcs_lw, bcs_sw)
    print(f"separate jits: {t_sep * 1e3:8.2f} ms/iter  ({NCOL / t_sep:,.0f} cols/s)")
    print(f"one jit:       {t_both * 1e3:8.2f} ms/iter  ({NCOL / t_both:,.0f} cols/s)")


if __name__ == "__main__":
    main()
