"""Microbenchmark: fused gas-optics kernel variants on TPU.

Times gas_optics_lw_raw / gas_optics_sw at bench size over (block, eta_chunk)
grids. Run: python benchmarks/micro_optics.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

NCOL = 8192
NLAY = 60


def timeit(fn, *args, n=10):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax

    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
    from rrtmgp_tpu.ops.gas_optics_pallas import (
        build_pallas_tables,
        compute_min_window,
        gas_optics_lw_raw,
        gas_optics_sw,
    )
    from rrtmgp_tpu.utils.compile import tpu_compiler_options

    dtype = np.float32
    lkp_lw = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=dtype)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype)
    tabs_lw = build_pallas_tables(lkp_lw)
    tabs_sw = build_pallas_tables(lkp_sw)
    win_lw = compute_min_window(lkp_lw, atm)
    win_sw = compute_min_window(lkp_sw, atm)
    print(f"windows: lw={win_lw} sw={win_sw}")
    copts = tpu_compiler_options()

    for block in (128, 256, 512):
        for ec in (1, 3, 9):
            f_lw = jax.jit(
                lambda a, _b=block, _e=ec: gas_optics_lw_raw(
                    lkp_lw, tabs_lw, a, block=_b, windowed="force",
                    window_size=win_lw, keep_padded=True, eta_chunk=_e,
                ),
                compiler_options=copts,
            )
            f_sw = jax.jit(
                lambda a, _b=block, _e=ec: gas_optics_sw(
                    lkp_sw, tabs_sw, a, block=_b, windowed="force",
                    window_size=win_sw, keep_padded=True, eta_chunk=_e,
                ),
                compiler_options=copts,
            )
            try:
                t_lw = timeit(f_lw, atm)
            except Exception as e:
                print(f"block={block} ec={ec} LW FAIL: {type(e).__name__}: {str(e)[:120]}")
                t_lw = None
            try:
                t_sw = timeit(f_sw, atm)
            except Exception as e:
                print(f"block={block} ec={ec} SW FAIL: {type(e).__name__}: {str(e)[:120]}")
                t_sw = None
            fmt = lambda t: f"{t*1e3:7.2f} ms" if t else "   --   "
            print(f"block={block:4d} eta_chunk={ec}: LW {fmt(t_lw)}  SW {fmt(t_sw)}", flush=True)


if __name__ == "__main__":
    main()
