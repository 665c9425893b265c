"""Microbenchmark: optics kernel time vs window size (K-scaling probe).

Window sizes below the atmosphere's requirement give WRONG numerics (fine for
timing). Also ablates minor groups and the planck table to attribute time.
Run: python benchmarks/micro_window.py
"""

from __future__ import annotations

import dataclasses
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
        gas_optics_lw_raw,
        gas_optics_sw,
    )
    from rrtmgp_tpu.utils.compile import tpu_compiler_options

    dtype = np.float32
    lkp_lw = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=dtype)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype)
    copts = tpu_compiler_options()

    def bench(tag, lkp_l, lkp_s, window):
        tabs_l = build_pallas_tables(lkp_l)
        tabs_s = build_pallas_tables(lkp_s)
        f_lw = jax.jit(
            lambda a: gas_optics_lw_raw(
                lkp_l, tabs_l, a, block=256, windowed="force",
                window_size=window, keep_padded=True,
            ),
            compiler_options=copts,
        )
        f_sw = jax.jit(
            lambda a: gas_optics_sw(
                lkp_s, tabs_s, a, block=256, windowed="force",
                window_size=window, keep_padded=True,
            ),
            compiler_options=copts,
        )
        t_lw = timeit(f_lw, atm)
        t_sw = timeit(f_sw, atm)
        print(f"{tag:32s}: LW {t_lw*1e3:7.2f} ms  SW {t_sw*1e3:7.2f} ms", flush=True)

    for w in (16, 40, 80, 128):
        bench(f"window={w}", lkp_lw, lkp_sw, w)

    # ablate minors: empty interval tuples
    lkp_lw_nm = dataclasses.replace(lkp_lw, minor_lower=(), minor_upper=())
    lkp_sw_nm = dataclasses.replace(lkp_sw, minor_lower=(), minor_upper=())
    bench("no minors, window=80", lkp_lw_nm, lkp_sw_nm, 80)

    # ablate rayleigh on SW (treated like LW w/o planck? keep rayl but skip via lw path is messy) —
    # instead ablate planck on LW: n_tables=1 by zapping planck_fraction is structural; skip.


if __name__ == "__main__":
    main()
