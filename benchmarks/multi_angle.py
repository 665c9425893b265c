"""Measure the LW no-scat multi-angle (n_gauss_angles > 1) perf cliff.

VERDICT r4 weak #6: n_gauss_angles > 1 silently leaves the megakernel path
(models/rrtmgp.py mega_ok gate — the megakernel bakes one propagation
angle into the fused sweep) and runs the two-kernel path with the sweep
re-run per angle. Correctness is CPU-tested (tests/test_api.py); this
script publishes the measured cost so the cliff is documented, not
discovered (ref AngularDiscretizations.jl:32-54; Hogan 2023 recommends
2-3 angles for accuracy-sensitive LW runs).

Usage: python benchmarks/multi_angle.py [ncol]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

NCOL = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
NLAY = 60


def timeit(fn, *args, n=10, reps=3):
    import jax

    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]))
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]))
        best.append((time.perf_counter() - t0) / n)
    return min(best)


def main():
    from rrtmgp_tpu.utils.compile import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
    from rrtmgp_tpu.models.rrtmgp import solve_lw
    from rrtmgp_tpu.ops.gas_optics_pallas import (
        build_pallas_tables,
        compute_min_window,
        compute_planck_window,
    )
    from rrtmgp_tpu.states import LwBCs
    from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

    dtype = np.float32
    lkp = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype)
    bcs = LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jnp.float32))
    tabs = build_pallas_tables(lkp)
    win = compute_min_window(lkp, atm, mega=True)
    plk_win = compute_planck_window(lkp, atm)
    copts = tpu_compiler_options()
    scols = sweep_block_cols()

    print(f"# LW no-scat clear, {NCOL} cols x {NLAY} lay (TPU)")
    base = None
    for nga in (1, 2, 3, 4):
        f = jax.jit(
            lambda a, b, _n=nga: solve_lw(
                lkp, a, b, n_gauss_angles=_n,
                pallas_tables=tabs, pallas_windowed="force",
                pallas_window=win, pallas_sweep_cols=scols,
                pallas_planck_window=plk_win,
            )[0],
            compiler_options=copts,
        )
        t = timeit(f, atm, bcs)
        cps = NCOL / t
        base = base or cps
        path = "megakernel" if nga == 1 else "two-kernel (sweep x angles)"
        print(f"  n_gauss_angles={nga}: {t*1e3:7.2f} ms  {cps/1e3:7.1f}k cols/s"
              f"  ({100*cps/base:5.1f}% of 1-angle)  [{path}]")


if __name__ == "__main__":
    main()
