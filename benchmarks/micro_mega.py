"""Microbenchmark: megakernel vs two-kernel clear-sky solves on TPU."""

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
    from rrtmgp_tpu.utils.compile import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
    from rrtmgp_tpu.models.rrtmgp import solve_lw, solve_sw
    from rrtmgp_tpu.states import LwBCs, SwBCs
    from rrtmgp_tpu.ops.gas_optics_pallas import build_pallas_tables, compute_min_window
    from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

    dtype = np.float32
    lkp = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=dtype)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype)
    tabs = build_pallas_tables(lkp)
    tabs_sw = build_pallas_tables(lkp_sw)
    win = compute_min_window(lkp, atm, mega=True)
    win_sw = compute_min_window(lkp_sw, atm, mega=True)
    bcs = LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jnp.float32))
    bcs_sw = SwBCs(
        cos_zenith=jnp.full((NCOL,), 0.6, jnp.float32),
        toa_flux=jnp.full((NCOL,), 1361.0, jnp.float32),
        sfc_alb_direct=jnp.full((14, NCOL), 0.2, jnp.float32),
        sfc_alb_diffuse=jnp.full((14, NCOL), 0.2, jnp.float32),
    )
    copts = tpu_compiler_options()
    scols = sweep_block_cols()

    # two-kernel path (windowed="auto" avoids the mega dispatch which keys on "force")
    f_two = jax.jit(
        lambda a, b: solve_lw(
            lkp, a, b, pallas_tables=tabs, pallas_windowed="auto",
            pallas_window=win, pallas_sweep_cols=scols,
        )[0],
        compiler_options=copts,
    )
    f_mega = jax.jit(
        lambda a, b: solve_lw(
            lkp, a, b, pallas_tables=tabs, pallas_windowed="force",
            pallas_window=win, pallas_sweep_cols=scols,
        )[0],
        compiler_options=copts,
    )
    t_two = timeit(f_two, atm, bcs)
    t_mega = timeit(f_mega, atm, bcs)
    print(f"LW two-kernel (auto): {t_two*1e3:7.2f} ms")
    print(f"LW megakernel (force): {t_mega*1e3:7.2f} ms", flush=True)

    # parity on TPU hardware
    a1 = np.asarray(f_two(atm, bcs).flux_up)
    a2 = np.asarray(f_mega(atm, bcs).flux_up)
    print("LW mega-vs-two flux_up Linf:", np.abs(a1 - a2).max())

    s_two = jax.jit(
        lambda a, b: solve_sw(
            lkp_sw, a, b, pallas_tables=tabs_sw, pallas_windowed="auto",
            pallas_window=win_sw, pallas_sweep_cols=scols,
        )[0],
        compiler_options=copts,
    )
    s_mega = jax.jit(
        lambda a, b: solve_sw(
            lkp_sw, a, b, pallas_tables=tabs_sw, pallas_windowed="force",
            pallas_window=win_sw, pallas_sweep_cols=scols,
        )[0],
        compiler_options=copts,
    )
    t_two = timeit(s_two, atm, bcs_sw)
    t_mega = timeit(s_mega, atm, bcs_sw)
    print(f"SW two-kernel (auto): {t_two*1e3:7.2f} ms")
    print(f"SW megakernel (force): {t_mega*1e3:7.2f} ms", flush=True)
    a1 = np.asarray(s_two(atm, bcs_sw).flux_dn)
    a2 = np.asarray(s_mega(atm, bcs_sw).flux_dn)
    print("SW mega-vs-two flux_dn Linf:", np.abs(a1 - a2).max())


if __name__ == "__main__":
    main()
