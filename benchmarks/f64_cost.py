"""f64-on-TPU cost of the exact-precision XLA fallback (run on TPU).

The Pallas kernel tier is f32-only; f64 inputs dispatch the pure-XLA path
(models/rrtmgp.py warns and falls back). This prints the f64 clear-sky
LW+SW throughput at a DYAMOND-ish column count next to the f32 megakernel
number, so the dtype matrix has a measured perf column (VERDICT round 2 #7).
The reference runs f64 as a first-class citizen
(/root/reference/test/runtests.jl:27-30); on TPU, f64 runs on the scalar
unit at a large penalty — this quantifies it.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# default 2048: this harness calls solve_lw/solve_sw DIRECTLY (no solver
# auto-chunk), and the unchunked f64 pair at 8192 cols requests ~33 GB
NCOL = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
NLAY = 60
F32_CHILD = "--f32-child" in sys.argv


def main() -> None:
    # The f32 megakernels cannot be TRACED under global x64 (recursion-depth
    # blowup — tests_tpu/conftest.py): measure the f32 reference in a child
    # process BEFORE this process claims the exclusive TPU chip, then bench
    # the f64 XLA fallback here with x64 on.
    t32 = None
    if not F32_CHILD:
        import subprocess

        r = subprocess.run(
            [sys.executable, __file__, str(NCOL), "--f32-child"],
            capture_output=True, text=True, timeout=900,
        )
        for line in r.stdout.splitlines():
            if line.startswith("F32_SECONDS "):
                t32 = float(line.split()[1])
        if t32 is None:
            sys.stderr.write(r.stdout + r.stderr)
            raise SystemExit("f32 child failed")

    from rrtmgp_tpu.utils.compile import enable_compile_cache

    enable_compile_cache()

    import jax

    if not F32_CHILD:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
    from rrtmgp_tpu.models.rrtmgp import solve_lw, solve_sw
    from rrtmgp_tpu.ops.gas_optics_pallas import (
        build_pallas_tables,
        compute_min_window,
    )
    from rrtmgp_tpu.states import LwBCs, SwBCs
    from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

    copts = tpu_compiler_options()
    scols = sweep_block_cols()

    def bench(dtype, use_pallas):
        jdt = jnp.dtype(dtype)
        lkp = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
        lkp_sw = synthetic_gas_lookup(
            longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=dtype
        )
        atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype)
        bcs = LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jdt))
        bcs_sw = SwBCs(
            cos_zenith=jnp.full((NCOL,), 0.6, jdt),
            toa_flux=jnp.full((NCOL,), 1361.0, jdt),
            sfc_alb_direct=jnp.full((14, NCOL), 0.2, jdt),
            sfc_alb_diffuse=jnp.full((14, NCOL), 0.2, jdt),
        )
        kw = {}
        if use_pallas:
            kw = dict(
                pallas_tables=build_pallas_tables(lkp), pallas_windowed="force",
                pallas_window=compute_min_window(lkp, atm, mega=True),
                pallas_sweep_cols=scols,
            )
            kw_sw = dict(
                pallas_tables=build_pallas_tables(lkp_sw), pallas_windowed="force",
                pallas_window=compute_min_window(lkp_sw, atm, mega=True),
                pallas_sweep_cols=scols,
            )
        else:
            kw_sw = {}
        f_lw = jax.jit(lambda a, b: solve_lw(lkp, a, b, **kw)[0], compiler_options=copts)
        f_sw = jax.jit(
            lambda a, b: solve_sw(lkp_sw, a, b, **kw_sw)[0], compiler_options=copts
        )
        out = f_lw(atm, bcs); float(np.asarray(out.flux_up[0, 0]))
        out2 = f_sw(atm, bcs_sw); float(np.asarray(out2.flux_up[0, 0]))
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            o1 = f_lw(atm, bcs)
            o2 = f_sw(atm, bcs_sw)
        float(np.asarray(o1.flux_up[0, 0])) + float(np.asarray(o2.flux_up[0, 0]))
        dt = (time.perf_counter() - t0) / n
        return dt

    if F32_CHILD:
        print(f"F32_SECONDS {bench(np.float32, use_pallas=True):.6f}")
        return
    t64 = bench(np.float64, use_pallas=False)

    # df64 split-precision LW tier (ops/pallas_mega_df): LW-only, so scale
    # against the LW share for the honest row
    sys.setrecursionlimit(100000)
    from rrtmgp_tpu.ops.pallas_mega_df import (
        build_df64_tables,
        compute_df64_window,
        solve_lw_df64,
    )

    lkp = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=np.float64)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=np.float64)
    bcs = LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jnp.float64))
    tabs = build_df64_tables(lkp)
    win = compute_df64_window(lkp, atm)
    up, dn = solve_lw_df64(lkp, tabs, atm, bcs, window=win)
    up.block_until_ready()
    f_lw64 = jax.jit(lambda a, b: solve_lw(lkp, a, b)[0])
    o = f_lw64(atm, bcs); float(np.asarray(o.flux_up[0, 0]))
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        up, dn = solve_lw_df64(lkp, tabs, atm, bcs, window=win)
    float(np.asarray(up[0, 0]))
    t_df = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for _ in range(n):
        o = f_lw64(atm, bcs)
    float(np.asarray(o.flux_up[0, 0]))
    t_lw64 = (time.perf_counter() - t0) / n
    err = float(jnp.max(jnp.abs(up - o.flux_up)))

    print(f"f32 megakernels: {t32*1e3:8.1f} ms -> {NCOL/t32/1e3:8.1f}k cols/s")
    print(f"f64 XLA fallback: {t64*1e3:8.1f} ms -> {NCOL/t64/1e3:8.1f}k cols/s")
    print(f"f64 / f32 cost ratio: {t64/t32:.1f}x")
    print(f"f64 XLA LW-only: {t_lw64*1e3:8.1f} ms -> {NCOL/t_lw64/1e3:8.1f}k cols/s")
    print(f"df64 LW megakernel: {t_df*1e3:8.1f} ms -> {NCOL/t_df/1e3:8.1f}k cols/s"
          f"  ({t_lw64/t_df:.1f}x the exact f64 LW; L-inf {err:.2e} W/m^2)")


if __name__ == "__main__":
    main()
