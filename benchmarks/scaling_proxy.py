"""Single-chip bounds for multi-chip scaling efficiency (run on TPU).

Real multi-chip hardware is unavailable in this environment (one v5e behind
a tunnel), so SURVEY §7 step 6's >=90% scaling-efficiency target is bounded
from measurable pieces instead (VERDICT round 2 #4). The solve has ZERO
inter-device communication (columns are independent; tables replicated), so
per-chip efficiency at N chips decomposes into exactly three local terms:

  (a) shard_map wrapper overhead — shard_map(mesh=1) megakernel solve vs the
      unwrapped jit at the same per-shard size (the only code-path difference
      a mesh adds);
  (b) throughput vs per-chip batch — cols/s at 1/2/4/8 chunks of a fixed
      total (weak-scaling proxy: N chips give each chip 1/N of the columns of
      the single-chip run at fixed global work, or the same columns at fixed
      per-chip work);
  (c) one-time host->HBM lookup-table staging at init (amortized across
      steps; identical per chip, no fan-out bottleneck: each host stages its
      own replica — the reference's analogue is the NCDatasets -> DA{FT}
      copies, /root/reference/ext/lookup_constructors.jl:157,540-541).

Prints each measured piece and the implied efficiency estimate. Results land
in PARITY.md.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

NCOL = 32768
NLAY = 60


def readback(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.reshape(-1)[0]))


def timeit(fn, *args, n=10, reps=3):
    import time

    out = fn(*args)
    readback(out)
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        readback(out)
        best.append((time.perf_counter() - t0) / n)
    return min(best)


def main() -> None:
    from rrtmgp_tpu.utils.compile import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
    from rrtmgp_tpu.models.rrtmgp import solve_lw
    from rrtmgp_tpu.ops.gas_optics_pallas import (
        build_pallas_tables,
        compute_min_window,
    )
    from rrtmgp_tpu.parallel.sharding import make_column_mesh, shard_solve
    from rrtmgp_tpu.states import LwBCs
    from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

    assert jax.default_backend() == "tpu", "run on TPU"
    dtype = np.float32
    lkp = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype)
    bcs = LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jnp.float32))
    tabs = build_pallas_tables(lkp)
    win = compute_min_window(lkp, atm, mega=True)
    copts = tpu_compiler_options()
    scols = sweep_block_cols()

    def lw(a, b):
        return solve_lw(
            lkp, a, b, pallas_tables=tabs, pallas_windowed="force",
            pallas_window=win, pallas_sweep_cols=scols,
        )[0]

    # (a) shard_map(mesh=1) vs unwrapped at the same size
    f_plain = jax.jit(lw, compiler_options=copts)
    mesh = make_column_mesh(jax.devices()[:1])
    f_mesh = jax.jit(shard_solve(lw, mesh, NCOL), compiler_options=copts)
    t_plain = timeit(f_plain, atm, bcs)
    t_mesh = timeit(f_mesh, atm, bcs)
    ovh = (t_mesh - t_plain) / t_plain
    print(f"(a) unwrapped {t_plain*1e3:.2f} ms | shard_map(1) {t_mesh*1e3:.2f} ms"
          f" | wrapper overhead {100*ovh:+.2f}%")

    # (b) per-chip batch sensitivity: same kernel at 1/N of the columns
    print("(b) weak-scaling proxy (cols/s at per-chip batch NCOL/N):")
    t1 = None
    for n_chips in (1, 2, 4, 8):
        nc = NCOL // n_chips
        a = synthetic_atmosphere(ncol=nc, nlay=NLAY, dtype=dtype)
        b = LwBCs(sfc_emis=jnp.full((16, nc), 0.98, jnp.float32))
        w = compute_min_window(lkp, a, mega=True)

        def lw_n(a_, b_):
            return solve_lw(
                lkp, a_, b_, pallas_tables=tabs, pallas_windowed="force",
                pallas_window=w, pallas_sweep_cols=scols,
            )[0]

        t = timeit(jax.jit(lw_n, compiler_options=copts), a, b)
        cps = nc / t
        t1 = t1 or cps
        print(f"    N={n_chips}: per-chip batch {nc:6d} -> {cps/1e3:8.1f}k cols/s/chip"
              f"  ({100*cps/t1:.1f}% of N=1 rate)")

    # (b2) the REALISTIC per-step unit: fused LW+SW pair in ONE jit (the
    # update_fluxes() production path; the separate-jit dispatch gap is what
    # hurt small batches in the round-3 curve)
    from rrtmgp_tpu.data.synthetic import synthetic_gas_lookup as _sgl
    from rrtmgp_tpu.models.rrtmgp import solve_sw
    from rrtmgp_tpu.states import SwBCs

    lkp_sw = _sgl(longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=dtype)
    tabs_sw = build_pallas_tables(lkp_sw)
    print("(b2) fused LW+SW pair (one jit/step, update_fluxes path):")
    t1 = None
    for n_chips in (1, 2, 4, 8):
        nc = NCOL // n_chips
        a = synthetic_atmosphere(ncol=nc, nlay=NLAY, dtype=dtype)
        bl = LwBCs(sfc_emis=jnp.full((16, nc), 0.98, jnp.float32))
        bs = SwBCs(
            cos_zenith=jnp.full((nc,), 0.6, jnp.float32),
            toa_flux=jnp.full((nc,), 1361.0, jnp.float32),
            sfc_alb_direct=jnp.full((14, nc), 0.2, jnp.float32),
            sfc_alb_diffuse=jnp.full((14, nc), 0.2, jnp.float32),
        )
        w = compute_min_window(lkp, a, mega=True)
        w_sw = compute_min_window(lkp_sw, a, mega=True)

        def pair_n(a_, bl_, bs_):
            return (
                solve_lw(
                    lkp, a_, bl_, pallas_tables=tabs, pallas_windowed="force",
                    pallas_window=w, pallas_sweep_cols=scols,
                )[0],
                solve_sw(
                    lkp_sw, a_, bs_, pallas_tables=tabs_sw,
                    pallas_windowed="force", pallas_window=w_sw,
                    pallas_sweep_cols=scols,
                )[0],
            )

        t = timeit(jax.jit(pair_n, compiler_options=copts), a, bl, bs)
        cps = nc / t
        t1 = t1 or cps
        print(f"    N={n_chips}: per-chip batch {nc:6d} -> {cps/1e3:8.1f}k cols/s/chip"
              f"  ({100*cps/t1:.1f}% of N=1 rate)")

    # (d) 4,096-col fixed-cost itemization (VERDICT r4 #7): a 16-chip
    # DYAMOND all-sky run lands at ~4.7k cols/chip — inside the <90% regime
    # of curve (b2). Split the 4k-step time into VARIABLE (scales with
    # columns) and FIXED (kernel shell + XLA prologue + dispatch): the fully
    # ablated megakernel pair (MEGA_ABLATE=all pieces) measures the fixed
    # part directly at both 32k and 4k.
    import os as _os

    from rrtmgp_tpu.ops import pallas_mega as _pm

    ALL_LW = "wbuild,major,minors,eta,planck,transport,stores,upsweep,reduce"
    ALL_SW = "wbuild,major,ray,minors,eta,coeffs,beam,stores,adding,downsweep,reduce"

    def _pair_at(nc, ablate: str):
        _os.environ["MEGA_ABLATE"] = ablate
        for fn in (_pm.lw_clear_mega, _pm.lw2_mega, _pm.sw_clear_mega):
            fn.clear_cache()
        a = synthetic_atmosphere(ncol=nc, nlay=NLAY, dtype=dtype)
        bl = LwBCs(sfc_emis=jnp.full((16, nc), 0.98, jnp.float32))
        bs = SwBCs(
            cos_zenith=jnp.full((nc,), 0.6, jnp.float32),
            toa_flux=jnp.full((nc,), 1361.0, jnp.float32),
            sfc_alb_direct=jnp.full((14, nc), 0.2, jnp.float32),
            sfc_alb_diffuse=jnp.full((14, nc), 0.2, jnp.float32),
        )
        w = compute_min_window(lkp, a, mega=True)
        w_sw = compute_min_window(lkp_sw, a, mega=True)

        def pair_n(a_, bl_, bs_):
            return (
                solve_lw(
                    lkp, a_, bl_, pallas_tables=tabs, pallas_windowed="force",
                    pallas_window=w, pallas_sweep_cols=scols,
                )[0],
                solve_sw(
                    lkp_sw, a_, bs_, pallas_tables=tabs_sw,
                    pallas_windowed="force", pallas_window=w_sw,
                    pallas_sweep_cols=scols,
                )[0],
            )

        t = timeit(jax.jit(pair_n, compiler_options=copts), a, bl, bs)
        _os.environ["MEGA_ABLATE"] = ""
        for fn in (_pm.lw_clear_mega, _pm.lw2_mega, _pm.sw_clear_mega):
            fn.clear_cache()
        return t

    print("(d) 4k-col fixed-cost itemization (pair, LW noscat + SW):")
    full_32k = _pair_at(NCOL, "")
    floor_32k = _pair_at(NCOL, ALL_LW + "," + ALL_SW)
    full_4k = _pair_at(4096, "")
    floor_4k = _pair_at(4096, ALL_LW + "," + ALL_SW)
    var_32k = full_32k - floor_32k
    expected_var_4k = var_32k * 4096 / NCOL
    fixed_4k = full_4k - expected_var_4k
    print(f"    32k: full {full_32k*1e3:7.2f} ms, ablated shell "
          f"{floor_32k*1e3:6.2f} ms (prologue+kernel entry+dispatch)")
    print(f"     4k: full {full_4k*1e3:7.2f} ms, ablated shell "
          f"{floor_4k*1e3:6.2f} ms")
    print(f"     4k fixed cost = full - scaled variable = "
          f"{fixed_4k*1e3:6.2f} ms of {full_4k*1e3:.2f} "
          f"({100*fixed_4k/full_4k:.1f}% — the <90% regime's cause)")
    print(f"     per-block shell (32k/256 blk vs 4k/32 blk): "
          f"{(floor_32k-floor_4k)/(256-32)*1e6:6.1f} us/block; "
          f"per-launch remainder {1e3*(floor_4k - 32*(floor_32k-floor_4k)/(256-32)):6.2f} ms")

    # (c) host->HBM table staging (one-time, per init)
    host_tabs = jax.tree_util.tree_map(np.asarray, tabs)
    t0 = time.perf_counter()
    dev = jax.tree_util.tree_map(jnp.asarray, host_tabs)
    jax.block_until_ready(dev)
    readback_b = sum(
        float(np.asarray(x.reshape(-1)[0])) if hasattr(x, "reshape") else 0.0
        for x in jax.tree_util.tree_leaves(dev)[:1]
    )
    t_stage = time.perf_counter() - t0
    nbytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(host_tabs)
        if hasattr(x, "size")
    )
    print(f"(c) table staging: {nbytes/1e6:.1f} MB in {t_stage*1e3:.1f} ms "
          f"(one-time per init, per chip; no cross-chip fan-out)")

    eff = (1.0 / (1.0 + max(ovh, 0.0)))
    print(f"implied per-chip efficiency bound from (a): {100*eff:.1f}% "
          f"(plus (b)'s batch term at the actual per-chip column count)")


if __name__ == "__main__":
    main()
