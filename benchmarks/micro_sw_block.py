"""Microbenchmark: SW/LW megakernel column-block sweep on TPU.

After the fused-sweep refactor removed the (nlay, B, G) direct-transmittance
and (nlev, B, G) direct-flux scratch from the SW kernel (and the down-source
/ surface scratch from LW no-scat), larger column blocks may fit VMEM again.
This script compiles and times the clear-sky megakernels at block 128 vs 256
to decide the dispatch default in models/rrtmgp.py.
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
    # block_until_ready alone can return early through the axon tunnel
    # (CLAUDE.md); a host readback of a real output pins the clock.
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    from rrtmgp_tpu.utils.compile import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
    from rrtmgp_tpu.ops.gas_optics_pallas import (
        build_pallas_tables,
        compute_min_window,
        mega_lw_inputs,
        mega_sw_inputs,
    )
    from rrtmgp_tpu.ops.pallas_interp import rows_per_slab
    from rrtmgp_tpu.ops.pallas_mega import lw_clear_mega, sw_clear_mega
    from rrtmgp_tpu.utils.compile import tpu_compiler_options
    from rrtmgp_tpu.angular import angular_discretization

    dtype = np.float32
    lkp_lw = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=dtype)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype)
    tabs_lw = build_pallas_tables(lkp_lw)
    tabs_sw = build_pallas_tables(lkp_sw)
    win_lw = compute_min_window(lkp_lw, atm, mega=True)
    win_sw = compute_min_window(lkp_sw, atm, mega=True)
    copts = tpu_compiler_options()

    mu0 = jnp.full((NCOL,), 0.6, jnp.float32)
    toa_gpt = jnp.full((NCOL,), 1361.0)[:, None] * lkp_sw.solar_src_scaled[None, :]
    alb = jnp.full((14, NCOL), 0.2, jnp.float32)
    emis = jnp.full((16, NCOL), 0.98, jnp.float32)
    Ds, wts = angular_discretization(1)

    def run_sw(block):
        window = min(win_sw, tabs_sw.fused_ilv.shape[0])
        q_base, pack3, eta3, groups, offs, ray_base = mega_sw_inputs(
            lkp_sw, tabs_sw, atm, window
        )

        def f(pack3, eta3, mu0, toa_gpt, alb):
            return sw_clear_mega(
                q_base, ray_base, pack3, eta3, mu0, toa_gpt, alb, alb,
                tabs_sw.fused_ilv, tabs_sw.ray_ilv,
                tabs_sw.minor_stack, tabs_sw.minor_proj, None,
                nlay=NLAY, window=window, n_eta=lkp_sw.n_eta,
                n_gpt=lkp_sw.n_gpt, n_bnd=lkp_sw.n_bnd,
                bnd_lims_gpt=lkp_sw.bnd_lims_gpt, minor_groups=groups,
                scal_offs=offs, minor_ntp=tabs_sw.minor_ntp,
                slab=rows_per_slab(lkp_sw.n_temp), block_cols=block,
            )

        jf = jax.jit(f, compiler_options=copts)
        try:
            dt = timeit(jf, pack3, eta3, mu0, toa_gpt, alb)
        except Exception as e:  # compile failure (VMEM) is the datum
            print(f"SW block {block}: FAILED {type(e).__name__}: {str(e)[:200]}")
            return None
        print(f"SW block {block}: {dt*1e3:.2f} ms")
        return dt

    def run_lw(block):
        window = min(win_lw, tabs_lw.fused_ilv.shape[0])
        (q_base, pack3, eta3, plk_lay, plk_lev, plk_sfc, groups, offs, _
         ) = mega_lw_inputs(lkp_lw, tabs_lw, atm, window)

        def f(pack3, eta3, plk_lay, plk_lev, plk_sfc, emis):
            return lw_clear_mega(
                q_base, pack3, eta3, plk_lay, plk_lev, plk_sfc, emis,
                tabs_lw.fused_ilv, tabs_lw.minor_stack, tabs_lw.minor_proj,
                None,
                nlay=NLAY, window=window, n_eta=lkp_lw.n_eta,
                n_gpt=lkp_lw.n_gpt, n_bnd=lkp_lw.n_bnd,
                bnd_lims_gpt=lkp_lw.bnd_lims_gpt, minor_groups=groups,
                scal_offs=offs, minor_ntp=tabs_lw.minor_ntp,
                slab=rows_per_slab(lkp_lw.n_temp),
                ds=float(Ds[0]), w_mu=float(wts[0]), block_cols=block,
            )

        jf = jax.jit(f, compiler_options=copts)
        try:
            dt = timeit(jf, pack3, eta3, plk_lay, plk_lev, plk_sfc, emis)
        except Exception as e:
            print(f"LW block {block}: FAILED {type(e).__name__}: {str(e)[:200]}")
            return None
        print(f"LW block {block}: {dt*1e3:.2f} ms")
        return dt

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("sw", "both"):
        for b in (128, 256):
            run_sw(b)
    if which in ("lw", "both"):
        for b in (128, 256, 512):
            run_lw(b)


if __name__ == "__main__":
    main()
