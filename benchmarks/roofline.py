"""HBM-roofline accounting for the megakernel solves (run on TPU).

For each solve (LW no-scat, LW 2-stream, SW 2-stream; clear sky, bench
shapes) this measures wall time and tallies the bytes that MUST cross HBM in
the jitted program: solve inputs (atmosphere + BCs, read once), flux outputs
(written once), the resident k-table (DMAed into VMEM once per launch), and
the materialized precompute intermediates (pack/eta/Planck operands built by
the XLA prologue: written once, read once by the kernel -> 2x). Dividing by
the v5e HBM bandwidth gives the bandwidth-bound minimum time; the ratio
locates the kernel on the roofline. FLOP counts come from XLA's
cost_analysis where available (the Pallas custom call is opaque to it, so
MXU utilization is bounded from the ablation numbers instead — PARITY.md).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

V5E_HBM_GBS = 819.0  # TPU v5e HBM bandwidth, GB/s


def tree_bytes(tree) -> int:
    import jax

    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "size")
    )


def main() -> None:
    from rrtmgp_tpu.utils.compile import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
    from rrtmgp_tpu.models.rrtmgp import solve_lw, solve_sw
    from rrtmgp_tpu.ops.gas_optics_pallas import (
        build_pallas_tables,
        compute_min_window,
        mega_lw_inputs,
        mega_sw_inputs,
    )
    from rrtmgp_tpu.states import LwBCs, SwBCs
    from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

    assert jax.default_backend() == "tpu", "run on TPU"
    NCOL, NLAY = 8192, 60
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
    tabs_lw = build_pallas_tables(lkp_lw)
    tabs_sw = build_pallas_tables(lkp_sw)
    win_lw = compute_min_window(lkp_lw, atm, mega=True)
    win_sw = compute_min_window(lkp_sw, atm, mega=True)
    copts = tpu_compiler_options()
    scols = sweep_block_cols()

    # materialized megakernel operands (built by the XLA prologue each step:
    # written once + read once by the kernel => 2x traffic)
    mega_in_lw = jax.eval_shape(
        lambda a: mega_lw_inputs(lkp_lw, tabs_lw, a, win_lw), atm
    )
    mega_in_sw = jax.eval_shape(
        lambda a: mega_sw_inputs(lkp_sw, tabs_sw, a, win_sw), atm
    )

    def report(name, fn, lkp, tabs, bcs, mega_ins, extra_tab_bytes=0):
        f = jax.jit(fn, compiler_options=copts)
        out = jax.block_until_ready(f(atm, bcs))
        n, t0 = 30, time.perf_counter()
        for _ in range(n):
            out = f(atm, bcs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n

        in_b = tree_bytes((atm, bcs))
        out_b = tree_bytes(out)
        tab_b = tree_bytes(tabs) + extra_tab_bytes
        inter_b = 2 * tree_bytes(mega_ins)
        total = in_b + out_b + tab_b + inter_b
        t_bw = total / (V5E_HBM_GBS * 1e9)
        print(
            f"{name}: {dt * 1e3:7.2f} ms | HBM bytes: inputs {in_b / 1e6:6.1f} MB"
            f" + outputs {out_b / 1e6:5.2f} MB + tables {tab_b / 1e6:6.1f} MB"
            f" + intermediates(2x) {inter_b / 1e6:6.1f} MB = {total / 1e6:7.1f} MB"
            f" | bw-bound {t_bw * 1e3:5.2f} ms | roofline {100 * t_bw / dt:5.1f}%"
            f" of HBM-bound"
        )
        return dt

    kw = dict(pallas_windowed="force", pallas_sweep_cols=scols)
    report(
        "LW no-scat mega",
        lambda a, b: solve_lw(
            lkp_lw, a, b, pallas_tables=tabs_lw, pallas_window=win_lw, **kw
        )[0],
        lkp_lw, tabs_lw, bcs_lw, mega_in_lw,
    )
    report(
        "LW 2-stream mega",
        lambda a, b: solve_lw(
            lkp_lw, a, b, two_stream=True, pallas_tables=tabs_lw,
            pallas_window=win_lw, **kw
        )[0],
        lkp_lw, tabs_lw, bcs_lw, mega_in_lw,
    )
    report(
        "SW 2-stream mega",
        lambda a, b: solve_sw(
            lkp_sw, a, b, pallas_tables=tabs_sw, pallas_window=win_sw, **kw
        )[0],
        lkp_sw, tabs_sw, bcs_sw, mega_in_sw,
    )


if __name__ == "__main__":
    main()
