"""DYAMOND-scale benchmark harness.

Mirrors the reference's GPU benchmark scripts
(/root/reference/test/clear_sky_dyamond_gpu_benchmark.jl:102-124 and
 test/{cloudy,all}_sky*_dyamond_gpu_benchmark.jl): clear-sky at
ncol = ceil(30*30*6*4^2*64/61) = 90,650 columns and all-sky at
ncol = ceil(86,400*64/73) = 75,748 columns, 60 layers, full spectral size,
reporting median solve times and columns/s. Memory is bounded by sequential
column chunks (models.rrtmgp.solve_chunked).

Usage: python benchmarks/dyamond.py [clear|allsky] [--ncol N] [--chunk N]
"""

from __future__ import annotations

import argparse
import statistics
from functools import partial
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

CLEAR_NCOL = 90650   # ref clear_sky_dyamond_gpu_benchmark.jl:102
ALLSKY_NCOL = 75748  # ref all_sky_with_aerosols_dyamond_gpu_benchmark.jl:114


def pick_chunk(ncol: int, target: int) -> int:
    """Largest chunk <= ~target (multiple of 256 for the padded-gpt handoff)
    minimizing column padding: ceil(ncol / n_chunks) rounded up to 256."""
    n_chunks = -(-ncol // target)
    return -(-(-(-ncol // n_chunks)) // 256) * 256


def run(mode: str, ncol: int, chunk: int, nlay: int = 60, n_iters: int = 10,
        lw_two_stream: bool = True):
    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.utils.compile import enable_compile_cache

    enable_compile_cache()

    from rrtmgp_tpu.data.synthetic import (
        synthetic_aerosol_lookup,
        synthetic_atmosphere,
        synthetic_cloud_lookup,
        synthetic_gas_lookup,
    )
    from rrtmgp_tpu.models.rrtmgp import solve_chunked, solve_lw, solve_sw
    from rrtmgp_tpu.ops.cloud_optics import build_cloud_mask_mcica
    from rrtmgp_tpu.states import LwBCs, SwBCs

    dtype = np.float32
    ncol_pad = -(-ncol // chunk) * chunk
    print(f"mode={mode} ncol={ncol} (padded {ncol_pad}) chunk={chunk} nlay={nlay}")

    lkp_lw = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=dtype)
    atm = synthetic_atmosphere(
        ncol=ncol_pad, nlay=nlay, dtype=dtype, with_clouds=(mode != "clear"),
        with_aerosols=(mode == "aerosky"),
    )
    bcs_lw = LwBCs(sfc_emis=jnp.full((16, ncol_pad), 0.98, jnp.float32))
    bcs_sw = SwBCs(
        cos_zenith=jnp.full((ncol_pad,), 0.6, jnp.float32),
        toa_flux=jnp.full((ncol_pad,), 1361.0, jnp.float32),
        sfc_alb_direct=jnp.full((14, ncol_pad), 0.2, jnp.float32),
        sfc_alb_diffuse=jnp.full((14, ncol_pad), 0.2, jnp.float32),
    )

    from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

    tabs_lw = tabs_sw = None
    win_lw = win_sw = 96
    if jax.default_backend() == "tpu":
        from rrtmgp_tpu.ops.gas_optics_pallas import (
            build_pallas_tables,
            compute_min_window,
            compute_planck_window,
            compute_ray_window,
        )

        tabs_lw = build_pallas_tables(lkp_lw)
        tabs_sw = build_pallas_tables(lkp_sw)
        win_lw = compute_min_window(lkp_lw, atm, mega=True)
        win_sw = compute_min_window(lkp_sw, atm, mega=True)
        # window buckets computed on a CHUNK-shaped slice (+8 margin): the
        # chunked solve's per-block flattening differs from the full array's
        import jax.tree_util as jtu

        atm_c = jtu.tree_map(
            lambda x: x[..., :chunk] if hasattr(x, "ndim") and x.ndim and x.shape[-1] == ncol_pad else x,
            atm,
        )
        plk_win = compute_planck_window(lkp_lw, atm_c) + 8
        ray_win = compute_ray_window(lkp_sw, atm_c) + 8
    copts = tpu_compiler_options()
    scols = sweep_block_cols()
    # "force": the window invariant is established once from the full
    # atmosphere (chunks are subsets), enabling the clear-sky megakernels
    pk_lw = dict(pallas_tables=tabs_lw, pallas_window=win_lw,
                 pallas_sweep_cols=scols, pallas_windowed="force")
    pk_sw = dict(pallas_tables=tabs_sw, pallas_window=win_sw,
                 pallas_sweep_cols=scols, pallas_windowed="force")
    if jax.default_backend() == "tpu":
        pk_lw["pallas_planck_window"] = plk_win
        pk_sw["pallas_ray_window"] = ray_win

    lkp_cld_lw = lkp_cld_sw = lkp_aero_lw = lkp_aero_sw = None
    if mode != "clear":
        lkp_cld_lw = synthetic_cloud_lookup(n_bnd=16, dtype=dtype)
        lkp_cld_sw = synthetic_cloud_lookup(n_bnd=14, seed=5, dtype=dtype)
    aero_species = None
    if mode == "aerosky":
        # all-sky WITH aerosols: the reference's headline all-sky workload
        # (ref test/all_sky_with_aerosols_dyamond_gpu_benchmark.jl)
        lkp_aero_lw = synthetic_aerosol_lookup(n_bnd=16, dtype=dtype)
        lkp_aero_sw = synthetic_aerosol_lookup(n_bnd=14, seed=9, dtype=dtype)
        # static active-species set, inspected once at init (hosts know
        # which MERRA species they load)
        m = np.asarray(atm.aerosol_state.aero_mass)
        aero_species = tuple(int(i) for i in np.nonzero(m.any(axis=(1, 2)))[0])
        print(f"active aerosol species: {aero_species}")

    if mode == "clear":

        @partial(jax.jit, compiler_options=copts)
        def f_lw(a, b):
            return solve_chunked(
                lambda ac, bc: solve_lw(lkp_lw, ac, bc, **pk_lw)[0],
                a, b, chunk,
            )

        @partial(jax.jit, compiler_options=copts)
        def f_sw(a, b):
            return solve_chunked(
                lambda ac, bc: solve_sw(lkp_sw, ac, bc, **pk_sw)[0],
                a, b, chunk,
            )

        args_lw = (atm, bcs_lw)
        args_sw = (atm, bcs_sw)
    else:
        # McICA mask sampling runs INSIDE the timed solve — the reference
        # samples per column inside its timed solves
        # (ref src/rte/longwave1scalar.jl:72, cloud_optics.jl:222-261).
        # On TPU the megakernels sample in-kernel from the counter-based seed.

        @partial(jax.jit, compiler_options=copts)
        def f_lw(a, b, seed):
            return solve_chunked(
                lambda ac, bc, sc, off: solve_lw(
                    lkp_lw, ac, bc, two_stream=lw_two_stream,
                    lkp_cld=lkp_cld_lw,
                    lkp_aero=lkp_aero_lw, cld_mask_seed=sc, col_offset=off,
                    aero_species=aero_species,
                    **pk_lw,
                )[0],
                a, b, chunk, cld_mask_seed=seed,
            )

        @partial(jax.jit, compiler_options=copts)
        def f_sw(a, b, seed):
            return solve_chunked(
                lambda ac, bc, sc, off: solve_sw(
                    lkp_sw, ac, bc, lkp_cld=lkp_cld_sw, lkp_aero=lkp_aero_sw,
                    cld_mask_seed=sc, col_offset=off, aero_species=aero_species,
                    **pk_sw,
                )[0],
                a, b, chunk, cld_mask_seed=seed,
            )

        args_lw = (atm, bcs_lw, jnp.asarray(0, jnp.int32))
        args_sw = (atm, bcs_sw, jnp.asarray(1, jnp.int32))

    for name, f, args in (("LW", f_lw, args_lw), ("SW", f_sw, args_sw)):
        t0 = time.perf_counter()
        r = jax.block_until_ready(f(*args))
        print(f"{name} compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
        times = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            r = jax.block_until_ready(f(*args))
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        # window-guard violations NaN-poison fluxes — a benchmark of NaNs is
        # not a benchmark; make that loud
        peek = float(np.asarray(r.flux_up[0, 0]))
        assert np.isfinite(peek), f"{name}: NaN fluxes (window guard tripped?)"
        print(
            f"{name} solve: median {med*1e3:.1f} ms -> {ncol/med:,.0f} columns/s",
            flush=True,
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "mode", nargs="?", default="clear", choices=["clear", "allsky", "aerosky"]
    )
    ap.add_argument("--ncol", type=int, default=None)
    ap.add_argument("--chunk", type=int, default=None)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--lw-noscat", action="store_true",
        help="all-sky LW with the no-scat solver (ref cloudy tests run both "
        "LW solvers; exercises in-kernel composition in lw_clear_mega)",
    )
    a = ap.parse_args()
    ncol = a.ncol or (CLEAR_NCOL if a.mode == "clear" else ALLSKY_NCOL)
    # megakernels keep per-chunk HBM footprints small; larger chunks amortize
    # the lax.map step overheads (+4-5% at 2x)
    chunk = a.chunk or pick_chunk(ncol, 16384)
    run(a.mode, ncol, chunk, n_iters=a.iters, lw_two_stream=not a.lw_noscat)
