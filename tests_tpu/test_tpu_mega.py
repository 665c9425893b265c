"""Megakernel-vs-XLA flux equivalence + f64 dispatch, on the real TPU.

VERDICT round 1: the megakernels' correctness off-TPU is covered by
interpret-mode tests; this gates the COMPILED kernels (Mosaic lowering, bf16
table splits, windowed VMEM residency) against the plain-XLA solve on the
same chip, at 128 and 256 columns (both megakernel block paths), and pins
the f64 story: pallas_tables with f64 inputs must dispatch to a correct
fallback, matching the pure-XLA f64 solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
from rrtmgp_tpu.models.rrtmgp import solve_lw, solve_sw
from rrtmgp_tpu.ops.gas_optics_pallas import build_pallas_tables, compute_min_window
from rrtmgp_tpu.states import LwBCs, SwBCs
from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

NLAY = 30


def _problem(ncol, dtype):
    lkp_lw = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=dtype)
    atm = synthetic_atmosphere(ncol=ncol, nlay=NLAY, dtype=dtype)
    jdt = jnp.dtype(dtype)
    bcs_lw = LwBCs(sfc_emis=jnp.full((16, ncol), 0.98, jdt))
    bcs_sw = SwBCs(
        cos_zenith=jnp.full((ncol,), 0.6, jdt),
        toa_flux=jnp.full((ncol,), 1361.0, jdt),
        sfc_alb_direct=jnp.full((14, ncol), 0.2, jdt),
        sfc_alb_diffuse=jnp.full((14, ncol), 0.2, jdt),
    )
    return lkp_lw, lkp_sw, atm, bcs_lw, bcs_sw


@pytest.mark.parametrize("ncol", [128, 256])
@pytest.mark.parametrize("solver", ["lw_noscat", "lw_2stream", "sw"])
def test_mega_vs_xla_flux_equivalence(ncol, solver):
    """Compiled megakernel fluxes vs the pure-XLA batched solve, f32.

    Tolerance: the kernels interpolate from a bf16 hi/lo-split table
    (~f32-faithful) and reduce 224/256 g-points in f32 — flux agreement to
    ~1e-2 W/m^2 absolute on O(300 W/m^2) fluxes (relative ~3e-5 == f32 eps
    scale) is the expected envelope; an index bug would be O(10) W/m^2.
    """
    from rrtmgp_tpu.ops.gas_optics_pallas import (
        compute_planck_window,
        compute_ray_window,
    )

    lkp_lw, lkp_sw, atm, bcs_lw, bcs_sw = _problem(ncol, np.float32)
    copts = tpu_compiler_options()
    # exercise the production windowing set (q + ray/planck) on the chip —
    # a window-index bug shows up here as O(10) W/m^2, not a tolerance blur
    if solver == "sw":
        lkp, bcs, fn = lkp_sw, bcs_sw, solve_sw
        kw = {"pallas_ray_window": compute_ray_window(lkp_sw, atm)}
    else:
        lkp, bcs, fn = lkp_lw, bcs_lw, solve_lw
        kw = {
            "two_stream": solver == "lw_2stream",
            "pallas_planck_window": compute_planck_window(lkp_lw, atm),
        }
    tabs = build_pallas_tables(lkp)
    win = compute_min_window(lkp, atm, mega=True)
    f_mega = jax.jit(
        lambda a, b: fn(
            lkp, a, b, pallas_tables=tabs, pallas_windowed="force",
            pallas_window=win, pallas_sweep_cols=sweep_block_cols(), **kw
        )[0],
        compiler_options=copts,
    )
    f_xla = jax.jit(lambda a, b: fn(lkp, a, b, **kw)[0], compiler_options=copts)
    r_m = f_mega(atm, bcs)
    r_x = f_xla(atm, bcs)
    scale = float(jnp.max(jnp.abs(r_x.flux_dn)))
    for a, b in zip(r_m, r_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4 * scale, rtol=2e-3
        )


@pytest.mark.parametrize("ncol", [128, 256])
@pytest.mark.parametrize("solver", ["lw_noscat", "lw_2stream", "sw"])
def test_mega_vs_xla_cloud_aero_equivalence(ncol, solver):
    """Compiled megakernel CLOUD + AEROSOL composition vs the XLA path, on
    chip (VERDICT round 3 #3): the in-kernel band->g-point cloud increment,
    McICA mask application, and aerosol two-stream composition under real
    Mosaic lowering were previously compared to an independent implementation
    only in interpret mode — and this repo documents Mosaic-only miscompile
    classes (CLAUDE.md). Deterministic external mask (cld_frac in {0,1}), so
    both paths compose identical cloud fields."""
    from rrtmgp_tpu.data.synthetic import (
        synthetic_aerosol_lookup,
        synthetic_cloud_lookup,
    )
    from rrtmgp_tpu.ops.cloud_optics import build_cloud_mask_mcica
    from rrtmgp_tpu.ops.gas_optics_pallas import (
        compute_planck_window,
        compute_ray_window,
    )

    lkp_lw, lkp_sw, _, bcs_lw, bcs_sw = _problem(ncol, np.float32)
    atm = synthetic_atmosphere(
        ncol=ncol, nlay=NLAY, dtype=np.float32,
        with_clouds=True, with_aerosols=True,
    )
    copts = tpu_compiler_options()
    if solver == "sw":
        lkp, bcs, fn = lkp_sw, bcs_sw, solve_sw
        lkp_cld = synthetic_cloud_lookup(n_bnd=14, seed=5, dtype=np.float32)
        lkp_aero = synthetic_aerosol_lookup(n_bnd=14, seed=6, dtype=np.float32)
        kw = {"pallas_ray_window": compute_ray_window(lkp_sw, atm)}
    else:
        lkp, bcs, fn = lkp_lw, bcs_lw, solve_lw
        lkp_cld = synthetic_cloud_lookup(n_bnd=16, dtype=np.float32)
        lkp_aero = synthetic_aerosol_lookup(n_bnd=16, dtype=np.float32)
        kw = {
            "two_stream": solver == "lw_2stream",
            "pallas_planck_window": compute_planck_window(lkp_lw, atm),
        }
    # cld_frac in {0,1} -> the threefry mask is deterministic, both paths
    # see the same cloud field bitwise
    mask = build_cloud_mask_mcica(
        jax.random.key(0), atm.cloud_state.cld_frac, lkp.n_gpt
    )
    tabs = build_pallas_tables(lkp)
    win = compute_min_window(lkp, atm, mega=True)
    f_mega = jax.jit(
        lambda a, b, m: fn(
            lkp, a, b, lkp_cld=lkp_cld, lkp_aero=lkp_aero, cld_mask=m,
            pallas_tables=tabs, pallas_windowed="force",
            pallas_window=win, pallas_sweep_cols=sweep_block_cols(), **kw
        )[0],
        compiler_options=copts,
    )
    f_xla = jax.jit(
        lambda a, b, m: fn(
            lkp, a, b, lkp_cld=lkp_cld, lkp_aero=lkp_aero, cld_mask=m, **kw
        )[0],
        compiler_options=copts,
    )
    r_m = f_mega(atm, bcs, mask)
    r_x = f_xla(atm, bcs, mask)
    scale = float(jnp.max(jnp.abs(r_x.flux_dn)))
    for a, b in zip(r_m, r_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4 * scale, rtol=3e-3
        )


def test_f64_dispatch_matches_xla():
    """pallas_tables + f64 inputs: the dispatch must IGNORE the f32-only
    kernel tier (with a warning) and produce the exact-precision XLA f64
    solve — bitwise — rather than silently degrading precision."""
    jax.config.update("jax_enable_x64", True)
    try:
        _f64_dispatch_body()
    finally:
        jax.config.update("jax_enable_x64", False)


def _f64_dispatch_body():
    lkp_lw, lkp_sw, atm, bcs_lw, bcs_sw = _problem(128, np.float64)
    copts = tpu_compiler_options()
    tabs = build_pallas_tables(
        jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32) if hasattr(x, "dtype") else x, lkp_lw
        )
    )
    win = compute_min_window(lkp_lw, atm, mega=True)
    with pytest.warns(UserWarning, match="f32-only"):
        f_tabs = jax.jit(
            lambda a, b: solve_lw(
                lkp_lw, a, b, two_stream=False, pallas_tables=tabs,
                pallas_windowed="force", pallas_window=win,
            )[0],
            compiler_options=copts,
        )
        r_t = f_tabs(atm, bcs_lw)
    f_xla = jax.jit(
        lambda a, b: solve_lw(lkp_lw, a, b, two_stream=False)[0],
        compiler_options=copts,
    )
    r_x = f_xla(atm, bcs_lw)
    assert r_t.flux_up.dtype == jnp.float64
    np.testing.assert_array_equal(np.asarray(r_t.flux_up), np.asarray(r_x.flux_up))
    np.testing.assert_array_equal(np.asarray(r_t.flux_dn), np.asarray(r_x.flux_dn))


def test_shard_map_megakernel_on_device():
    """RRTMGPSolver(mesh=...) on the REAL chip: the shard_map + Mosaic
    composition of the production path (the CPU sharding test runs interpret
    mode; this compiles the megakernels under shard_map on hardware). A
    1-device mesh exercises the same partitioning machinery."""
    import rrtmgp_tpu as rt
    from rrtmgp_tpu.data.synthetic import synthetic_cloud_lookup
    from rrtmgp_tpu.parallel.sharding import make_column_mesh, shard_columns

    ncol = 256
    lkp_lw, lkp_sw, _, bcs_lw, bcs_sw = _problem(ncol, np.float32)
    lookups = rt.LookupBundle(
        lookup_lw=lkp_lw, lookup_sw=lkp_sw,
        lookup_lw_cld=synthetic_cloud_lookup(n_bnd=16, dtype=np.float32),
        lookup_sw_cld=synthetic_cloud_lookup(n_bnd=14, seed=5, dtype=np.float32),
    )
    atm = synthetic_atmosphere(ncol=ncol, nlay=NLAY, dtype=np.float32, with_clouds=True)
    mesh = make_column_mesh(jax.devices()[:1])
    atm_s = shard_columns(atm, mesh, ncol)
    gp = rt.RRTMGPGridParams(nlay=NLAY, ncol=ncol, dtype=jnp.float32)
    s = rt.RRTMGPSolver(
        gp, rt.AllSkyRadiation(), rt.RRTMGPParameters(),
        shard_columns(bcs_lw, mesh, ncol), shard_columns(bcs_sw, mesh, ncol),
        atm_s, lookups=lookups, mesh=mesh,
    )
    flw = s.update_lw_fluxes()
    fsw = s.update_sw_fluxes()
    assert bool(jnp.all(jnp.isfinite(flw.flux_up)))
    assert bool(jnp.all(jnp.isfinite(fsw.flux_up)))
    # and it must equal the meshless solve bitwise (global-column seeding)
    s0 = rt.RRTMGPSolver(
        gp, rt.AllSkyRadiation(), rt.RRTMGPParameters(), bcs_lw, bcs_sw, atm,
        lookups=lookups,
    )
    flw0 = s0.update_lw_fluxes()
    np.testing.assert_array_equal(np.asarray(flw.flux_up), np.asarray(flw0.flux_up))
