"""Pallas fused gas-optics kernels vs the XLA reference path.

Runs in interpret mode on CPU; on TPU the same code lowers through Mosaic.
Tolerance reflects the bf16 hi/lo 3-pass table contraction (~1e-5 rel).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
from rrtmgp_tpu.ops import gas_optics as go
from rrtmgp_tpu.ops import gas_optics_pallas as gp

NCOL, NLAY = 8, 6


@pytest.mark.parametrize("longwave", [True, False])
def test_fused_optics_matches_xla(longwave):
    lkp = synthetic_gas_lookup(
        longwave=longwave, n_gpt=32, n_bnd=4, seed=2, dtype=np.float32
    )
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=np.float32)
    tabs = gp.build_pallas_tables(lkp)
    if longwave:
        ref = go.gas_optics_lw(lkp, atm)
        out = gp.gas_optics_lw(lkp, tabs, atm, block=8)
        pairs = [
            ("tau", ref.tau, out.tau),
            ("lay_source", ref.sources.lay_source, out.sources.lay_source),
            ("lev_source", ref.sources.lev_source, out.sources.lev_source),
            ("sfc_source", ref.sources.sfc_source, out.sources.sfc_source),
        ]
    else:
        ref = go.gas_optics_sw(lkp, atm)
        out = gp.gas_optics_sw(lkp, tabs, atm, block=8)
        pairs = [("tau", ref.tau, out.tau), ("ssa", ref.ssa, out.ssa)]
    for name, a, b in pairs:
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b) / (np.abs(a).max() + 1e-30)
        assert rel.max() < 5e-5, (name, rel.max())


@pytest.mark.parametrize("longwave", [True, False])
def test_fused_optics_eta_chunk_parity(longwave):
    """eta_chunk only regroups MXU dispatches; results must be identical."""
    lkp = synthetic_gas_lookup(
        longwave=longwave, n_gpt=32, n_bnd=4, seed=2, dtype=np.float32
    )
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=np.float32)
    tabs = gp.build_pallas_tables(lkp)
    run = gp.gas_optics_lw_raw if longwave else gp.gas_optics_sw
    base = run(lkp, tabs, atm, block=8, eta_chunk=1)
    for ec in (3, 9):
        out = run(lkp, tabs, atm, block=8, eta_chunk=ec)
        for a, b in zip(base, out):
            if a is not None:
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-30
                )


def test_solve_lw_source_fused_sweep_matches_xla():
    """solve_lw with pallas_tables + pallas_rte runs the banded source-fused
    sweep (Planck sources built in-kernel); fluxes must match the XLA path."""
    import jax

    from rrtmgp_tpu.models.rrtmgp import solve_lw
    from rrtmgp_tpu.states import LwBCs

    lkp = synthetic_gas_lookup(longwave=True, n_gpt=32, n_bnd=4, seed=2, dtype=np.float32)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=np.float32)
    tabs = gp.build_pallas_tables(lkp)
    bcs = LwBCs(sfc_emis=jnp.full((lkp.n_bnd, NCOL), 0.98, jnp.float32))
    ref, _ = solve_lw(lkp, atm, bcs, pallas_rte=False)
    out, _ = solve_lw(lkp, atm, bcs, pallas_tables=tabs, pallas_rte=True)
    assert out.flux_up.shape == ref.flux_up.shape
    for name in ("flux_up", "flux_dn", "flux_net"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() / scale < 5e-5, (name, np.abs(a - b).max() / scale)


def test_fused_optics_fallback_on_wide_window():
    """When a layer's pressure rows span more than the window, the windowed
    kernel must fall back to the full-width path and still be correct."""
    lkp = synthetic_gas_lookup(longwave=False, n_gpt=32, n_bnd=4, seed=2, dtype=np.float32)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=np.float32)
    # spread pressures within each layer across the whole table range so the
    # per-layer window invariant fails
    p = np.asarray(atm.p_lay)
    spread = np.logspace(np.log10(1e5), np.log10(10.0), NCOL)[None, :]
    p = 0.0 * p + spread
    import dataclasses

    atm = dataclasses.replace(atm, p_lay=jnp.asarray(p, jnp.float32))
    tabs = gp.build_pallas_tables(lkp)
    ref = go.gas_optics_sw(lkp, atm)
    out = gp.gas_optics_sw(lkp, tabs, atm, block=8)
    for a, b in ((ref.tau, out.tau), (ref.ssa, out.ssa)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b) / (np.abs(a).max() + 1e-30)
        assert rel.max() < 5e-5, rel.max()


def test_lw_clear_megakernel_matches_xla():
    """The single-kernel clear-sky LW solve (ops.pallas_mega.lw_clear_mega:
    optics + Planck sources + no-scat sweep fused, table VMEM-resident) must
    match the XLA reference path."""
    from rrtmgp_tpu.models.rrtmgp import solve_lw
    from rrtmgp_tpu.ops.gas_optics_pallas import compute_min_window
    from rrtmgp_tpu.states import LwBCs

    ncol = 128  # mega path requires 128-col alignment
    lkp = synthetic_gas_lookup(longwave=True, n_gpt=32, n_bnd=4, seed=2, dtype=np.float32)
    atm = synthetic_atmosphere(ncol=ncol, nlay=NLAY, dtype=np.float32)
    tabs = gp.build_pallas_tables(lkp)
    bcs = LwBCs(sfc_emis=jnp.full((lkp.n_bnd, ncol), 0.98, jnp.float32))
    win = compute_min_window(lkp, atm, mega=True)
    ref, _ = solve_lw(lkp, atm, bcs, pallas_rte=False)
    out, _ = solve_lw(
        lkp, atm, bcs, pallas_tables=tabs, pallas_rte=True,
        pallas_windowed="force", pallas_window=win,
    )
    assert out.flux_up.shape == ref.flux_up.shape
    for name in ("flux_up", "flux_dn", "flux_net"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() / scale < 5e-5, (name, np.abs(a - b).max() / scale)


def test_sw_clear_megakernel_matches_xla():
    """Single-kernel clear-sky SW solve vs the XLA reference path."""
    from rrtmgp_tpu.models.rrtmgp import solve_sw
    from rrtmgp_tpu.ops.gas_optics_pallas import compute_min_window
    from rrtmgp_tpu.states import SwBCs

    ncol = 128
    lkp = synthetic_gas_lookup(longwave=False, n_gpt=32, n_bnd=4, seed=2, dtype=np.float32)
    atm = synthetic_atmosphere(ncol=ncol, nlay=NLAY, dtype=np.float32)
    tabs = gp.build_pallas_tables(lkp)
    mu0 = np.full((ncol,), 0.6, np.float32)
    mu0[::7] = -0.1  # night columns must come out exactly zero
    bcs = SwBCs(
        cos_zenith=jnp.asarray(mu0),
        toa_flux=jnp.full((ncol,), 1361.0, jnp.float32),
        sfc_alb_direct=jnp.full((lkp.n_bnd, ncol), 0.2, jnp.float32),
        sfc_alb_diffuse=jnp.full((lkp.n_bnd, ncol), 0.25, jnp.float32),
    )
    win = compute_min_window(lkp, atm, mega=True)
    ref, _ = solve_sw(lkp, atm, bcs, pallas_rte=False)
    out, _ = solve_sw(
        lkp, atm, bcs, pallas_tables=tabs, pallas_rte=True,
        pallas_windowed="force", pallas_window=win,
    )
    # 1e-4: the direct-beam exp(-tau/mu0) chain amplifies the bf16-hi/lo
    # table rounding slightly beyond the LW tolerance
    for name in ("flux_up", "flux_dn", "flux_dn_dir", "flux_net"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() / scale < 1e-4, (name, np.abs(a - b).max() / scale)
    assert np.all(np.asarray(out.flux_dn)[:, ::7] == 0.0)


def _cloudy_setup(longwave, ncol=128):
    import jax

    from rrtmgp_tpu.data.synthetic import synthetic_cloud_lookup
    from rrtmgp_tpu.ops.cloud_optics import build_cloud_mask_mcica

    lkp = synthetic_gas_lookup(
        longwave=longwave, n_gpt=32, n_bnd=4, seed=2, dtype=np.float32
    )
    atm = synthetic_atmosphere(ncol=ncol, nlay=NLAY, dtype=np.float32, with_clouds=True)
    lkp_cld = synthetic_cloud_lookup(n_bnd=4, dtype=np.float32)
    mask = build_cloud_mask_mcica(jax.random.key(0), atm.cloud_state.cld_frac, lkp.n_gpt)
    return lkp, atm, lkp_cld, mask


def test_lw2_cloudy_megakernel_matches_xla():
    """LW two-stream megakernel with McICA cloud composition vs XLA path."""
    from rrtmgp_tpu.models.rrtmgp import solve_lw
    from rrtmgp_tpu.ops.gas_optics_pallas import compute_min_window
    from rrtmgp_tpu.states import LwBCs

    ncol = 128
    lkp, atm, lkp_cld, mask = _cloudy_setup(True, ncol)
    bcs = LwBCs(sfc_emis=jnp.full((lkp.n_bnd, ncol), 0.98, jnp.float32))
    win = compute_min_window(lkp, atm, mega=True)
    kw = dict(two_stream=True, lkp_cld=lkp_cld, cld_mask=mask)
    ref, dref = solve_lw(lkp, atm, bcs, pallas_rte=False, **kw)
    tabs = gp.build_pallas_tables(lkp)
    out, dout = solve_lw(
        lkp, atm, bcs, pallas_tables=tabs, pallas_rte=True,
        pallas_windowed="force", pallas_window=win, **kw,
    )
    for name in ("flux_up", "flux_dn", "flux_net"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() / scale < 1e-4, (name, np.abs(a - b).max() / scale)
    np.testing.assert_allclose(
        np.asarray(dref.cld_cover), np.asarray(dout.cld_cover), rtol=1e-6
    )


def test_lw2_clear_megakernel_matches_xla():
    """LW two-stream megakernel without clouds vs XLA path."""
    from rrtmgp_tpu.models.rrtmgp import solve_lw
    from rrtmgp_tpu.ops.gas_optics_pallas import compute_min_window
    from rrtmgp_tpu.states import LwBCs

    ncol = 128
    lkp = synthetic_gas_lookup(longwave=True, n_gpt=32, n_bnd=4, seed=2, dtype=np.float32)
    atm = synthetic_atmosphere(ncol=ncol, nlay=NLAY, dtype=np.float32)
    bcs = LwBCs(sfc_emis=jnp.full((lkp.n_bnd, ncol), 0.98, jnp.float32))
    win = compute_min_window(lkp, atm, mega=True)
    ref, _ = solve_lw(lkp, atm, bcs, pallas_rte=False, two_stream=True)
    tabs = gp.build_pallas_tables(lkp)
    out, _ = solve_lw(
        lkp, atm, bcs, pallas_tables=tabs, pallas_rte=True, two_stream=True,
        pallas_windowed="force", pallas_window=win,
    )
    for name in ("flux_up", "flux_dn", "flux_net"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() / scale < 1e-4, (name, np.abs(a - b).max() / scale)


def test_sw_cloudy_megakernel_matches_xla():
    """SW megakernel with McICA cloud composition vs XLA path."""
    from rrtmgp_tpu.models.rrtmgp import solve_sw
    from rrtmgp_tpu.ops.gas_optics_pallas import compute_min_window
    from rrtmgp_tpu.states import SwBCs

    ncol = 128
    lkp, atm, lkp_cld, mask = _cloudy_setup(False, ncol)
    bcs = SwBCs(
        cos_zenith=jnp.full((ncol,), 0.6, jnp.float32),
        toa_flux=jnp.full((ncol,), 1361.0, jnp.float32),
        sfc_alb_direct=jnp.full((lkp.n_bnd, ncol), 0.2, jnp.float32),
        sfc_alb_diffuse=jnp.full((lkp.n_bnd, ncol), 0.25, jnp.float32),
    )
    win = compute_min_window(lkp, atm, mega=True)
    kw = dict(lkp_cld=lkp_cld, cld_mask=mask)
    ref, _ = solve_sw(lkp, atm, bcs, pallas_rte=False, **kw)
    tabs = gp.build_pallas_tables(lkp)
    out, _ = solve_sw(
        lkp, atm, bcs, pallas_tables=tabs, pallas_rte=True,
        pallas_windowed="force", pallas_window=win, **kw,
    )
    for name in ("flux_up", "flux_dn", "flux_dn_dir", "flux_net"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() / scale < 1e-4, (name, np.abs(a - b).max() / scale)


def test_lw_noscat_cloudy_aerosol_megakernel_matches_xla():
    """LW no-scat megakernel with McICA cloud AND aerosol absorption-only
    composition (ref cloud_optics.jl:1-49, aerosol_optics.jl 1-scalar add)
    vs the XLA path."""
    import jax

    from rrtmgp_tpu.data.synthetic import (
        synthetic_aerosol_lookup,
        synthetic_cloud_lookup,
    )
    from rrtmgp_tpu.models.rrtmgp import solve_lw
    from rrtmgp_tpu.ops.cloud_optics import build_cloud_mask_mcica
    from rrtmgp_tpu.ops.gas_optics_pallas import compute_min_window
    from rrtmgp_tpu.states import LwBCs

    ncol = 128
    lkp = synthetic_gas_lookup(longwave=True, n_gpt=32, n_bnd=4, seed=2, dtype=np.float32)
    atm = synthetic_atmosphere(
        ncol=ncol, nlay=NLAY, dtype=np.float32, with_clouds=True, with_aerosols=True
    )
    lkp_cld = synthetic_cloud_lookup(n_bnd=4, dtype=np.float32)
    lkp_aero = synthetic_aerosol_lookup(n_bnd=4, dtype=np.float32)
    mask = build_cloud_mask_mcica(jax.random.key(0), atm.cloud_state.cld_frac, lkp.n_gpt)
    bcs = LwBCs(sfc_emis=jnp.full((lkp.n_bnd, ncol), 0.98, jnp.float32))
    win = compute_min_window(lkp, atm, mega=True)
    tabs = gp.build_pallas_tables(lkp)
    for kw in (
        dict(lkp_cld=lkp_cld, cld_mask=mask),
        dict(lkp_cld=lkp_cld, cld_mask=mask, lkp_aero=lkp_aero),
    ):
        ref, dref = solve_lw(lkp, atm, bcs, pallas_rte=False, **kw)
        out, dout = solve_lw(
            lkp, atm, bcs, pallas_tables=tabs, pallas_rte=True,
            pallas_windowed="force", pallas_window=win, **kw,
        )
        for name in ("flux_up", "flux_dn", "flux_net"):
            a = np.asarray(getattr(ref, name))
            b = np.asarray(getattr(out, name))
            scale = np.abs(a).max() + 1e-30
            assert np.abs(a - b).max() / scale < 1e-4, (
                sorted(kw), name, np.abs(a - b).max() / scale,
            )
        np.testing.assert_allclose(
            np.asarray(dref.cld_cover), np.asarray(dout.cld_cover), rtol=1e-6
        )


def test_allsky_aerosol_megakernels_match_xla():
    """LW two-stream + SW megakernels with cloud AND aerosol composition."""
    import jax

    from rrtmgp_tpu.data.synthetic import synthetic_aerosol_lookup, synthetic_cloud_lookup
    from rrtmgp_tpu.models.rrtmgp import solve_lw, solve_sw
    from rrtmgp_tpu.ops.cloud_optics import build_cloud_mask_mcica
    from rrtmgp_tpu.ops.gas_optics_pallas import compute_min_window
    from rrtmgp_tpu.states import LwBCs, SwBCs

    ncol = 128
    atm = synthetic_atmosphere(
        ncol=ncol, nlay=NLAY, dtype=np.float32, with_clouds=True, with_aerosols=True
    )
    for longwave in (True, False):
        lkp = synthetic_gas_lookup(
            longwave=longwave, n_gpt=32, n_bnd=4, seed=2, dtype=np.float32
        )
        lkp_cld = synthetic_cloud_lookup(n_bnd=4, dtype=np.float32)
        lkp_aero = synthetic_aerosol_lookup(n_bnd=4, dtype=np.float32)
        mask = build_cloud_mask_mcica(
            jax.random.key(0), atm.cloud_state.cld_frac, lkp.n_gpt
        )
        win = compute_min_window(lkp, atm, mega=True)
        tabs = gp.build_pallas_tables(lkp)
        kw = dict(lkp_cld=lkp_cld, lkp_aero=lkp_aero, cld_mask=mask)
        if longwave:
            bcs = LwBCs(sfc_emis=jnp.full((lkp.n_bnd, ncol), 0.98, jnp.float32))
            ref, _ = solve_lw(lkp, atm, bcs, pallas_rte=False, two_stream=True, **kw)
            out, _ = solve_lw(
                lkp, atm, bcs, pallas_tables=tabs, pallas_rte=True, two_stream=True,
                pallas_windowed="force", pallas_window=win, **kw,
            )
            names = ("flux_up", "flux_dn", "flux_net")
        else:
            bcs = SwBCs(
                cos_zenith=jnp.full((ncol,), 0.6, jnp.float32),
                toa_flux=jnp.full((ncol,), 1361.0, jnp.float32),
                sfc_alb_direct=jnp.full((lkp.n_bnd, ncol), 0.2, jnp.float32),
                sfc_alb_diffuse=jnp.full((lkp.n_bnd, ncol), 0.25, jnp.float32),
            )
            ref, dref = solve_sw(lkp, atm, bcs, pallas_rte=False, **kw)
            out, dout = solve_sw(
                lkp, atm, bcs, pallas_tables=tabs, pallas_rte=True,
                pallas_windowed="force", pallas_window=win, **kw,
            )
            names = ("flux_up", "flux_dn", "flux_dn_dir", "flux_net")
            np.testing.assert_allclose(
                np.asarray(dref.aod_sw_ext), np.asarray(dout.aod_sw_ext), rtol=1e-6
            )
        for name in names:
            a = np.asarray(getattr(ref, name))
            b = np.asarray(getattr(out, name))
            scale = np.abs(a).max() + 1e-30
            assert np.abs(a - b).max() / scale < 1e-4, (
                longwave, name, np.abs(a - b).max() / scale,
            )


def test_sw_megakernel_cos_zenith_edge_cases():
    """mu0 in {0, tiny, negative, 1} must give finite fluxes and exact zeros
    for night columns through the megakernel path
    (ref /root/reference/test/cos_zenith_edge_cases.jl:34-47)."""
    from rrtmgp_tpu.models.rrtmgp import solve_sw
    from rrtmgp_tpu.ops.gas_optics_pallas import compute_min_window
    from rrtmgp_tpu.states import SwBCs

    ncol = 128
    lkp = synthetic_gas_lookup(longwave=False, n_gpt=32, n_bnd=4, seed=2, dtype=np.float32)
    atm = synthetic_atmosphere(ncol=ncol, nlay=NLAY, dtype=np.float32)
    mu0 = np.full((ncol,), 0.6, np.float32)
    mu0[0] = 0.0
    mu0[1] = 1e-7
    mu0[2] = -0.5
    mu0[3] = 1.0
    bcs = SwBCs(
        cos_zenith=jnp.asarray(mu0),
        toa_flux=jnp.full((ncol,), 1361.0, jnp.float32),
        sfc_alb_direct=jnp.full((lkp.n_bnd, ncol), 0.2, jnp.float32),
        sfc_alb_diffuse=jnp.full((lkp.n_bnd, ncol), 0.25, jnp.float32),
    )
    win = compute_min_window(lkp, atm, mega=True)
    tabs = gp.build_pallas_tables(lkp)
    out, _ = solve_sw(
        lkp, atm, bcs, pallas_tables=tabs, pallas_rte=True,
        pallas_windowed="force", pallas_window=win,
    )
    for name in ("flux_up", "flux_dn", "flux_dn_dir", "flux_net"):
        a = np.asarray(getattr(out, name))
        assert np.isfinite(a).all(), name
        assert np.all(a[:, 0] == 0.0) and np.all(a[:, 2] == 0.0), name


def test_megakernel_inkernel_mcica_deterministic():
    """cld_mask_seed (in-kernel TPU-PRNG McICA) must reproduce the external-
    mask path exactly when cld_frac is {0,1} (deterministic sampling — the
    reference's test configuration, ref test/runtests.jl:44-45)."""
    import jax

    from rrtmgp_tpu.data.synthetic import synthetic_cloud_lookup
    from rrtmgp_tpu.models.rrtmgp import solve_lw, solve_sw
    from rrtmgp_tpu.ops.cloud_optics import build_cloud_mask_mcica
    from rrtmgp_tpu.ops.gas_optics_pallas import compute_min_window
    from rrtmgp_tpu.states import LwBCs, SwBCs

    ncol = 128
    atm = synthetic_atmosphere(ncol=ncol, nlay=NLAY, dtype=np.float32, with_clouds=True)
    seed = jnp.asarray(7, jnp.int32)
    for longwave in (True, False):
        lkp = synthetic_gas_lookup(
            longwave=longwave, n_gpt=32, n_bnd=4, seed=2, dtype=np.float32
        )
        lkp_cld = synthetic_cloud_lookup(n_bnd=4, dtype=np.float32)
        mask = build_cloud_mask_mcica(
            jax.random.key(0), atm.cloud_state.cld_frac, lkp.n_gpt
        )
        win = compute_min_window(lkp, atm, mega=True)
        tabs = gp.build_pallas_tables(lkp)
        com = dict(
            pallas_tables=tabs, pallas_rte=True,
            pallas_windowed="force", pallas_window=win, lkp_cld=lkp_cld,
        )
        if longwave:
            bcs = LwBCs(sfc_emis=jnp.full((lkp.n_bnd, ncol), 0.98, jnp.float32))
            ref, dref = solve_lw(lkp, atm, bcs, two_stream=True, cld_mask=mask, **com)
            out, dout = solve_lw(
                lkp, atm, bcs, two_stream=True, cld_mask_seed=seed, **com
            )
        else:
            bcs = SwBCs(
                cos_zenith=jnp.full((ncol,), 0.6, jnp.float32),
                toa_flux=jnp.full((ncol,), 1361.0, jnp.float32),
                sfc_alb_direct=jnp.full((lkp.n_bnd, ncol), 0.2, jnp.float32),
                sfc_alb_diffuse=jnp.full((lkp.n_bnd, ncol), 0.25, jnp.float32),
            )
            ref, dref = solve_sw(lkp, atm, bcs, cld_mask=mask, **com)
            out, dout = solve_sw(lkp, atm, bcs, cld_mask_seed=seed, **com)
        np.testing.assert_allclose(
            np.asarray(ref.flux_up), np.asarray(out.flux_up), rtol=1e-6, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(dref.cld_cover), np.asarray(dout.cld_cover), rtol=1e-6
        )


def test_lw_noscat_cloudy_pallas_matches_xla():
    """Cloudy LW no-scat (absorption-only cloud add, ref cloud_optics.jl:1-49)
    through the Pallas two-kernel path vs the XLA path."""
    from rrtmgp_tpu.models.rrtmgp import solve_lw
    from rrtmgp_tpu.states import LwBCs

    ncol = 128
    lkp, atm, lkp_cld, mask = _cloudy_setup(True, ncol)
    bcs = LwBCs(sfc_emis=jnp.full((lkp.n_bnd, ncol), 0.98, jnp.float32))
    kw = dict(two_stream=False, lkp_cld=lkp_cld, cld_mask=mask)
    ref, _ = solve_lw(lkp, atm, bcs, pallas_rte=False, **kw)
    tabs = gp.build_pallas_tables(lkp)
    out, _ = solve_lw(lkp, atm, bcs, pallas_tables=tabs, pallas_rte=True, **kw)
    for name in ("flux_up", "flux_dn"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() / scale < 1e-4, (name, np.abs(a - b).max() / scale)
