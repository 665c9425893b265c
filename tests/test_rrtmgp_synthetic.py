"""Full-physics pipeline tests on synthetic lookup tables.

Without network access to rrtmgp-data artifacts, correctness rests on
physics invariants that are *exact* for the implemented numerics (see each
test), mirroring the reference's layered-oracle strategy (SURVEY.md section 4).
Golden-flux comparisons vs the Fortran reference activate when real data is
present (tests/test_real_data.py).

All solves run under jit: eager per-primitive dispatch compiles are
pathologically slow on this box (see tests/conftest.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rrtmgp_tpu.data.synthetic import (
    synthetic_aerosol_lookup,
    synthetic_atmosphere,
    synthetic_cloud_lookup,
    synthetic_gas_lookup,
)
from rrtmgp_tpu.models.rrtmgp import solve_lw, solve_sw
from rrtmgp_tpu.ops.cloud_optics import build_cloud_mask_mcica
from rrtmgp_tpu.ops.gas_optics import _planck_interp_band, gas_optics_lw, gas_optics_sw
from rrtmgp_tpu.states import LwBCs, SwBCs

NBND = 2
NGPT = 16
NCOL = 8
NLAY = 42

LKP_LW = synthetic_gas_lookup(longwave=True, n_gpt=NGPT, n_bnd=NBND)
LKP_SW = synthetic_gas_lookup(longwave=False, n_gpt=NGPT, n_bnd=NBND, seed=1)
LKP_CLD = synthetic_cloud_lookup(n_bnd=NBND)
LKP_AERO = synthetic_aerosol_lookup(n_bnd=NBND)
ATMOS = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, with_clouds=True, with_aerosols=True)
BCS_LW = LwBCs(sfc_emis=jnp.full((NBND, NCOL), 0.98))
BCS_SW = SwBCs(
    cos_zenith=jnp.full((NCOL,), 0.6),
    toa_flux=jnp.full((NCOL,), 1361.0),
    sfc_alb_direct=jnp.full((NBND, NCOL), 0.2),
    sfc_alb_diffuse=jnp.full((NBND, NCOL), 0.2),
)

# jitted entry points (compiled once per configuration, persisted in the
# compilation cache across runs)
F_LW_NOSCAT = jax.jit(lambda a, b: solve_lw(LKP_LW, a, b)[0])
F_LW_2STR = jax.jit(lambda a, b: solve_lw(LKP_LW, a, b, two_stream=True)[0])
F_LW_SCALED = jax.jit(lambda a, b, s: solve_lw(LKP_LW, a, b, metric_scaling=s)[0])
F_LW_ALLSKY = jax.jit(
    lambda a, b, m: solve_lw(
        LKP_LW, a, b, two_stream=True, lkp_cld=LKP_CLD, lkp_aero=LKP_AERO, cld_mask=m
    )
)
F_SW = jax.jit(lambda a, b: solve_sw(LKP_SW, a, b)[0])
F_SW_AERO = jax.jit(lambda a, b: solve_sw(LKP_SW, a, b, lkp_aero=LKP_AERO))
F_OPTICS_LW = jax.jit(lambda a: gas_optics_lw(LKP_LW, a))
F_OPTICS_SW = jax.jit(lambda a: gas_optics_sw(LKP_SW, a))
F_MASK = jax.jit(
    lambda k, cf: build_cloud_mask_mcica(k, cf, NGPT)
)


def test_lw_shapes_finite():
    for f in (F_LW_NOSCAT, F_LW_2STR):
        flux = f(ATMOS, BCS_LW)
        assert flux.flux_up.shape == (NLAY + 1, NCOL)
        assert bool(jnp.all(jnp.isfinite(flux.flux_up)))
        assert bool(jnp.all(jnp.isfinite(flux.flux_dn)))
        # TOA incoming LW is zero without inc_flux
        assert float(jnp.max(jnp.abs(flux.flux_dn[-1]))) == 0.0
        assert float(jnp.min(flux.flux_up)) >= 0.0


def test_isothermal_blackbody_equilibrium_exact():
    """Isothermal atmosphere + black surface + constant VMR: flux_up at every
    level equals pi * sum_bands totplnk(T) to float64 roundoff.

    With constant VMR and temperature, the Planck fraction still varies with
    layer PRESSURE; a press-constant planck_fraction LUT makes the per-layer
    fractions identical so the geometric-mean level source (ref Optics.jl:242)
    telescopes exactly. Exercises kmajor/minor interpolation, Planck sources,
    and the no-scat transport end-to-end.
    """
    # press- and eta-constant fractions: eta changes across the tropopause
    # (key-species vmr_ref rows differ by atmosphere side), so only the
    # (gpt, temp) axes may vary for per-layer-identical fractions.
    pf = np.asarray(LKP_LW.planck_fraction)
    pf_const = jnp.asarray(np.broadcast_to(pf[:, :1, :, :1], pf.shape))
    lkp_iso = dataclasses.replace(LKP_LW, planck_fraction=pf_const)
    T0 = 280.0
    vmr = dataclasses.replace(
        ATMOS.vmr,
        vmr_h2o=jnp.full_like(ATMOS.vmr.vmr_h2o, 1e-3),
        vmr_o3=jnp.full_like(ATMOS.vmr.vmr_o3, 1e-6),
    )
    iso = dataclasses.replace(
        ATMOS,
        t_lay=jnp.full_like(ATMOS.t_lay, T0),
        t_lev=jnp.full_like(ATMOS.t_lev, T0),
        t_sfc=jnp.full_like(ATMOS.t_sfc, T0),
        vmr=vmr,
    )
    flux = jax.jit(lambda a, b: solve_lw(lkp_iso, a, b)[0])(
        iso, LwBCs(sfc_emis=jnp.ones((NBND, NCOL)))
    )
    expect = float(
        jnp.pi * sum(_planck_interp_band(LKP_LW, jnp.asarray(T0), b) for b in range(NBND))
    )
    np.testing.assert_allclose(np.asarray(flux.flux_up), expect, rtol=1e-10)


def test_sw_direct_beam_monotone_and_exact():
    """Direct beam decreases monotonically and matches exp(-sum tau / mu0)."""
    flux = F_SW(ATMOS, BCS_SW)
    dn_dir = np.asarray(flux.flux_dn_dir)
    assert np.all(np.diff(dn_dir, axis=0) >= -1e-9)

    optics = F_OPTICS_SW(ATMOS)
    mu0 = np.asarray(BCS_SW.cos_zenith)
    toa = np.asarray(BCS_SW.toa_flux)
    frac = np.asarray(LKP_SW.solar_src_scaled)
    tau_sum = np.asarray(optics.tau).sum(axis=0)  # (ncol, ngpt)
    expect_sfc = (
        toa[:, None] * frac[None, :] * mu0[:, None] * np.exp(-tau_sum / mu0[:, None])
    ).sum(-1)
    np.testing.assert_allclose(dn_dir[0], expect_sfc, rtol=1e-10)


def test_sw_energy_conservation():
    """Up flux at TOA never exceeds incoming; fluxes non-negative."""
    flux = F_SW(ATMOS, BCS_SW)
    incoming = np.asarray(BCS_SW.toa_flux) * np.asarray(BCS_SW.cos_zenith)
    assert np.all(np.asarray(flux.flux_up[-1]) <= incoming + 1e-9)
    assert float(jnp.min(flux.flux_up)) >= 0.0
    assert float(jnp.min(flux.flux_dn)) >= 0.0


def test_sw_night_columns():
    bcs = dataclasses.replace(BCS_SW, cos_zenith=jnp.asarray([0.6, 0.0, -0.2, 1e-6] * (NCOL // 4)))
    flux = F_SW(ATMOS, bcs)
    up = np.asarray(flux.flux_up)
    assert np.all(np.isfinite(up))
    night = np.asarray(bcs.cos_zenith) <= 0
    assert np.all(up[:, night] == 0.0)
    assert np.all(np.asarray(flux.flux_dn)[:, night] == 0.0)


def test_column_permutation_equivariance():
    """Permuting columns permutes fluxes — no cross-column coupling.

    Only per-column leaves are permuted (the global-mean vmr vector is NOT
    indexed by column).
    """
    perm = np.array([3, 1, 7, 0, 5, 2, 6, 4])

    def permute_cols(x):
        arr = np.asarray(x)
        if arr.ndim >= 1 and arr.shape[-1] == NCOL:
            return jnp.asarray(arr[..., perm])
        return x

    vmr_p = dataclasses.replace(
        ATMOS.vmr,
        vmr_h2o=permute_cols(ATMOS.vmr.vmr_h2o),
        vmr_o3=permute_cols(ATMOS.vmr.vmr_o3),
    )
    atmos_p = dataclasses.replace(
        ATMOS,
        p_lay=permute_cols(ATMOS.p_lay),
        t_lay=permute_cols(ATMOS.t_lay),
        p_lev=permute_cols(ATMOS.p_lev),
        t_lev=permute_cols(ATMOS.t_lev),
        t_sfc=permute_cols(ATMOS.t_sfc),
        col_dry=permute_cols(ATMOS.col_dry),
        rel_hum=permute_cols(ATMOS.rel_hum),
        vmr=vmr_p,
        cloud_state=None,
        aerosol_state=None,
    )
    atmos_0 = dataclasses.replace(ATMOS, cloud_state=None, aerosol_state=None)
    flux0 = F_LW_NOSCAT(atmos_0, BCS_LW)
    flux1 = F_LW_NOSCAT(atmos_p, LwBCs(sfc_emis=jnp.asarray(np.asarray(BCS_LW.sfc_emis)[:, perm])))
    np.testing.assert_allclose(
        np.asarray(flux0.flux_up)[:, perm], np.asarray(flux1.flux_up), rtol=1e-12
    )


def test_cloud_optics_mcica_and_cover():
    """cld_frac in {0,1} -> deterministic mask; cloud-cover diagnostic correct."""
    mask = F_MASK(jax.random.key(0), ATMOS.cloud_state.cld_frac)
    expect_mask = np.asarray(ATMOS.cloud_state.cld_frac > 0)[:, :, None]
    assert np.array_equal(np.asarray(mask), np.broadcast_to(expect_mask, mask.shape))

    flux, diag = F_LW_ALLSKY(ATMOS, BCS_LW, mask)
    assert bool(jnp.all(jnp.isfinite(flux.flux_up)))
    # columns 2 and 5 have no cloud (synthetic builder pattern: col % 3 == 2)
    cover = np.asarray(diag.cld_cover)
    assert np.all((cover == 0.0) | (cover == 1.0))
    assert cover[2] == 0.0 and cover[5] == 0.0 and cover[0] == 1.0


def test_aerosol_aod_diagnostics():
    """AOD at 550 nm collected on the SW path; ext >= sca >= 0
    (ref /root/reference/test/all_sky_with_aerosols_utils.jl:221-223)."""
    flux, diag = F_SW_AERO(ATMOS, BCS_SW)
    assert diag.aod_sw_ext is not None
    aod_ext = np.asarray(diag.aod_sw_ext)
    aod_sca = np.asarray(diag.aod_sw_sca)
    assert np.all(aod_ext > 0.0)
    assert np.all(aod_ext >= aod_sca)
    assert bool(jnp.all(jnp.isfinite(flux.flux_up)))


def test_mcica_marginal_distribution():
    """McICA max-random-overlap marginal: P(cloudy at layer) == cld_frac."""
    nlay, ncol = 10, 2
    cld_frac = jnp.broadcast_to(jnp.linspace(0.0, 0.9, nlay)[:, None], (nlay, ncol))
    n_gpt = 4000
    mask = jax.jit(lambda k: build_cloud_mask_mcica(k, cld_frac, n_gpt))(jax.random.key(42))
    freq = np.asarray(jnp.mean(mask.astype(jnp.float32), axis=-1))  # (nlay, ncol)
    np.testing.assert_allclose(freq, np.asarray(cld_frac), atol=0.03)


def test_metric_scaling():
    """scaling=2 doubles fluxes exactly
    (ref /root/reference/test/all_sky_with_aerosols_utils.jl:252-270)."""
    scale = jnp.full((NLAY + 1, NCOL), 2.0)
    f1 = F_LW_NOSCAT(ATMOS, BCS_LW)
    f2 = F_LW_SCALED(ATMOS, BCS_LW, scale)
    np.testing.assert_allclose(np.asarray(f2.flux_up), 2 * np.asarray(f1.flux_up), rtol=1e-12)


def test_gas_optics_tau_nonnegative():
    lw = F_OPTICS_LW(ATMOS)
    sw = F_OPTICS_SW(ATMOS)
    assert float(jnp.min(lw.tau)) >= 0.0
    assert float(jnp.min(sw.tau)) >= 0.0
    assert float(jnp.min(sw.ssa)) >= 0.0
    assert float(jnp.max(sw.ssa)) <= 1.0
    assert float(jnp.min(lw.sources.lev_source)) > 0.0


def test_f32_dtype_matrix():
    """f32 is first-class like the reference's Float32 test matrix
    (ref test/runtests.jl:21-30): the same invariants hold at f32
    tolerances (isothermal equilibrium ~1e-4 rel, night columns exact,
    SW energy conservation exact)."""
    lkp_lw = synthetic_gas_lookup(longwave=True, n_gpt=NGPT, n_bnd=NBND, dtype=np.float32)
    lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=NGPT, n_bnd=NBND, seed=1, dtype=np.float32)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=np.float32)
    f32 = jnp.float32

    # isothermal equilibrium at f32
    pf = np.asarray(lkp_lw.planck_fraction)
    pf_const = jnp.asarray(np.broadcast_to(pf[:, :1, :, :1], pf.shape))
    lkp_iso = dataclasses.replace(lkp_lw, planck_fraction=pf_const)
    T0 = 280.0
    vmr = dataclasses.replace(
        atm.vmr,
        vmr_h2o=jnp.full_like(atm.vmr.vmr_h2o, 1e-3),
        vmr_o3=jnp.full_like(atm.vmr.vmr_o3, 1e-6),
    )
    iso = dataclasses.replace(
        atm,
        t_lay=jnp.full_like(atm.t_lay, T0),
        t_lev=jnp.full_like(atm.t_lev, T0),
        t_sfc=jnp.full_like(atm.t_sfc, T0),
        vmr=vmr,
    )
    flux = jax.jit(lambda a, b: solve_lw(lkp_iso, a, b)[0])(
        iso, LwBCs(sfc_emis=jnp.ones((NBND, NCOL), f32))
    )
    assert flux.flux_up.dtype == f32
    expect = float(
        jnp.pi * sum(
            _planck_interp_band(lkp_lw, jnp.asarray(T0, f32), b) for b in range(NBND)
        )
    )
    np.testing.assert_allclose(np.asarray(flux.flux_up), expect, rtol=2e-4)

    # SW night-column zeroing + energy conservation at f32
    bcs = SwBCs(
        cos_zenith=jnp.asarray([0.6, 0.0, -0.2, 1e-6] * (NCOL // 4), f32),
        toa_flux=jnp.full((NCOL,), 1361.0, f32),
        sfc_alb_direct=jnp.full((NBND, NCOL), 0.2, f32),
        sfc_alb_diffuse=jnp.full((NBND, NCOL), 0.2, f32),
    )
    fsw = jax.jit(lambda a, b: solve_sw(lkp_sw, a, b)[0])(atm, bcs)
    assert fsw.flux_up.dtype == f32
    up = np.asarray(fsw.flux_up)
    assert np.all(np.isfinite(up))
    night = np.asarray(bcs.cos_zenith) <= 0
    assert np.all(up[:, night] == 0.0)
    incoming = np.asarray(bcs.toa_flux) * np.asarray(bcs.cos_zenith)
    day = ~night
    assert np.all(up[-1, day] <= incoming[day] + 1e-4)
    assert float(jnp.min(fsw.flux_up)) >= 0.0
