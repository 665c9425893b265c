"""Loader tests: write a synthetic rrtmgp-data-shaped NetCDF file and load it.

Exercises data/netcdf.py + data/loader.py end-to-end without network access:
variable parsing, axis-order inference, gas-name indexing with h2o aliases,
key-species 0/0 -> 2/2 rule, minor-interval metadata, and SW solar-source
composition (ref /root/reference/ext/lookup_constructors.jl).
"""

import os

import numpy as np
import pytest

from rrtmgp_tpu.data.loader import load_gas_lookup
from rrtmgp_tpu.data.netcdf import Dataset

NBND, NGPT, NETA, NPRESS, NTEMP, NPLNK = 2, 32, 9, 20, 6, 30
GASES = ["h2o", "co2", "o3", "n2o"]
STRLEN = 32


def _write_gas_nc(path, longwave=True, reverse=False, nbnd=NBND, ntemp=NTEMP):
    """Write an rrtmgp-gas-*-shaped NetCDF file.

    ``reverse=True`` writes every multi-dim variable with its axes REVERSED
    (Fortran-style header order) — the loader must produce identical lookups
    because it permutes by dimension NAME. ``nbnd``/``ntemp`` allow dim-size
    collisions (the real hazard: temperature == nbnd_sw == 14 in g224 files),
    which size-based matching cannot resolve.
    """
    from scipy.io import netcdf_file

    per_bnd = NGPT // nbnd
    rng = np.random.default_rng(0)
    f = netcdf_file(path, "w")
    f.createDimension("bnd", nbnd)
    f.createDimension("gpt", NGPT)
    f.createDimension("atmos_layer", 2)
    f.createDimension("temperature", ntemp)
    f.createDimension("pressure", NPRESS)
    f.createDimension("mixing_fraction", NETA)
    f.createDimension("absorber", len(GASES))
    f.createDimension("absorber_ext", len(GASES) + 1)
    f.createDimension("minor_absorber_intervals_lower", 2)
    f.createDimension("minor_absorber_intervals_upper", 1)
    f.createDimension("contributors_lower", 2 * per_bnd)
    f.createDimension("contributors_upper", per_bnd)
    f.createDimension("pair", 2)
    f.createDimension("string_len", STRLEN)
    f.createDimension("one", 1)
    f.createDimension("pressure_interp", NPRESS + 1)
    if longwave:
        f.createDimension("temperature_Planck", NPLNK)

    def chars(names, dim):
        v = f.createVariable(dim + "_var_tmp", "c", (dim, "string_len"))
        arr = np.zeros((len(names), STRLEN), dtype="S1")
        for i, n in enumerate(names):
            for j, ch in enumerate(n):
                arr[i, j] = ch.encode()
        v[:] = arr
        return v

    # gas names
    gv = f.createVariable("gas_names", "c", ("absorber", "string_len"))
    arr = np.full((len(GASES), STRLEN), b" ", dtype="S1")
    for i, n in enumerate(GASES):
        arr[i, : len(n)] = list(n.encode().decode())
    gv[:] = arr

    def mk(name, dims, data):
        data = np.asarray(data)
        if reverse and data.ndim > 1:
            dims = tuple(dims)[::-1]
            data = np.transpose(data)
        v = f.createVariable(name, "d", dims)
        if dims == ():
            v.assignValue(data)
        else:
            v[:] = data
        return v

    p_ref = np.logspace(np.log10(105000.0), np.log10(10.0), NPRESS)
    mk("press_ref", ("pressure",), p_ref)
    mk("temp_ref", ("temperature",), np.linspace(160.0, 360.0, ntemp))
    mk("press_ref_trop", ("one",), np.array([9948.4]))
    mk("absorption_coefficient_ref_T", ("one",), np.array([250.0]))
    mk("absorption_coefficient_ref_P", ("one",), np.array([1000.0]))

    # key_species (bnd, atmos_layer, pair); odd bands have 0/0 upper -> 2/2 rule
    ks = np.array(
        [[[1, 2], [1, 2]] if b % 2 == 0 else [[3, 2], [0, 0]] for b in range(nbnd)],
        np.int32,
    )
    mk("key_species", ("bnd", "atmos_layer", "pair"), ks)
    bl = np.array([[b * per_bnd + 1, (b + 1) * per_bnd] for b in range(nbnd)])
    mk("bnd_limits_gpt", ("bnd", "pair"), bl)
    mk("bnd_limits_wavenumber", ("bnd", "pair"),
       np.stack([np.linspace(10.0, 1200.0, nbnd), np.linspace(350.0, 1300.0, nbnd)], 1))

    # SMOOTH positive tables at physical magnitudes (real k-tables are smooth
    # in (T, p, eta); random values make f32 grid-index flips O(1) errors and
    # break the reference's f32 golden tolerances in the rehearsal). tau =
    # kmajor * col_mix * col_dry ~ O(1) for col_dry ~ 5e21 molecules/cm^2.
    def smoothf(shape, scale, phase=0.0, spread=0.8):
        grids = np.meshgrid(
            *[np.linspace(0.0, 1.0, n) for n in shape], indexing="ij"
        )
        z = sum(
            np.sin(2.0 * np.pi * (0.7 + 0.31 * i) * g + phase + 1.3 * i)
            for i, g in enumerate(grids)
        )
        return scale * np.exp(spread * z / max(len(shape), 1))

    # kmajor file order: (temperature, pressure_interp, mixing_fraction, gpt)
    kmajor = smoothf((ntemp, NPRESS + 1, NETA, NGPT), 2e-22)
    kmajor *= np.linspace(0.3, 1.5, NPRESS + 1)[None, :, None, None]
    mk("kmajor", ("temperature", "pressure_interp", "mixing_fraction", "gpt"), kmajor)
    vmr_ref = smoothf((2, len(GASES) + 1, ntemp), 1.0, phase=0.4) + 0.1
    mk("vmr_ref", ("atmos_layer", "absorber_ext", "temperature"), vmr_ref)

    # minor gases
    lv = f.createVariable("minor_gases_lower", "c", ("minor_absorber_intervals_lower", "string_len"))
    la = np.full((2, STRLEN), b" ", dtype="S1")
    for i, n in enumerate(["n2o", "co2"]):
        la[i, : len(n)] = list(n)
    lv[:] = la
    sv = f.createVariable("scaling_gas_lower", "c", ("minor_absorber_intervals_lower", "string_len"))
    sa = np.full((2, STRLEN), b" ", dtype="S1")
    sa[0, :3] = list("h2o")
    sv[:] = sa
    uv = f.createVariable("minor_gases_upper", "c", ("minor_absorber_intervals_upper", "string_len"))
    ua = np.full((1, STRLEN), b" ", dtype="S1")
    ua[0, :3] = list("o3\x00"[:3])
    ua[0, :2] = list("o3")
    uv[:] = ua
    suv = f.createVariable("scaling_gas_upper", "c", ("minor_absorber_intervals_upper", "string_len"))
    suv[:] = np.full((1, STRLEN), b" ", dtype="S1")

    mk("minor_scales_with_density_lower", ("minor_absorber_intervals_lower",), np.array([1, 0]))
    mk("minor_scales_with_density_upper", ("minor_absorber_intervals_upper",), np.array([0]))
    mk("scale_by_complement_lower", ("minor_absorber_intervals_lower",), np.array([1, 0]))
    mk("scale_by_complement_upper", ("minor_absorber_intervals_upper",), np.array([0]))
    mk("minor_limits_gpt_lower", ("minor_absorber_intervals_lower", "pair"),
       np.array([[1, per_bnd], [NGPT - per_bnd + 1, NGPT]]))
    mk("minor_limits_gpt_upper", ("minor_absorber_intervals_upper", "pair"),
       np.array([[1, per_bnd]]))
    mk("kminor_start_lower", ("minor_absorber_intervals_lower",), np.array([1, per_bnd + 1]))
    mk("kminor_start_upper", ("minor_absorber_intervals_upper",), np.array([1]))
    mk(
        "kminor_lower",
        ("temperature", "mixing_fraction", "contributors_lower"),
        smoothf((ntemp, NETA, 2 * per_bnd), 3e-24, phase=0.9),
    )
    mk(
        "kminor_upper",
        ("temperature", "mixing_fraction", "contributors_upper"),
        smoothf((ntemp, NETA, per_bnd), 3e-24, phase=1.7),
    )

    if longwave:
        # smooth fractions O(1); per-band normalization is not required by
        # the loader, only positivity/smoothness
        mk(
            "plank_fraction",
            ("temperature", "pressure_interp", "mixing_fraction", "gpt"),
            smoothf((ntemp, NPRESS + 1, NETA, NGPT), 1.0 / NGPT, phase=2.3),
        )
        mk("temperature_Planck", ("temperature_Planck",), np.linspace(160.0, 355.0, NPLNK))
        t_plnk = np.linspace(160.0, 355.0, NPLNK)
        sigma = 5.67e-8
        totplnk = np.stack(
            [(sigma * t_plnk**4 / np.pi) / nbnd * (0.8 + 0.4 * b / max(nbnd - 1, 1))
             for b in range(nbnd)], axis=1,
        )
        mk("totplnk", ("temperature_Planck", "bnd"), totplnk)
    else:
        mk(
            "rayl_lower",
            ("temperature", "mixing_fraction", "gpt"),
            smoothf((ntemp, NETA, NGPT), 1e-26, phase=0.2),
        )
        mk(
            "rayl_upper",
            ("temperature", "mixing_fraction", "gpt"),
            smoothf((ntemp, NETA, NGPT), 1e-26, phase=1.1),
        )
        mk("solar_source_quiet", ("gpt",), np.full(NGPT, 4.0))
        mk("solar_source_facular", ("gpt",), np.full(NGPT, 1.0))
        mk("solar_source_sunspot", ("gpt",), np.full(NGPT, 2.0))
        mk("mg_default", ("one",), np.array([0.1567652]))
        mk("sb_default", ("one",), np.array([902.71260]))
    f.close()


@pytest.fixture(scope="module")
def lw_file(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("nc") / "gas-lw.nc")
    _write_gas_nc(p, longwave=True)
    return p


@pytest.fixture(scope="module")
def sw_file(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("nc") / "gas-sw.nc")
    _write_gas_nc(p, longwave=False)
    return p


def test_dataset_reader(lw_file):
    ds = Dataset(lw_file)
    assert ds.dims["gpt"] == NGPT
    assert ds.dims["bnd"] == NBND
    assert "kmajor" in ds


def test_load_gas_lookup_lw(lw_file):
    lkp = load_gas_lookup(lw_file)
    assert lkp.is_longwave
    assert lkp.n_gpt == NGPT and lkp.n_bnd == NBND
    assert lkp.kmajor.shape == (NGPT, NPRESS + 1, NTEMP, NETA)
    assert lkp.planck_fraction.shape == (NGPT, NPRESS + 1, NTEMP, NETA)
    assert lkp.totplnk.shape == (NPLNK, NBND)
    assert lkp.idx_h2o == 1
    assert lkp.gas_names == tuple(GASES)
    # 0/0 -> 2/2 rule on band 1 upper
    assert lkp.key_species[1][1] == (2, 2)
    assert lkp.key_species[0][0] == (1, 2)
    # band limits converted to 0-based exclusive
    assert lkp.bnd_lims_gpt == ((0, 16), (16, 32))
    # minor metadata: n2o with h2o-complement density scaling
    itv = lkp.minor_lower[0]
    assert itv.gas == 4 and itv.scaling_gas == 1
    assert itv.scales_with_density and itv.scale_by_complement
    assert (itv.gpt0, itv.gpt1, itv.k0) == (0, 16, 0)
    itv2 = lkp.minor_lower[1]
    assert itv2.gas == 2 and not itv2.scales_with_density
    assert (itv2.gpt0, itv2.gpt1, itv2.k0) == (16, 32, 16)
    # uniform grids
    assert lkp.t_ref_delta == pytest.approx(40.0)
    assert lkp.p_ref_tropo == pytest.approx(9948.4)
    # eta_half consistency with vmr_ref
    ds = Dataset(lw_file)
    vmr_ref = np.asarray(ds["vmr_ref"])
    np.testing.assert_allclose(
        np.asarray(lkp.eta_half)[0, 0], vmr_ref[0, 1] / vmr_ref[0, 2], rtol=1e-12
    )


def test_load_gas_lookup_sw(sw_file):
    lkp = load_gas_lookup(sw_file)
    assert not lkp.is_longwave
    assert lkp.rayl.shape == (2, NGPT, NTEMP, NETA)
    # solar source composition (ref lookup_constructors.jl:543-551)
    mg, sb = 0.1567652, 902.71260
    a_off, b_off = 0.1495954, 0.00066696
    per_gpt = 4.0 + (mg - a_off) * 1.0 + (sb - b_off) * 2.0
    assert lkp.solar_src_tot == pytest.approx(per_gpt * NGPT)
    np.testing.assert_allclose(np.asarray(lkp.solar_src_scaled), 1.0 / NGPT, rtol=1e-12)


def test_loaded_lookup_runs_solver(lw_file):
    """A loaded (file-backed) lookup drives a full LW solve."""
    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere
    from rrtmgp_tpu.models.rrtmgp import solve_lw
    from rrtmgp_tpu.states import LwBCs

    lkp = load_gas_lookup(lw_file)
    atm = synthetic_atmosphere(ncol=4, nlay=20, ngas=len(GASES), p_top=12.0)
    bcs = LwBCs(sfc_emis=jnp.full((NBND, 4), 0.98))
    flux, _ = jax.jit(lambda a, b: solve_lw(lkp, a, b))(atm, bcs)
    assert bool(jnp.all(jnp.isfinite(flux.flux_up)))
    assert float(jnp.min(flux.flux_up)) >= 0.0


# ---------------------------------------------------------------------------
# Cloud + aerosol lookup loaders (ref lookup_constructors.jl:602-624, 4-56)
# ---------------------------------------------------------------------------

CLD_NBND, NRGHICE, NSIZE_LIQ, NSIZE_ICE = 6, 3, 10, 12
AER_NBND, NVAL, NBIN, NRH = 6, 3, 4, 7


def _write_cloud_nc(path):
    """rrtmgp-clouds-*-bnd.nc shaped file. C-order dims mirror the real files
    (Julia reads them reversed: extliq -> (nsize_liq, nband), extice ->
    (nsize_ice, nband, nrghice))."""
    from scipy.io import netcdf_file

    rng = np.random.default_rng(11)
    f = netcdf_file(path, "w")
    f.createDimension("nband", CLD_NBND)
    f.createDimension("nrghice", NRGHICE)
    f.createDimension("nsize_liq", NSIZE_LIQ)
    f.createDimension("nsize_ice", NSIZE_ICE)
    f.createDimension("pair", 2)
    f.createDimension("one", 1)

    def mk(name, dims, data):
        v = f.createVariable(name, "d", dims)
        v[:] = data
        return v

    mk("radliq_lwr", ("one",), np.array([2.5]))
    mk("radliq_upr", ("one",), np.array([21.5]))
    mk("diamice_lwr", ("one",), np.array([20.0]))
    mk("diamice_upr", ("one",), np.array([180.0]))
    # smooth-in-size tables with physical magnitudes (real cloud LUTs are
    # smooth functions of effective radius; fully-random values make the f32
    # golden tiers fail on interpolation noise the real data never produces)
    # moderate single-scattering albedo: keeps the 2stream-vs-noscat flux gap
    # inside the reference's 5 W/m^2 LW two-stream gate (the golden reference
    # files are no-scat-rescaled, ref clear_sky_utils.jl:177-179)
    s_liq = np.linspace(1.0, 0.3, NSIZE_LIQ)[None, :]
    s_ice = np.linspace(1.0, 0.4, NSIZE_ICE)[None, :]
    b_liq = (1.0 + 0.1 * np.sin(np.arange(CLD_NBND)))[:, None]
    # extinction magnitudes sized so the (cldfrac=1, reference-style) fake
    # all-sky column keeps the LW 2stream-vs-noscat flux gap comfortably
    # inside the reference's real-data-calibrated 5 W/m^2 gate
    mk("extliq", ("nband", "nsize_liq"), 0.03 * b_liq * s_liq)
    mk("ssaliq", ("nband", "nsize_liq"), 0.06 + 0.08 * b_liq * s_liq / 1.65)
    mk("asyliq", ("nband", "nsize_liq"), 0.6 + 0.2 * b_liq * s_liq / 1.65)
    r_ice = (1.0 + 0.05 * np.arange(NRGHICE))[:, None, None]
    mk("extice", ("nrghice", "nband", "nsize_ice"), 0.018 * r_ice * b_liq[None] * s_ice[None])
    mk("ssaice", ("nrghice", "nband", "nsize_ice"), 0.05 + 0.08 * r_ice * b_liq[None] * s_ice[None] / 1.9)
    mk("asyice", ("nrghice", "nband", "nsize_ice"), 0.55 + 0.25 * r_ice * b_liq[None] * s_ice[None] / 1.9)
    wn = np.stack([np.arange(CLD_NBND) * 500.0 + 10.0, np.arange(CLD_NBND) * 500.0 + 510.0], 1)
    mk("bnd_limits_wavenumber", ("nband", "pair"), wn)
    f.close()
    return wn


def _write_aerosol_nc(path):
    """rrtmgp-aerosols-merra-*.nc shaped file; band 3 spans 550 nm
    (16000-20000 cm^-1)."""
    from scipy.io import netcdf_file

    rng = np.random.default_rng(12)
    f = netcdf_file(path, "w")
    f.createDimension("nband", AER_NBND)
    f.createDimension("nval", NVAL)
    f.createDimension("nbin", NBIN)
    f.createDimension("nrh", NRH)
    f.createDimension("pair", 2)

    def mk(name, dims, data):
        v = f.createVariable(name, "d", dims)
        v[:] = data
        return v

    mk("merra_aero_bin_lims", ("nbin", "pair"), np.stack([np.arange(NBIN) * 1e-6, (np.arange(NBIN) + 1) * 1e-6], 1))
    mk("aero_rh", ("nrh",), np.linspace(0.0, 0.99, NRH))
    mk("aero_dust_tbl", ("nband", "nbin", "nval"), rng.random((AER_NBND, NBIN, NVAL)))
    mk("aero_salt_tbl", ("nband", "nbin", "nrh", "nval"), rng.random((AER_NBND, NBIN, NRH, NVAL)))
    mk("aero_sulf_tbl", ("nband", "nrh", "nval"), rng.random((AER_NBND, NRH, NVAL)))
    mk("aero_bcar_rh_tbl", ("nband", "nrh", "nval"), rng.random((AER_NBND, NRH, NVAL)))
    mk("aero_bcar_tbl", ("nband", "nval"), rng.random((AER_NBND, NVAL)))
    mk("aero_ocar_rh_tbl", ("nband", "nrh", "nval"), rng.random((AER_NBND, NRH, NVAL)))
    mk("aero_ocar_tbl", ("nband", "nval"), rng.random((AER_NBND, NVAL)))
    wn = np.array([[100.0, 3000.0], [3000.0, 8000.0], [8000.0, 16000.0],
                   [16000.0, 20000.0], [20000.0, 30000.0], [30000.0, 50000.0]])
    mk("bnd_limits_wavenumber", ("nband", "pair"), wn)
    f.close()


@pytest.fixture(scope="module")
def cld_file(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("nc") / "clouds-bnd.nc")
    _write_cloud_nc(p)
    return p


@pytest.fixture(scope="module")
def aero_file(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("nc") / "aerosols-merra.nc")
    _write_aerosol_nc(p)
    return p


def test_load_cloud_lookup(cld_file):
    from rrtmgp_tpu.data.loader import load_cloud_lookup

    lkp = load_cloud_lookup(cld_file)
    assert lkp.liq.shape == (3, NSIZE_LIQ, CLD_NBND)
    assert lkp.ice.shape == (3, NSIZE_ICE, CLD_NBND, NRGHICE)
    assert (lkp.nsize_liq, lkp.nsize_ice, lkp.nrghice) == (NSIZE_LIQ, NSIZE_ICE, NRGHICE)
    assert float(lkp.radliq_lwr) == 2.5 and float(lkp.radliq_upr) == 21.5
    # ice radius bounds are file diameters halved (ref lookup_constructors.jl:615-618)
    assert float(lkp.radice_lwr) == 10.0 and float(lkp.radice_upr) == 90.0
    # value round-trip: extliq row of band 0
    ds = Dataset(cld_file)
    np.testing.assert_allclose(
        np.asarray(lkp.liq)[0, :, 0], np.asarray(ds["extliq"])[0, :], rtol=1e-12
    )


def test_load_aerosol_lookup(aero_file):
    from rrtmgp_tpu.data.loader import load_aerosol_lookup

    lkp = load_aerosol_lookup(aero_file)
    assert lkp.dust.shape == (3, NBIN, AER_NBND)
    assert lkp.sea_salt.shape == (3, NRH, NBIN, AER_NBND)
    assert lkp.sulfate.shape == (3, NRH, AER_NBND)
    assert lkp.black_carbon.shape == (3, AER_NBND)
    assert lkp.iband_550nm == 3  # 550nm = 18181.8 cm^-1, inside band 3
    assert (lkp.n_bin, lkp.n_rh) == (NBIN, NRH)
    ds = Dataset(aero_file)
    np.testing.assert_allclose(
        np.asarray(lkp.dust)[:, 0, 0], np.asarray(ds["aero_dust_tbl"])[0, 0, :], rtol=1e-12
    )


def test_loaded_cld_aero_lookups_run_solver(lw_file, cld_file, aero_file):
    """File-backed gas+cloud+aerosol lookups drive a cloudy LW solve (the
    cloud/aerosol files intentionally have nband != gas nband is NOT allowed,
    so this uses matching synthetic band counts via the gas file's bands)."""
    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.data.loader import load_aerosol_lookup, load_cloud_lookup, load_gas_lookup
    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere
    from rrtmgp_tpu.models.rrtmgp import solve_lw
    from rrtmgp_tpu.ops.cloud_optics import build_cloud_mask_mcica
    from rrtmgp_tpu.states import LwBCs

    lkp = load_gas_lookup(lw_file)
    # rebuild band-matched cloud/aerosol files (gas file has NBND=2 bands)
    import dataclasses as dc

    lkp_cld = load_cloud_lookup(cld_file)
    lkp_aero = load_aerosol_lookup(aero_file)
    lkp_cld = dc.replace(lkp_cld, liq=lkp_cld.liq[:, :, :NBND], ice=lkp_cld.ice[:, :, :NBND],
                         bnd_lims_wn=lkp_cld.bnd_lims_wn[:, :NBND])
    lkp_aero = dc.replace(
        lkp_aero,
        dust=lkp_aero.dust[..., :NBND], sea_salt=lkp_aero.sea_salt[..., :NBND],
        sulfate=lkp_aero.sulfate[..., :NBND],
        black_carbon_rh=lkp_aero.black_carbon_rh[..., :NBND],
        black_carbon=lkp_aero.black_carbon[..., :NBND],
        organic_carbon_rh=lkp_aero.organic_carbon_rh[..., :NBND],
        organic_carbon=lkp_aero.organic_carbon[..., :NBND],
        bnd_lims_wn=lkp_aero.bnd_lims_wn[:, :NBND], iband_550nm=-1,
    )
    atm = synthetic_atmosphere(ncol=4, nlay=20, ngas=len(GASES), p_top=12.0,
                               with_clouds=True, with_aerosols=True)
    bcs = LwBCs(sfc_emis=jnp.full((NBND, 4), 0.98))
    mask = build_cloud_mask_mcica(jax.random.key(0), atm.cloud_state.cld_frac, NGPT)
    flux, _ = jax.jit(
        lambda a, b, m: solve_lw(lkp, a, b, two_stream=True, lkp_cld=lkp_cld,
                                 cld_mask=m, lkp_aero=lkp_aero)
    )(atm, bcs, mask)
    assert bool(jnp.all(jnp.isfinite(flux.flux_up)))
    assert float(jnp.min(flux.flux_up)) >= 0.0


# ---------------------------------------------------------------------------
# Axis-order robustness: dimension-NAME-driven loading
# ---------------------------------------------------------------------------


def _assert_lookups_equal(a, b):
    """All array leaves bitwise equal + all static metadata equal."""
    import jax

    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb  # static metadata (key species, minor intervals, grids)
    for xa, xb in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


@pytest.mark.parametrize("longwave", [True, False])
def test_load_order_independent(tmp_path, longwave):
    """A file with every variable written in REVERSED (Fortran-style) axis
    order loads to the same lookup as the C-order file: the loader permutes
    by dimension NAME, never guessing from the header order."""
    pc = str(tmp_path / "c.nc")
    pr = str(tmp_path / "rev.nc")
    _write_gas_nc(pc, longwave=longwave)
    _write_gas_nc(pr, longwave=longwave, reverse=True)
    _assert_lookups_equal(load_gas_lookup(pc), load_gas_lookup(pr))


@pytest.mark.parametrize("reverse", [False, True])
def test_load_colliding_dim_sizes(tmp_path, reverse):
    """nbnd == ntemp (the g224 hazard: temperature == nbnd_sw == 14): size
    matching alone cannot orient totplnk/eta tables; names must resolve it,
    in either on-disk axis order."""
    nb = nt = 8  # NGPT=32 -> per_bnd=4
    pc = str(tmp_path / "c.nc")
    px = str(tmp_path / "x.nc")
    _write_gas_nc(pc, longwave=True, nbnd=nb, ntemp=nt)
    _write_gas_nc(px, longwave=True, reverse=reverse, nbnd=nb, ntemp=nt)
    a = load_gas_lookup(pc)
    b = load_gas_lookup(px)
    _assert_lookups_equal(a, b)
    assert a.n_bnd == nb and a.n_temp == nt
    # totplnk must be (n_t_plnk, nbnd), oriented by name
    assert a.totplnk.shape == (NPLNK, nb)


# ---------------------------------------------------------------------------
# Manifest validation
# ---------------------------------------------------------------------------


def test_manifest_structure_valid(lw_file, sw_file):
    from rrtmgp_tpu.data.manifest import validate_structure

    assert validate_structure(Dataset(lw_file), "gas_lw") == []
    assert validate_structure(Dataset(sw_file), "gas_sw") == []


def test_manifest_detects_missing_and_misnamed(tmp_path):
    from rrtmgp_tpu.data.manifest import validate_structure

    p = str(tmp_path / "bad.nc")
    _write_gas_nc(p, longwave=True)
    ds = Dataset(p)
    # drop a required variable
    del ds._vars["kmajor"]
    probs = validate_structure(ds, "gas_lw")
    assert any("kmajor" in q for q in probs)
    # misname a dimension
    ds2 = Dataset(p)
    ds2.var_dims["totplnk"] = ("bogus_dim", "bnd")
    probs2 = validate_structure(ds2, "gas_lw")
    assert any("totplnk" in q for q in probs2)


def test_manifest_data_dir_report(tmp_path):
    from rrtmgp_tpu.data.manifest import validate_rrtmgp_data

    # empty dir: all files reported missing, no raise
    report = validate_rrtmgp_data(str(tmp_path), strict_v19=False)
    assert all(p == ["file not present"] for p in report.values())
    # a structurally-valid (synthetic-size) gas file passes relaxed mode
    _write_gas_nc(str(tmp_path / "rrtmgp-gas-lw-g256.nc"), longwave=True)
    report = validate_rrtmgp_data(str(tmp_path), strict_v19=False)
    assert report["rrtmgp-gas-lw-g256.nc"] == []
    # strict v1.9 mode rejects the synthetic sizes
    import pytest as _pytest
    from rrtmgp_tpu.data.manifest import ManifestError

    with _pytest.raises(ManifestError):
        validate_rrtmgp_data(str(tmp_path), strict_v19=True)
