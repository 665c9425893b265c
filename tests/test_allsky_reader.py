"""All-sky example reader tests against a synthetic rrtmgp-allsky-shaped file.

Exercises data/allsky.py without network access: column-1 tiling, TOA-first
flip, idealized-cloud placement (100-900 hPa, 2 of 3 dataset columns,
liquid/ice split at 263/273 K), aerosol type scattering into the 15-species
MERRA axis, and reference-flux loading (ref
/root/reference/test/read_all_sky_with_aerosols.jl).
"""

import numpy as np
import pytest

from rrtmgp_tpu.data.allsky import load_allsky_atmosphere, load_reference_fluxes
from rrtmgp_tpu.data.synthetic import synthetic_cloud_lookup, synthetic_gas_lookup

NLAY, NCOL_DS = 20, 6
LKP = synthetic_gas_lookup(longwave=True, n_gpt=16, n_bnd=2)
LKP_CLD = synthetic_cloud_lookup(n_bnd=2)


def _write_allsky_nc(path):
    from scipy.io import netcdf_file

    f = netcdf_file(path, "w")
    f.createDimension("lay", NLAY)
    f.createDimension("lev", NLAY + 1)
    f.createDimension("col", NCOL_DS)

    def mk(name, dims, data):
        v = f.createVariable(name, "d", dims)
        v[:] = data
        return v

    # TOA-first (level 0 = top) to exercise the surface-first flip
    p_lev = np.linspace(30.0, 101300.0, NLAY + 1)[:, None] * np.ones((1, NCOL_DS))
    p_lay = 0.5 * (p_lev[:-1] + p_lev[1:])
    t_lev = np.linspace(210.0, 290.0, NLAY + 1)[:, None] * np.ones((1, NCOL_DS))
    t_lay = 0.5 * (t_lev[:-1] + t_lev[1:])
    mk("p_lev", ("lev", "col"), p_lev)
    mk("p_lay", ("lay", "col"), p_lay)
    mk("t_lev", ("lev", "col"), t_lev)
    mk("t_lay", ("lay", "col"), t_lay)
    mk("h2o", ("lay", "col"), np.full((NLAY, NCOL_DS), 1e-3))
    mk("o3", ("lay", "col"), np.full((NLAY, NCOL_DS), 1e-6))
    # aerosols: dust1 (type 1) in layer 2 col 0, sea_salt2 (type 12) layer 3 col 1
    a_type = np.zeros((NLAY, NCOL_DS))
    a_size = np.zeros((NLAY, NCOL_DS))
    a_mass = np.zeros((NLAY, NCOL_DS))
    a_type[2, 0], a_size[2, 0], a_mass[2, 0] = 1, 1.5e-6, 3e-6
    a_type[3, 1], a_size[3, 1], a_mass[3, 1] = 12, 2.5e-6, 4e-6
    mk("aero_type", ("lay", "col"), a_type)
    mk("aero_size", ("lay", "col"), a_size)
    mk("aero_mass", ("lay", "col"), a_mass)
    # reference fluxes: distinct per level so orientation is observable
    lw_up = np.arange(NLAY + 1, dtype=np.float64)[:, None] * np.ones((1, NCOL_DS))
    mk("lw_flux_up", ("lev", "col"), lw_up)
    mk("lw_flux_dn", ("lev", "col"), 0.5 * lw_up)
    f.close()


@pytest.fixture(scope="module")
def allsky_file(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("nc") / "allsky.nc")
    _write_allsky_nc(p)
    return p


def test_reader_tiles_and_flips(allsky_file):
    ncol = 10
    atm, ncol_ds = load_allsky_atmosphere(
        allsky_file, LKP, LKP_CLD, ncol=ncol, with_aerosols=True
    )
    assert ncol_ds == NCOL_DS
    assert atm.p_lev.shape == (NLAY + 1, ncol)
    # surface-first after the flip: pressure decreasing upward
    p = np.asarray(atm.p_lev)
    assert p[0, 0] > p[-1, 0]
    # column 1 tiled everywhere
    assert np.all(p == p[:, :1])
    assert float(atm.t_sfc[0]) == pytest.approx(290.0)
    # global-mean gases at the example's constants (1-based gas indexing)
    names = list(LKP.gas_names)
    if "co2" in names:
        assert float(atm.vmr.vmr[names.index("co2") + 1]) == pytest.approx(348e-6)


def test_reader_cloud_placement(allsky_file):
    ncol = 12
    atm, _ = load_allsky_atmosphere(
        allsky_file, LKP, LKP_CLD, ncol=ncol, cldfrac=1.0, with_aerosols=False
    )
    assert atm.aerosol_state is None
    cs = atm.cloud_state
    frac = np.asarray(cs.cld_frac)
    p_lay = np.asarray(atm.p_lay)
    t_lay = np.asarray(atm.t_lay)
    # clouds only inside 100-900 hPa and in 2 of 3 dataset columns
    # (the reference's 1-based wrap: dataset cols 3, 6, ... stay clear)
    icol_ds = np.arange(ncol) % NCOL_DS + 1
    expect_col = (icol_ds % 3) != 0
    in_band = (p_lay > 1e4) & (p_lay < 9e4)
    np.testing.assert_array_equal(frac > 0, in_band & expect_col[None, :])
    # liquid where warm, ice where cold, both in the 263-273 K overlap
    lpath = np.asarray(cs.cld_path_liq)
    ipath = np.asarray(cs.cld_path_ice)
    cld = frac > 0
    np.testing.assert_array_equal(lpath > 0, cld & (t_lay > 263.0))
    np.testing.assert_array_equal(ipath > 0, cld & (t_lay < 273.0))
    r_eff_mid = (float(LKP_CLD.radliq_lwr) + float(LKP_CLD.radliq_upr)) / 2
    assert np.all(np.asarray(cs.cld_r_eff_liq)[lpath > 0] == pytest.approx(r_eff_mid))


def test_reader_aerosol_scatter(allsky_file):
    atm, _ = load_allsky_atmosphere(allsky_file, LKP, LKP_CLD, ncol=NCOL_DS)
    mass = np.asarray(atm.aerosol_state.aero_mass)  # (15, nlay, ncol)
    size = np.asarray(atm.aerosol_state.aero_size)
    assert mass.shape[0] == 15
    # file is TOA-first; reader flips layers: file layer i -> NLAY-1-i
    lay = NLAY - 1 - 2
    assert mass[0, lay, 0] == pytest.approx(3e-6)   # type 1 = dust1 -> idx 0
    assert size[0, lay, 0] == pytest.approx(1.5e-6)
    lay = NLAY - 1 - 3
    assert mass[11, lay, 1] == pytest.approx(4e-6)  # type 12 = sea_salt2 -> idx 11
    assert mass.sum() == pytest.approx(7e-6)


def test_reference_flux_loader(allsky_file):
    up, dn = load_reference_fluxes(allsky_file, "lw", ncol=8)
    assert up.shape == (NLAY + 1, 8)
    # file stored TOA-first values 0..NLAY top->bottom; surface-first flips
    assert up[0, 0] == pytest.approx(NLAY)
    assert up[-1, 0] == pytest.approx(0.0)
    np.testing.assert_allclose(dn, 0.5 * up)


def test_reader_drives_cloudy_solve(allsky_file):
    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.models.rrtmgp import solve_lw
    from rrtmgp_tpu.ops.cloud_optics import build_cloud_mask_mcica
    from rrtmgp_tpu.states import LwBCs

    atm, _ = load_allsky_atmosphere(allsky_file, LKP, LKP_CLD, ncol=8)
    mask = build_cloud_mask_mcica(jax.random.key(0), atm.cloud_state.cld_frac, LKP.n_gpt)
    bcs = LwBCs(sfc_emis=jnp.full((LKP.n_bnd, 8), 0.98))
    flux, _ = jax.jit(
        lambda a, b, m: solve_lw(LKP, a, b, two_stream=True, lkp_cld=LKP_CLD, cld_mask=m)
    )(atm, bcs, mask)
    assert bool(jnp.all(jnp.isfinite(flux.flux_up)))
