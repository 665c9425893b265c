"""RFMIP clear-sky input reader.

Builds an AtmosphericState + BCs from the RFMIP
``multiple_input4MIPs_radiation_RFMIP...nc`` input file, replicating
/root/reference/test/read_clear_sky.jl: vertical flip to surface-first,
TOA pressure clamped to the lookup's p_ref_min, columns tiled to the
requested ncol, global-mean gases scaled by their ``units`` attribute, and
latitude-dependent gravity skipped (to match the Fortran reference case).
"""

from __future__ import annotations

import numpy as np

from ..parameters import RRTMGPParameters
from ..states import AtmosphericState, VmrGM
from .lookups import GasLookup
from .netcdf import Dataset

# RFMIP variable name per lookup gas name (global means)
_GM_VARS = {
    "co2": "carbon_dioxide_GM",
    "n2o": "nitrous_oxide_GM",
    "co": "carbon_monoxide_GM",
    "ch4": "methane_GM",
    "o2": "oxygen_GM",
    "n2": "nitrogen_GM",
    "ccl4": "carbon_tetrachloride_GM",
    "cfc11": "cfc11_GM",
    "cfc12": "cfc12_GM",
    "cfc22": "hcfc22_GM",
    "hfc143a": "hfc143a_GM",
    "hfc125": "hfc125_GM",
    "hfc23": "hfc23_GM",
    "hfc32": "hfc32_GM",
    "hfc134a": "hfc134a_GM",
    "cf4": "cf4_GM",
}


def _tile_cols(arr: np.ndarray, ncol: int) -> np.ndarray:
    """Tile the trailing column axis up to ncol (ref read_clear_sky.jl tiling)."""
    n = arr.shape[-1]
    reps = -(-ncol // n)
    return np.tile(arr, (1,) * (arr.ndim - 1) + (reps,))[..., :ncol]


def load_rfmip_atmosphere(
    path: str,
    lkp: GasLookup,
    ncol: int | None = None,
    expt_no: int = 0,
    dtype=np.float64,
    params: RRTMGPParameters = RRTMGPParameters(),
):
    """Returns (AtmosphericState, sfc_emis (ncol,), sfc_alb (ncol,),
    cos_zenith (ncol,), toa_flux (ncol,)).

    expt_no is 0-based (reference uses 1-based experiment 1
    = forcing_index 1).
    """
    import jax.numpy as jnp

    from ..states import compute_col_gas, compute_relative_humidity

    ds = Dataset(path)
    nlay = int(ds.dims["layer"])
    nlev = nlay + 1

    def var(name):
        return np.asarray(ds[name], np.float64)

    p_lev_raw = var("pres_level")        # dims (level, site) or (site, level)?
    # normalize to (level, site)
    if p_lev_raw.shape[0] != nlev:
        p_lev_raw = p_lev_raw.T
    ncol_ds = p_lev_raw.shape[1]
    ncol = ncol or ncol_ds

    def lv(name, n, with_expt=False):
        a = var(name)
        if with_expt:
            # (expt, site, layer-or-level) in C order typically
            a = a[expt_no]
        if a.shape[0] != n:
            a = a.T
        assert a.shape[0] == n, (name, a.shape)
        return a

    bot_at_1 = p_lev_raw[0, 0] > p_lev_raw[-1, 0]
    flip = (lambda x: x) if bot_at_1 else (lambda x: x[::-1])

    p_lev = flip(p_lev_raw).copy()
    p_lev[-1, :] = lkp.p_ref_min
    p_lay = flip(lv("pres_layer", nlay))
    t_lev = flip(lv("temp_level", nlev, with_expt=True))
    t_lay = flip(lv("temp_layer", nlay, with_expt=True))
    vmr_h2o = flip(lv("water_vapor", nlay, with_expt=True))
    vmr_o3 = flip(lv("ozone", nlay, with_expt=True))

    t_sfc = var("surface_temperature")[expt_no]
    sfc_emis = var("surface_emissivity")
    sfc_alb = var("surface_albedo")
    zenith = np.deg2rad(var("solar_zenith_angle"))
    irrad = var("total_solar_irradiance")

    tile2 = lambda a: _tile_cols(a, ncol)
    tile1 = lambda a: _tile_cols(a[None], ncol)[0]

    names = list(lkp.gas_names)
    vmr_gm = np.zeros(len(names) + 1)
    for gas, varname in _GM_VARS.items():
        if gas in names and varname in ds:
            scale = 1.0
            # units attribute parsing is h5py-attr dependent; rrtmgp-data RFMIP
            # stores e.g. "1e-06"; fall back to 1.0 when absent
            try:
                import h5py

                with h5py.File(path, "r") as f:
                    u = f[varname].attrs.get("units")
                    if u is not None:
                        scale = float(u.decode() if isinstance(u, bytes) else u)
            except Exception:
                pass
            vmr_gm[names.index(gas) + 1] = float(np.ravel(var(varname))[expt_no]) * scale

    p_lev_j = jnp.asarray(tile2(p_lev), dtype)
    p_lay_j = jnp.asarray(tile2(p_lay), dtype)
    t_lay_j = jnp.asarray(tile2(t_lay), dtype)
    vmr_h2o_j = jnp.asarray(tile2(vmr_h2o), dtype)
    col_dry = compute_col_gas(p_lev_j, params, vmr_h2o=vmr_h2o_j)  # lat skipped
    rel_hum = compute_relative_humidity(p_lay_j, t_lay_j, vmr_h2o_j, params)

    atm = AtmosphericState(
        p_lay=p_lay_j,
        t_lay=t_lay_j,
        p_lev=p_lev_j,
        t_lev=jnp.asarray(tile2(t_lev), dtype),
        t_sfc=jnp.asarray(tile1(t_sfc), dtype),
        col_dry=col_dry,
        vmr=VmrGM(
            vmr_h2o=vmr_h2o_j,
            vmr_o3=jnp.asarray(tile2(vmr_o3), dtype),
            vmr=jnp.asarray(vmr_gm, dtype),
        ),
        rel_hum=rel_hum,
    )
    return (
        atm,
        jnp.asarray(tile1(sfc_emis), dtype),
        jnp.asarray(tile1(sfc_alb), dtype),
        jnp.asarray(np.cos(tile1(zenith)), dtype),
        jnp.asarray(tile1(irrad), dtype),
    )
