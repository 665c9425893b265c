"""MERRA aerosol optics.

Mirrors /root/reference/src/optics/aerosol_optics.jl vectorized over
(nlay, ncol) per band: the 7 aerosol species families (dust x 5 size bins,
sea salt x 5 RH-dependent bins, sulfate, black/organic carbon in hydrophobic
and RH-dependent hydrophilic forms) accumulate (tau, tau*ssa, tau*ssa*g),
which then increments the gas optics via increment_2stream, with optional SW
delta scaling and AOD-at-550nm diagnostics.

MERRA type indexing (0-based here; reference 1-based list at
/root/reference/src/api/api_methods.jl:49-65):
  0: dust1, 1: sea_salt1, 2: sulfate, 3: black_carbon_rh, 4: black_carbon,
  5: organic_carbon_rh, 6: organic_carbon, 7-10: dust2-5, 11-14: sea_salt2-5
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.lookups import AerosolLookup
from ..states import AerosolState
from .cloud_optics import delta_scale, increment_2stream

DUST_IDXS = (0, 7, 8, 9, 10)
SALT_IDXS = (1, 11, 12, 13, 14)
SULFATE_IDX = 2
BC_RH_IDX = 3
BC_IDX = 4
OC_RH_IDX = 5
OC_IDX = 6


def _locate_size_bin(size_bin_limits: jax.Array, aerosize: jax.Array) -> jax.Array:
    """MERRA size-bin search (ref aerosol_optics.jl:313-326): first bin whose
    [lo, hi] contains the size; default = last bin."""
    lo = size_bin_limits[0]  # (nbin,)
    hi = size_bin_limits[1]
    nbin = lo.shape[0]
    inside = (aerosize[..., None] >= lo) & (aerosize[..., None] <= hi)  # (..., nbin)
    first = jnp.argmax(inside, axis=-1)
    any_in = jnp.any(inside, axis=-1)
    return jnp.where(any_in, first, nbin - 1).astype(jnp.int32)


def _rh_loc_factor(rh_levels: jax.Array, rh: jax.Array):
    """Non-uniform 1D interp location/factor with endpoint clamping
    (ref optics_utils.jl:49-57)."""
    n = rh_levels.shape[0]
    # searchsorted: index of first level > rh
    idx = jnp.searchsorted(rh_levels, rh, side="right")
    loc = jnp.clip(idx - 1, 0, n - 2).astype(jnp.int32)
    denom = rh_levels[loc + 1] - rh_levels[loc]
    factor = (rh - rh_levels[loc]) / denom
    factor = jnp.clip(factor, 0.0, 1.0)
    return loc, factor


def _accum(table_vals, mass):
    """(ext, ssa, asy) values -> (tau, tau*ssa, tau*ssa*g) x mass."""
    ext, ssa, asy = table_vals
    tau = mass * ext
    tau_ssa = tau * ssa
    tau_ssag = tau_ssa * asy
    return tau, tau_ssa, tau_ssag


def aerosol_optics_band(lkp: AerosolLookup, aero: AerosolState, rel_hum: jax.Array, ibnd: int):
    """Cumulative aerosol (tau, tau*ssa, tau*ssa*g) for one band, (nlay, ncol).

    Ref compute_lookup_aerosol (/root/reference/src/optics/aerosol_optics.jl:121-185).
    """
    mass = aero.aero_mass  # (n_aero, nlay, ncol)
    size = aero.aero_size
    loc, factor = _rh_loc_factor(lkp.rh_levels, rel_hum)  # (nlay, ncol)
    omf = 1.0 - factor

    tau = jnp.zeros_like(rel_hum)
    tau_ssa = jnp.zeros_like(rel_hum)
    tau_ssag = jnp.zeros_like(rel_hum)

    def add(contrib, active):
        nonlocal tau, tau_ssa, tau_ssag
        t, ts, tsg = contrib
        tau = tau + jnp.where(active, t, 0.0)
        tau_ssa = tau_ssa + jnp.where(active, ts, 0.0)
        tau_ssag = tau_ssag + jnp.where(active, tsg, 0.0)

    # dust: size-binned, no RH
    for i in DUST_IDXS:
        m = mass[i]
        bin_ = _locate_size_bin(lkp.size_bin_limits, size[i])
        vals = tuple(lkp.dust[v, bin_, ibnd] for v in range(3))
        add(_accum(vals, m), m > 0.0)

    # sea salt: size-binned + RH interp
    for i in SALT_IDXS:
        m = mass[i]
        bin_ = _locate_size_bin(lkp.size_bin_limits, size[i])
        vals = tuple(
            lkp.sea_salt[v, loc, bin_, ibnd] * omf + lkp.sea_salt[v, loc + 1, bin_, ibnd] * factor
            for v in range(3)
        )
        add(_accum(vals, m), m > 0.0)

    # sulfate: RH interp
    m = mass[SULFATE_IDX]
    vals = tuple(lkp.sulfate[v, loc, ibnd] * omf + lkp.sulfate[v, loc + 1, ibnd] * factor for v in range(3))
    add(_accum(vals, m), m > 0.0)

    # black carbon hydrophilic (RH) and hydrophobic
    m = mass[BC_RH_IDX]
    vals = tuple(
        lkp.black_carbon_rh[v, loc, ibnd] * omf + lkp.black_carbon_rh[v, loc + 1, ibnd] * factor
        for v in range(3)
    )
    add(_accum(vals, m), m > 0.0)
    m = mass[BC_IDX]
    vals = tuple(jnp.broadcast_to(lkp.black_carbon[v, ibnd], m.shape) for v in range(3))
    add(_accum(vals, m), m > 0.0)

    # organic carbon hydrophilic (RH) and hydrophobic
    m = mass[OC_RH_IDX]
    vals = tuple(
        lkp.organic_carbon_rh[v, loc, ibnd] * omf + lkp.organic_carbon_rh[v, loc + 1, ibnd] * factor
        for v in range(3)
    )
    add(_accum(vals, m), m > 0.0)
    m = mass[OC_IDX]
    vals = tuple(jnp.broadcast_to(lkp.organic_carbon[v, ibnd], m.shape) for v in range(3))
    add(_accum(vals, m), m > 0.0)

    return tau, tau_ssa, tau_ssag
