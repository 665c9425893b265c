"""Full-physics RRTMGP radiation solvers (clear-sky / cloudy / all-sky).

The TPU-native counterpart of the reference's solver dispatch + outer loops
(/root/reference/src/rte/RTESolver.jl and rte_*_solve! drivers in
/root/reference/src/rte/*.jl). Control flow is restructured:

- The reference loops g-points serially (bounding memory with one temp flux
  buffer) and columns in parallel. Here the BAND loop is a static python loop
  (16 LW / 14 SW iterations) and everything inside is vectorized over
  (layer, band-g-points, column) — so per-step live memory is bounded by one
  band's slice while XLA still sees wide batched ops. G-point flux reduction
  is a running sum over bands.
- Cloud McICA masks are sampled for ALL g-points at once with counter-based
  keys (ops/cloud_optics.build_cloud_mask_mcica), not per-g-point host RNG.

All functions are pure; fluxes are (nlay+1, ncol), level 0 = surface.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..angular import angular_discretization
from ..data.lookups import AerosolLookup, CloudLookup, GasLookup
from ..ops import rte
from ..ops.aerosol_optics import add_aerosol_optics
from ..ops.cloud_optics import add_cloud_optics
from ..ops.gas_optics import (
    _band_etas,
    compute_pt_interp,
    gas_optics_lw_band,
    gas_optics_sw_band,
)
from ..states import AtmosphericState, LwBCs, SwBCs


class FluxLW(NamedTuple):
    flux_up: jax.Array   # (nlev, ncol)
    flux_dn: jax.Array
    flux_net: jax.Array


class FluxSW(NamedTuple):
    flux_up: jax.Array
    flux_dn: jax.Array
    flux_dn_dir: jax.Array
    flux_net: jax.Array


class SolveDiagnostics(NamedTuple):
    cld_cover: jax.Array | None = None  # (ncol,) McICA effective cloud cover
    aod_sw_ext: jax.Array | None = None # (ncol,) aerosol optical depth at 550nm
    aod_sw_sca: jax.Array | None = None


def _apply_metric_scaling(flux, metric_scaling):
    """Deep-atmosphere metric scaling (ref /root/reference/src/optics/Fluxes.jl:227-236)."""
    if metric_scaling is None:
        return flux
    return type(flux)(*(f * metric_scaling for f in flux))


def solve_lw(
    lkp: GasLookup,
    as_: AtmosphericState,
    bcs: LwBCs,
    *,
    two_stream: bool = False,
    n_gauss_angles: int = 1,
    lkp_cld: CloudLookup | None = None,
    lkp_aero: AerosolLookup | None = None,
    cld_mask: jax.Array | None = None,   # (nlay, ngpt, ncol) McICA mask
    metric_scaling: jax.Array | None = None,
) -> tuple[FluxLW, SolveDiagnostics]:
    """Longwave flux solve over all g-points.

    Mirrors rte_lw_noscat_solve!/rte_lw_2stream_solve!
    (/root/reference/src/rte/longwave1scalar.jl:29-102,
     /root/reference/src/rte/longwave2stream.jl:26-101).
    """
    nlev = as_.nlay + 1
    ncol = as_.ncol
    dtype = as_.p_lay.dtype
    Ds, wts = angular_discretization(n_gauss_angles)

    pt = compute_pt_interp(lkp, as_.p_lay, as_.t_lay)
    etas = _band_etas(lkp, as_.vmr, pt)

    flux_up = jnp.zeros((nlev, ncol), dtype)
    flux_dn = jnp.zeros((nlev, ncol), dtype)

    for ibnd in range(lkp.n_bnd):
        g0, g1 = lkp.bnd_lims_gpt[ibnd]
        ng = g1 - g0
        optics = gas_optics_lw_band(lkp, as_, pt, etas[ibnd], ibnd)
        tau = optics.tau
        ssa = jnp.zeros_like(tau) if two_stream else None
        g_asym = jnp.zeros_like(tau) if two_stream else None

        if lkp_cld is not None:
            mask_b = cld_mask[:, g0:g1, :]
            tau, ssa, g_asym = add_cloud_optics(
                tau, ssa, g_asym, lkp_cld, as_.cloud_state, mask_b,
                ((0, ng),), delta_scaling=False,
            )
        if lkp_aero is not None:
            tau, ssa, g_asym, _, _ = add_aerosol_optics(
                tau, ssa, g_asym, lkp_aero, as_.aerosol_state, as_.rel_hum,
                ((0, ng),), delta_scaling=False, collect_aod=False,
            )

        sfc_emis = jnp.broadcast_to(bcs.sfc_emis[ibnd][None, :], (ng, ncol))
        inc = None if bcs.inc_flux is None else bcs.inc_flux[g0:g1]
        if two_stream:
            up, dn = rte.lw_2stream(
                tau, ssa, g_asym, optics.sources.lev_source,
                optics.sources.sfc_source, sfc_emis, inc,
            )
        else:
            up, dn = rte.lw_noscat(
                tau, optics.sources.lay_source, optics.sources.lev_source,
                optics.sources.sfc_source, sfc_emis,
                float(Ds[0]), float(wts[0]), inc,
            )
        flux_up = flux_up + jnp.sum(up, axis=1)
        flux_dn = flux_dn + jnp.sum(dn, axis=1)

    flux = FluxLW(flux_up, flux_dn, flux_up - flux_dn)
    flux = _apply_metric_scaling(flux, metric_scaling)

    diag = SolveDiagnostics()
    if cld_mask is not None:
        from ..ops.cloud_optics import cloud_cover_from_mask

        diag = diag._replace(cld_cover=cloud_cover_from_mask(cld_mask).astype(dtype))
    return flux, diag


def solve_sw(
    lkp: GasLookup,
    as_: AtmosphericState,
    bcs: SwBCs,
    *,
    two_stream: bool = True,
    lkp_cld: CloudLookup | None = None,
    lkp_aero: AerosolLookup | None = None,
    cld_mask: jax.Array | None = None,
    metric_scaling: jax.Array | None = None,
) -> tuple[FluxSW, SolveDiagnostics]:
    """Shortwave flux solve over all g-points.

    Mirrors rte_sw_noscat_solve!/rte_sw_2stream_solve!
    (/root/reference/src/rte/shortwave1scalar.jl:27-77,
     /root/reference/src/rte/shortwave2stream.jl:36-124). Night columns
    (cos_zenith <= 0) produce exactly zero fluxes.
    """
    nlev = as_.nlay + 1
    ncol = as_.ncol
    dtype = as_.p_lay.dtype
    mu0 = bcs.cos_zenith

    pt = compute_pt_interp(lkp, as_.p_lay, as_.t_lay)
    etas = _band_etas(lkp, as_.vmr, pt)

    flux_up = jnp.zeros((nlev, ncol), dtype)
    flux_dn = jnp.zeros((nlev, ncol), dtype)
    flux_dn_dir = jnp.zeros((nlev, ncol), dtype)
    aod_ext = aod_sca = None

    for ibnd in range(lkp.n_bnd):
        g0, g1 = lkp.bnd_lims_gpt[ibnd]
        ng = g1 - g0
        optics = gas_optics_sw_band(lkp, as_, pt, etas[ibnd], ibnd)
        tau = optics.tau
        ssa = optics.ssa
        g_asym = jnp.zeros_like(tau)

        if lkp_cld is not None:
            mask_b = cld_mask[:, g0:g1, :]
            tau, ssa, g_asym = add_cloud_optics(
                tau, ssa, g_asym, lkp_cld, as_.cloud_state, mask_b,
                ((0, ng),), delta_scaling=True,
            )
        if lkp_aero is not None:
            collect = lkp_aero.iband_550nm == ibnd
            tau, ssa, g_asym, ext_b, sca_b = add_aerosol_optics(
                tau, ssa, g_asym, lkp_aero, as_.aerosol_state, as_.rel_hum,
                ((0, ng),), delta_scaling=True,
                collect_aod=collect,
            )
            if collect:
                # band slices use local band index 0 -> map iband back
                aod_ext, aod_sca = ext_b, sca_b

        solar_frac = lkp.solar_src_scaled[g0:g1]                     # (ng,)
        toa_gpt = bcs.toa_flux[None, :] * solar_frac[:, None]        # (ng, ncol)
        mu0_b = jnp.broadcast_to(mu0[None, :], (ng, ncol))

        if two_stream:
            alb_dir = jnp.broadcast_to(bcs.sfc_alb_direct[ibnd][None, :], (ng, ncol))
            alb_dif = jnp.broadcast_to(bcs.sfc_alb_diffuse[ibnd][None, :], (ng, ncol))
            inc_dif = None if bcs.inc_flux_diffuse is None else bcs.inc_flux_diffuse[g0:g1]
            up, dn, dn_dir = rte.sw_2stream(
                tau, ssa, g_asym, mu0_b, toa_gpt, alb_dir, alb_dif, inc_dif
            )
            flux_up = flux_up + jnp.sum(up, axis=1)
            flux_dn = flux_dn + jnp.sum(dn, axis=1)
            flux_dn_dir = flux_dn_dir + jnp.sum(dn_dir, axis=1)
        else:
            # direct-beam only: flux_up/flux_dn stay zero, like the reference's
            # OneScalar SW path (/root/reference/src/rte/shortwave1scalar.jl:92-113)
            dn_dir = rte.sw_noscat(tau, mu0_b, toa_gpt)
            flux_dn_dir = flux_dn_dir + jnp.sum(dn_dir, axis=1)

    day = (mu0 > 0)[None, :]
    flux_up = jnp.where(day, flux_up, 0.0)
    flux_dn = jnp.where(day, flux_dn, 0.0)
    flux_dn_dir = jnp.where(day, flux_dn_dir, 0.0)
    flux = FluxSW(flux_up, flux_dn, flux_dn_dir, flux_up - flux_dn)
    flux = _apply_metric_scaling(flux, metric_scaling)

    diag = SolveDiagnostics(aod_sw_ext=aod_ext, aod_sw_sca=aod_sca)
    if cld_mask is not None:
        from ..ops.cloud_optics import cloud_cover_from_mask

        diag = diag._replace(cld_cover=cloud_cover_from_mask(cld_mask).astype(dtype))
    return flux, diag
