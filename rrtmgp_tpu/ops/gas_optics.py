"""RRTMGP k-distribution gas optics, TPU-native formulation.

Mirrors the numerics of the reference's per-(layer, g-point) scalar kernel
(/root/reference/src/optics/gas_optics.jl:166-335 and
 /root/reference/src/optics/optics_utils.jl) with a different decomposition:

- Pressure/temperature interpolation indices are computed once per
  (layer, column) — they are g-point independent.
- Eta (binary species parameter) data is computed at BAND granularity
  (nlay, nbnd, ncol) — a short trace-time loop of elementwise ops over the
  static key-species table — then expanded to g-points with a single static
  ``take`` along the band axis. The expensive structures (the 8-point
  trilinear kmajor/planck gathers) appear ONCE in the program, batched over
  all g-points, instead of once per band; this keeps XLA programs small and
  maps the gathers onto wide TPU ops.
- The minor-gas interval loop (dozens of intervals) unrolls at trace time
  over static metadata; each interval is a dense (eta, temp) bilinear interp
  over its contiguous g-point slice, masked by troposphere side — replacing
  the reference's ragged per-g-point loops (gas_optics.jl:277-303).

Outputs are laid out (nlay, ngpt, ncol): vertical axis leading for the RTE
scans, columns trailing on TPU lanes.

Index conventions: level/layer 0 = surface; g-points and bands 0-based;
gas indices 1-based matching the reference's vmr convention.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..data.lookups import GasLookup
from ..states import AtmosphericState, get_vmr


class PTInterp(NamedTuple):
    """Per-(layer, column) pressure/temperature interpolation data."""

    jtemp: jax.Array       # (nlay, ncol) int, 0-based lower temp index
    ftemp: jax.Array       # (nlay, ncol)
    jpress_base: jax.Array # (nlay, ncol) int, base slab on the (npress+1) axis
    fpress: jax.Array      # (nlay, ncol)
    tropo_lower: jax.Array # (nlay, ncol) bool, True = lower atmosphere


class EtaInterp(NamedTuple):
    """Eta interpolation data at band granularity, each (nlay, nbnd, ncol)."""

    jeta1: jax.Array
    feta1: jax.Array
    jeta2: jax.Array
    feta2: jax.Array
    col_mix1: jax.Array
    col_mix2: jax.Array


def compute_pt_interp(lkp: GasLookup, p_lay: jax.Array, t_lay: jax.Array) -> PTInterp:
    """Temperature/pressure interp fractions (ref gas_optics.jl:82-108).

    The temp/ln-p reference grids are uniform; indices come from grid math
    (the reference's loc_lower), clamped like the reference.
    """
    # temperature: jtemp in [0, n_temp-2]
    loc_t = (t_lay - lkp.t_ref_min) / lkp.t_ref_delta
    jtemp = jnp.clip(jnp.floor(loc_t), 0, lkp.n_temp - 2).astype(jnp.int32)
    ftemp = loc_t - jtemp

    # pressure: jp in [0, n_press-2] on the ln p grid (decreasing pressure)
    log_p = jnp.log(p_lay)
    loc_p = (lkp.ln_p_ref_max - log_p) / lkp.ln_p_ref_delta
    jp = jnp.clip(jnp.floor(loc_p), 0, lkp.n_press - 2).astype(jnp.int32)
    fpress = loc_p - jp

    tropo_lower = p_lay > lkp.p_ref_tropo
    # kmajor press axis has n_press+1 slabs; lower uses (jp, jp+1),
    # upper uses (jp+1, jp+2)  (ref gas_optics.jl:101-108 + interp3d indexing)
    jpress_base = jp + jnp.where(tropo_lower, 0, 1)
    return PTInterp(jtemp, ftemp, jpress_base, fpress, tropo_lower)


def _eta_for(lkp: GasLookup, vmr, pt: PTInterp, ibnd: int, tropo: int):
    """Eta interp data for band ``ibnd``, troposphere side ``tropo``
    (ref gas_optics.jl:123-150). Returns 6 arrays (nlay, ncol)."""
    g1, g2 = lkp.key_species[ibnd][tropo]
    vmr1 = get_vmr(vmr, g1)
    vmr2 = get_vmr(vmr, g2)
    ratio_t = lkp.eta_half[ibnd, tropo]  # (ntemp,)
    n_eta = lkp.n_eta
    dtype = lkp.eta_half.dtype

    outs = []
    for itemp in (0, 1):
        eta_half = ratio_t[pt.jtemp + itemp]  # (nlay, ncol) gather from tiny vector
        col_mix = vmr1 + eta_half * vmr2
        col_mix = jnp.broadcast_to(col_mix, pt.jtemp.shape).astype(dtype)
        eta = jnp.where(col_mix > 0.0, vmr1 / jnp.where(col_mix > 0.0, col_mix, 1.0), 0.5)
        loc_eta = eta * (n_eta - 1)
        trunc = jnp.floor(loc_eta)
        jeta = jnp.minimum(trunc, n_eta - 2).astype(jnp.int32)
        feta = loc_eta - trunc
        outs.append((jeta, feta, col_mix))
    (j1, f1, c1), (j2, f2, c2) = outs
    return j1, f1, j2, f2, c1, c2


def compute_eta_interp(lkp: GasLookup, vmr, pt: PTInterp) -> EtaInterp:
    """Tropo-selected eta data stacked over bands: each field (nlay, nbnd, ncol)."""
    per_band = []
    for ibnd in range(lkp.n_bnd):
        lo = _eta_for(lkp, vmr, pt, ibnd, 0)
        if lkp.key_species[ibnd][1] == lkp.key_species[ibnd][0]:
            per_band.append(lo)
        else:
            up = _eta_for(lkp, vmr, pt, ibnd, 1)
            sel = pt.tropo_lower
            per_band.append(tuple(jnp.where(sel, a, b) for a, b in zip(lo, up)))
    stacked = tuple(
        jnp.stack([pb[i] for pb in per_band], axis=1) for i in range(6)
    )
    return EtaInterp(*stacked)


def _gpt2band_array(lkp: GasLookup) -> jax.Array:
    g2b = np.zeros((lkp.n_gpt,), np.int32)
    for ibnd, (g0, g1) in enumerate(lkp.bnd_lims_gpt):
        g2b[g0:g1] = ibnd
    return jnp.asarray(g2b)


def _expand_eta_to_gpt(lkp: GasLookup, eta: EtaInterp) -> EtaInterp:
    """(nlay, nbnd, ncol) -> (nlay, ngpt, ncol) via one static band->gpt take."""
    g2b = _gpt2band_array(lkp)
    return EtaInterp(*(jnp.take(x, g2b, axis=1) for x in eta))


def _interp3d_all(table, pt: PTInterp, eta_g: EtaInterp, s1=None, s2=None):
    """8-point trilinear interpolation batched over all g-points.

    table: (ngpt, npress+1, ntemp, neta); eta_g fields (nlay, ngpt, ncol);
    returns (nlay, ngpt, ncol). Matches interp3d (ref optics_utils.jl:123-149)
    with s1/s2 scaling the two temperature halves (col_mix).
    """
    n_gpt = table.shape[0]
    jp = pt.jpress_base[:, None, :]  # (nlay, 1, ncol)
    jt = pt.jtemp[:, None, :]
    fp = pt.fpress[:, None, :]
    ft = pt.ftemp[:, None, :]
    g = jnp.arange(n_gpt, dtype=jnp.int32)[None, :, None]

    def gather(dp, dt, je):
        return table[g, jp + dp, jt + dt, je]

    je1, fe1 = eta_g.jeta1, eta_g.feta1
    je2, fe2 = eta_g.jeta2, eta_g.feta2
    t1 = (1.0 - fp) * ((1.0 - fe1) * gather(0, 0, je1) + fe1 * gather(0, 0, je1 + 1)) + fp * (
        (1.0 - fe1) * gather(1, 0, je1) + fe1 * gather(1, 0, je1 + 1)
    )
    t2 = (1.0 - fp) * ((1.0 - fe2) * gather(0, 1, je2) + fe2 * gather(0, 1, je2 + 1)) + fp * (
        (1.0 - fe2) * gather(1, 1, je2) + fe2 * gather(1, 1, je2 + 1)
    )
    s1v = 1.0 if s1 is None else s1
    s2v = 1.0 if s2 is None else s2
    return s1v * (1.0 - ft) * t1 + s2v * ft * t2


def _interp2d_rows(krows, pt: PTInterp, eta: EtaInterp, ibnd: int):
    """4-point (eta, temp) bilinear interpolation over kminor rows.

    krows: (nrows, ntemp, neta), one row per g-point of the interval;
    eta at band granularity, band ``ibnd`` selected. Returns
    (nlay, nrows, ncol). Matches interp2d (optics_utils.jl:80-85).
    """
    nrows = krows.shape[0]
    jt = pt.jtemp[:, None, :]
    ft = pt.ftemp[:, None, :]
    je1 = eta.jeta1[:, ibnd, None, :]
    fe1 = eta.feta1[:, ibnd, None, :]
    je2 = eta.jeta2[:, ibnd, None, :]
    fe2 = eta.feta2[:, ibnd, None, :]
    g = jnp.arange(nrows, dtype=jnp.int32)[None, :, None]
    return (
        (1.0 - fe1) * (1.0 - ft) * krows[g, jt, je1]
        + fe1 * (1.0 - ft) * krows[g, jt, je1 + 1]
        + (1.0 - fe2) * ft * krows[g, jt + 1, je2]
        + fe2 * ft * krows[g, jt + 1, je2 + 1]
    )


def compute_tau_major(lkp: GasLookup, col_dry, pt: PTInterp, eta_g: EtaInterp) -> jax.Array:
    """Major-species optical depth (nlay, ngpt, ncol) (ref gas_optics.jl:188)."""
    tau = _interp3d_all(lkp.kmajor, pt, eta_g, s1=eta_g.col_mix1, s2=eta_g.col_mix2)
    return tau * col_dry[:, None, :]


def compute_tau_minor(
    lkp: GasLookup, vmr, col_dry, p_lay, t_lay, pt: PTInterp, eta: EtaInterp
) -> jax.Array:
    """Minor-gas optical depth (nlay, ngpt, ncol) (ref gas_optics.jl:255-306).

    Static unroll over minor intervals, accumulated into static g-point
    slices; the scaling-law branches (density / scaling gas / complement)
    resolve at trace time from static flags.
    """
    nlay, ncol = p_lay.shape
    dtype = col_dry.dtype
    tau = jnp.zeros((nlay, lkp.n_gpt, ncol), dtype)

    vmr_h2o = get_vmr(vmr, lkp.idx_h2o)
    dry_fact = 1.0 / (1.0 + vmr_h2o)             # (nlay, ncol) or scalar
    density_fact = 0.01 * p_lay / t_lay          # pa2hpa * p / t

    gpt2band = [0] * lkp.n_gpt
    for ibnd, (g0, g1) in enumerate(lkp.bnd_lims_gpt):
        for g in range(g0, g1):
            gpt2band[g] = ibnd

    for tropo, intervals, kminor in (
        (0, lkp.minor_lower, lkp.kminor_lower),
        (1, lkp.minor_upper, lkp.kminor_upper),
    ):
        mask = pt.tropo_lower if tropo == 0 else jnp.logical_not(pt.tropo_lower)
        for itv in intervals:
            if itv.gas == 0:
                continue
            vmr_m = get_vmr(vmr, itv.gas)
            scaling = vmr_m * col_dry
            if itv.scales_with_density:
                scaling = scaling * density_fact
                if itv.scaling_gas > 0:
                    sg = get_vmr(vmr, itv.scaling_gas)
                    if itv.scale_by_complement:
                        scaling = scaling * (1.0 - sg * dry_fact)
                    else:
                        scaling = scaling * (sg * dry_fact)
            ng = itv.gpt1 - itv.gpt0
            krows = kminor[itv.k0 : itv.k0 + ng]  # (ng, ntemp, neta)
            contrib = _interp2d_rows(krows, pt, eta, gpt2band[itv.gpt0])
            contrib = contrib * scaling[:, None, :]
            contrib = jnp.where(mask[:, None, :], contrib, 0.0)
            tau = tau.at[:, itv.gpt0 : itv.gpt1, :].add(contrib)
    return tau


def compute_tau_rayleigh(lkp: GasLookup, vmr, col_dry, pt: PTInterp, eta_g: EtaInterp) -> jax.Array:
    """Rayleigh scattering optical depth (nlay, ngpt, ncol)
    (ref gas_optics.jl:324-335)."""
    vmr_h2o = get_vmr(vmr, lkp.idx_h2o)
    factor = (vmr_h2o + 1.0) * col_dry  # (nlay, ncol)
    tropo_idx = jnp.where(pt.tropo_lower, 0, 1)[:, None, :]  # (nlay, 1, ncol)
    jt = pt.jtemp[:, None, :]
    ft = pt.ftemp[:, None, :]
    je1, fe1 = eta_g.jeta1, eta_g.feta1
    je2, fe2 = eta_g.jeta2, eta_g.feta2
    g = jnp.arange(lkp.n_gpt, dtype=jnp.int32)[None, :, None]
    r = lkp.rayl  # (2, ngpt, ntemp, neta)
    val = (
        (1.0 - fe1) * (1.0 - ft) * r[tropo_idx, g, jt, je1]
        + fe1 * (1.0 - ft) * r[tropo_idx, g, jt, je1 + 1]
        + (1.0 - fe2) * ft * r[tropo_idx, g, jt + 1, je2]
        + fe2 * ft * r[tropo_idx, g, jt + 1, je2 + 1]
    )
    return val * factor[:, None, :]


def _planck_interp_band(lkp: GasLookup, t, ibnd: int):
    """interp1d_equispaced of totplnk[:, ibnd] at temperatures ``t`` with
    endpoint clamping (ref optics_utils.jl:32-42)."""
    tp = lkp.totplnk[:, ibnd]  # (n_t_plnk,)
    n = tp.shape[0]
    loc = (t - lkp.t_planck_min) / lkp.t_planck_delta
    j = jnp.clip(jnp.floor(loc), 0, n - 2).astype(jnp.int32)
    f = loc - j
    lin = tp[j] * (1.0 - f) + tp[j + 1] * f
    t_max = lkp.t_planck_min + (n - 1) * lkp.t_planck_delta
    return jnp.where(t < lkp.t_planck_min, tp[0], jnp.where(t > t_max, tp[-1], lin))


def _planck_bands_to_gpt(lkp: GasLookup, t):
    """Planck source interp per band, expanded to g-points.

    t: (..., ncol) temperatures; returns (..., ngpt, ncol) with the band
    value broadcast over that band's g-points.
    """
    per_band = jnp.stack(
        [_planck_interp_band(lkp, t, b) for b in range(lkp.n_bnd)], axis=-2
    )  # (..., nbnd, ncol)
    g2b = _gpt2band_array(lkp)
    return jnp.take(per_band, g2b, axis=-2)


class LWSources(NamedTuple):
    lay_source: jax.Array  # (nlay, ngpt, ncol)
    lev_source: jax.Array  # (nlay+1, ngpt, ncol)
    sfc_source: jax.Array  # (ngpt, ncol)


class LWOptics(NamedTuple):
    tau: jax.Array       # (nlay, ngpt, ncol)
    sources: LWSources


class SWOptics(NamedTuple):
    tau: jax.Array  # (nlay, ngpt, ncol)
    ssa: jax.Array  # (nlay, ngpt, ncol)


def compute_planck_sources(lkp: GasLookup, as_: AtmosphericState, pfrac: jax.Array) -> LWSources:
    """Planck sources from the total-Planck table and per-g-point fractions.

    Mirrors the fused source loop in /root/reference/src/optics/Optics.jl:228-248:
    interior level sources are geometric means of the (level Planck x adjacent
    layers' planck fraction) pair; surface source uses layer 0's fraction.
    """
    nlay = as_.nlay
    planck_lay = _planck_bands_to_gpt(lkp, as_.t_lay)   # (nlay, ngpt, ncol)
    planck_lev = _planck_bands_to_gpt(lkp, as_.t_lev)   # (nlay+1, ngpt, ncol)
    planck_sfc = _planck_bands_to_gpt(lkp, as_.t_sfc)   # (ngpt, ncol)

    lay_source = planck_lay * pfrac
    # level 0: planck_lev[0] * pfrac[layer0]; interior i: planck_lev[i] *
    # sqrt(pfrac[i-1] * pfrac[i]); top: planck_lev[nlay] * pfrac[nlay-1]
    lev0 = planck_lev[0] * pfrac[0]
    interior = planck_lev[1:nlay] * jnp.sqrt(pfrac[:-1] * pfrac[1:])
    top = planck_lev[nlay] * pfrac[-1]
    lev_source = jnp.concatenate([lev0[None], interior, top[None]], axis=0)
    sfc_source = planck_sfc * pfrac[0]
    return LWSources(lay_source=lay_source, lev_source=lev_source, sfc_source=sfc_source)


def gas_optics_lw(lkp: GasLookup, as_: AtmosphericState) -> LWOptics:
    """LW gas optics: tau + Planck sources for all g-points, (nlay, ngpt, ncol).

    Fuses the reference's per-column driver loop
    (/root/reference/src/optics/Optics.jl:202-293) into dense batched ops.
    """
    pt = compute_pt_interp(lkp, as_.p_lay, as_.t_lay)
    eta = compute_eta_interp(lkp, as_.vmr, pt)
    eta_g = _expand_eta_to_gpt(lkp, eta)
    tau_major = compute_tau_major(lkp, as_.col_dry, pt, eta_g)
    tau_minor = compute_tau_minor(lkp, as_.vmr, as_.col_dry, as_.p_lay, as_.t_lay, pt, eta)
    tau = jnp.maximum(tau_major + tau_minor, 0.0)
    pfrac = _interp3d_all(lkp.planck_fraction, pt, eta_g)
    sources = compute_planck_sources(lkp, as_, pfrac)
    return LWOptics(tau=tau, sources=sources)


def gas_optics_sw(lkp: GasLookup, as_: AtmosphericState) -> SWOptics:
    """SW gas optics: tau + Rayleigh single-scattering albedo, (nlay, ngpt, ncol).

    Mirrors /root/reference/src/optics/gas_optics.jl:197-231.
    """
    pt = compute_pt_interp(lkp, as_.p_lay, as_.t_lay)
    eta = compute_eta_interp(lkp, as_.vmr, pt)
    eta_g = _expand_eta_to_gpt(lkp, eta)
    tau_major = compute_tau_major(lkp, as_.col_dry, pt, eta_g)
    tau_minor = compute_tau_minor(lkp, as_.vmr, as_.col_dry, as_.p_lay, as_.t_lay, pt, eta)
    tau_ray = compute_tau_rayleigh(lkp, as_.vmr, as_.col_dry, pt, eta_g)
    tau = jnp.maximum(tau_major + tau_minor + tau_ray, 0.0)
    ssa = jnp.where(tau > 0.0, tau_ray / jnp.where(tau > 0.0, tau, 1.0), 0.0)
    return SWOptics(tau=tau, ssa=ssa)
