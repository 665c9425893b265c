"""Pallas-accelerated gas optics.

Drop-in computation of the same quantities as ops.gas_optics (same numerics
contract, bf16-hi/lo f32-equivalent arithmetic) with every LUT interpolation
mapped onto the fused one-hot MXU kernel (ops.pallas_interp):

  kmajor   : rows (press_slab, temp), fp=fpress, col_mix weights, WINDOWED
  planck   : same rows, col_mix = 1, WINDOWED
  rayleigh : rows (tropo, temp), fp = 0 (pure temp/eta bilinear)
  kminor   : rows (temp,), fp = 0, one call per minor interval with the
             interval's scaling folded into the cm weights

The windowed variant exploits per-layer pressure coherence; validity is
checked at runtime and falls back to the full-width kernel via lax.cond.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..data.lookups import GasLookup
from ..states import AtmosphericState, get_vmr
from ..utils.pytree import pytree_dataclass
from . import pallas_interp as pk
from .gas_optics import (
    EtaInterp,
    LWOptics,
    LWSources,
    PTInterp,
    SWOptics,
    compute_eta_interp_bl,
    compute_planck_sources,
    compute_pt_interp,
    gpt2band_np,
)


@pytree_dataclass(meta_fields=("minor_groups", "minor_ntp", "fused_n_tables"))
class PallasGasTables:
    """bf16 hi/lo e-major tables for the Pallas kernels.

    Minor-gas intervals are GROUPED by (side, g-point range): each group's
    interval sub-tables — (ntp, neta*gpt_pad(ng)) e-major — stack along rows
    into one (n_i*ntp, ...) buffer contracted by a single MXU call with
    per-interval scalings folded into the one-hot weights.

    fused_hi/lo merge every table sharing (press, temp, eta) rows — kmajor
    and (LW) planck fraction — into one widened row buffer so the fused v2
    kernel contracts them with a single MXU matmul per half.
    """

    kmajor_hi: jax.Array
    kmajor_lo: jax.Array
    planck_hi: jax.Array | None
    planck_lo: jax.Array | None
    rayl_hi: jax.Array | None
    rayl_lo: jax.Array | None
    minor_hi: tuple   # one stacked array per group
    minor_lo: tuple
    minor_stack: tuple            # per group [hi; lo; hi] rows (stacked matmul),
                                  # eta-slab LANE-PACKED (see _minor_emajor_packed)
    minor_proj: tuple             # per group [P; P] 0/1 eta-sum projection
    ray_stack: jax.Array | None   # [hi; lo] rows
    ray_ilv: jax.Array | None     # hi/lo row-INTERLEAVED (row 2r=hi_r,
                                  # 2r+1=lo_r): the megakernel's per-layer ray
                                  # window is then one contiguous row slice
                                  # whose K tracks only the layer's
                                  # (tropo, jtemp) SPREAD (vs the full 2-slab
                                  # K=4*rps of ray_stack)
    fused_hi: jax.Array | None
    fused_lo: jax.Array | None
    fused_ilv: jax.Array | None   # sec-minor interleaved [hi; lo; hi]:
                                  # row 3*q + sec (q = jp*rps + jt) — one
                                  # stacked K-contiguous dot in the
                                  # megakernels whose window depends only on
                                  # the per-layer q SPREAD (16-row-aligned
                                  # base), usually a single MXU K-tile
    totplnk_hi: jax.Array | None
    totplnk_lo: jax.Array | None
    totplnk_t: jax.Array | None   # (nbnd_pad, 3*rows_pad) bf16 [hi | hi | lo]
    totplnk_rows: jax.Array | None  # (3*rows_pad, nbnd_pad) bf16 row-
                                    # interleaved (windowed Planck kernel)
    minor_groups: tuple  # static: (side, gpt0, gpt1, (MinorInterval, ...)) per group
    minor_ntp: int       # padded temperature rows per interval
    fused_n_tables: int  # 2 = kmajor+planck (LW), 1 = kmajor only (SW)


def _minor_emajor(kminor, itv):
    """Interval rows (ng, ntemp, neta) -> (ntemp_pad16, neta*gpt_pad(ng)) e-major."""
    ng = itv.gpt1 - itv.gpt0
    ngp = pk.gpt_pad(ng)
    krows = kminor[itv.k0 : itv.k0 + ng]                  # (ng, nt, neta)
    k3 = jnp.transpose(jnp.asarray(krows, jnp.float32), (1, 2, 0))  # (nt, neta, ng)
    if ngp != ng:
        k3 = jnp.pad(k3, ((0, 0), (0, 0), (0, ngp - ng)))
    k2 = k3.reshape(krows.shape[1], -1)  # (nt, neta*ngp)
    pad = (-k2.shape[0]) % 16
    if pad:
        k2 = jnp.concatenate([k2, jnp.zeros((pad, k2.shape[1]), k2.dtype)], axis=0)
    hi = k2.astype(jnp.bfloat16)
    lo = (k2 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def minor_pack_factor(ng: int, n_eta: int) -> int:
    """Eta slabs packed per 128-lane tile for a width-ng minor group."""
    assert ng <= 128, ng
    return min(max(128 // ng, 1), n_eta)


def _minor_emajor_packed(kminor, itv, n_eta):
    """Interval rows packed s-eta-slabs-per-lane-tile: (ntemp_pad16, wp).

    Minor g-point ranges are band-width (~16), so the plain e-major layout
    wastes 7/8 of every 128-lane tile; packing s = 128//ng eta slabs per tile
    cuts the minor contraction width (and its MXU passes) by ~s/9*9x. Lane
    (t*128 + j*ng + g) holds K[eta = t*s + j, g]."""
    ng = itv.gpt1 - itv.gpt0
    s = minor_pack_factor(ng, n_eta)
    ntile = -(-n_eta // s)
    krows = kminor[itv.k0 : itv.k0 + ng]                  # (ng, nt, neta)
    k3 = jnp.transpose(jnp.asarray(krows, jnp.float32), (1, 2, 0))  # (nt, neta, ng)
    nt = k3.shape[0]
    if ntile * s != n_eta:
        k3 = jnp.pad(k3, ((0, 0), (0, ntile * s - n_eta), (0, 0)))
    k4 = k3.reshape(nt, ntile, s * ng)
    if s * ng != 128:
        k4 = jnp.pad(k4, ((0, 0), (0, 0), (0, 128 - s * ng)))
    k2 = k4.reshape(nt, ntile * 128)
    pad = (-nt) % 16
    if pad:
        k2 = jnp.concatenate([k2, jnp.zeros((pad, k2.shape[1]), k2.dtype)], axis=0)
    hi = k2.astype(jnp.bfloat16)
    lo = (k2 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _minor_proj(ng: int, n_eta: int) -> jax.Array:
    """Static 0/1 projection (2*wp, gpt_pad(ng)) bf16, [P; P] stacked for
    hi/lo-split inputs: sums a packed (2B, wp) minor result over its eta
    slabs back to g-points."""
    s = minor_pack_factor(ng, n_eta)
    ntile = -(-n_eta // s)
    wp = ntile * 128
    p = np.zeros((wp, pk.gpt_pad(ng)), np.float32)
    for t in range(ntile):
        for j in range(s):
            e = t * s + j
            if e >= n_eta:
                break
            for g in range(ng):
                p[t * 128 + j * ng + g, g] = 1.0
    return jnp.asarray(np.concatenate([p, p], axis=0), jnp.bfloat16)


def build_pallas_tables(lkp: GasLookup) -> PallasGasTables:
    """Precompute kernel-layout tables from a GasLookup (do once at init)."""
    kmajor_hi, kmajor_lo = pk.split_table_emajor(lkp.kmajor)
    planck_hi = planck_lo = rayl_hi = rayl_lo = None
    if lkp.planck_fraction is not None:
        planck_hi, planck_lo = pk.split_table_emajor(lkp.planck_fraction)
    if lkp.rayl is not None:
        # (2, ngpt, ntemp, neta) -> rows (2 tropo slabs x rows_per_slab),
        # e-major content, gpt-padded; q_ray = tropo * rps + jtemp
        r = jnp.asarray(lkp.rayl, jnp.float32)
        k4 = jnp.transpose(r, (0, 2, 3, 1))  # (2, nt, neta, ngpt)
        ngp = pk.gpt_pad(lkp.n_gpt)
        rps = pk.rows_per_slab(lkp.n_temp)
        k4 = jnp.pad(
            k4, ((0, 0), (0, rps - lkp.n_temp), (0, 0), (0, ngp - lkp.n_gpt))
        )
        k2 = k4.reshape(2 * rps, -1)
        rayl_hi = k2.astype(jnp.bfloat16)
        rayl_lo = (k2 - rayl_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    # group minor intervals by g-point range (tropo sides MERGED — their
    # scalings carry the tropo mask, so one contraction serves both sides);
    # stack sub-tables along rows
    ntp = -(-lkp.n_temp // 16) * 16
    groups: dict = {}
    for side, intervals, kminor in (
        (0, lkp.minor_lower, lkp.kminor_lower),
        (1, lkp.minor_upper, lkp.kminor_upper),
    ):
        for itv in intervals:
            if itv.gas == 0:
                continue
            key = (itv.gpt0, itv.gpt1)
            hi, lo = _minor_emajor(kminor, itv)
            groups.setdefault(key, ([], [], []))
            groups[key][0].append((side, itv))
            groups[key][1].append(hi)
            groups[key][2].append(lo)
    group_meta, group_hi, group_lo = [], [], []
    group_stack, group_proj = [], []
    for (g0, g1), (entries, his, los) in sorted(groups.items()):
        group_meta.append((g0, g1, tuple(entries)))
        group_hi.append(jnp.concatenate(his, axis=0))
        group_lo.append(jnp.concatenate(los, axis=0))
        packed = [
            _minor_emajor_packed(
                lkp.kminor_lower if side == 0 else lkp.kminor_upper, itv, lkp.n_eta
            )
            for side, itv in entries
        ]
        phi = jnp.concatenate([h for h, _ in packed], axis=0)
        plo = jnp.concatenate([l for _, l in packed], axis=0)
        group_stack.append(pk.stack_table_rows(phi, plo))
        group_proj.append(_minor_proj(g1 - g0, lkp.n_eta))
    if lkp.planck_fraction is not None:
        fused_hi, fused_lo = pk.merge_tables_emajor([lkp.kmajor, lkp.planck_fraction])
        fused_n = 2
    else:
        fused_hi, fused_lo = pk.merge_tables_emajor([lkp.kmajor])
        fused_n = 1
    fused_ilv = jnp.stack([fused_hi, fused_lo, fused_hi], axis=1).reshape(
        3 * fused_hi.shape[0], -1
    )
    totplnk_hi = totplnk_lo = totplnk_t = totplnk_rows = None
    if lkp.planck_fraction is not None:
        tp = jnp.asarray(lkp.totplnk, jnp.float32)  # (n_t_plnk, nbnd)
        rpad = -(-tp.shape[0] // 8) * 8
        cpad = -(-tp.shape[1] // 128) * 128
        tp = jnp.pad(tp, ((0, rpad - tp.shape[0]), (0, cpad - tp.shape[1])))
        totplnk_hi = tp.astype(jnp.bfloat16)
        totplnk_lo = (tp - totplnk_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        tpt = tp.T  # (nbnd_pad, rows_pad) for the band-leading Planck kernel
        tpt_hi = tpt.astype(jnp.bfloat16)
        tpt_lo = (tpt - tpt_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        # [hi | hi | lo] lane-stack pairs with the kernel's [w_hi; w_lo; w_hi]
        totplnk_t = jnp.concatenate([tpt_hi, tpt_hi, tpt_lo], axis=1)
        # row-interleaved variant for the WINDOWED Planck kernel: row
        # 3r+sec over temp nodes r, sections [hi, hi, lo] pairing with
        # one-hot weights [w_hi, w_lo, w_hi]; a per-block window is then a
        # contiguous 3*wr row slice (see planck_band_windowed)
        totplnk_rows = jnp.stack([totplnk_hi, totplnk_hi, totplnk_lo], axis=1)
        totplnk_rows = totplnk_rows.reshape(3 * totplnk_hi.shape[0], -1)
    return PallasGasTables(
        kmajor_hi=kmajor_hi,
        kmajor_lo=kmajor_lo,
        planck_hi=planck_hi,
        planck_lo=planck_lo,
        rayl_hi=rayl_hi,
        rayl_lo=rayl_lo,
        minor_hi=tuple(group_hi),
        minor_lo=tuple(group_lo),
        minor_stack=tuple(group_stack),
        minor_proj=tuple(group_proj),
        ray_stack=(
            None if rayl_hi is None else jnp.concatenate([rayl_hi, rayl_lo], axis=0)
        ),
        ray_ilv=(
            None
            if rayl_hi is None
            else jnp.stack([rayl_hi, rayl_lo], axis=1).reshape(
                2 * rayl_hi.shape[0], -1
            )
        ),
        fused_hi=fused_hi,
        fused_lo=fused_lo,
        fused_ilv=fused_ilv,
        totplnk_hi=totplnk_hi,
        totplnk_lo=totplnk_lo,
        totplnk_t=totplnk_t,
        totplnk_rows=totplnk_rows,
        minor_groups=tuple(group_meta),
        minor_ntp=ntp,
        fused_n_tables=fused_n,
    )


def _pad_cols(x, ncol_pad):
    """Pad the column axis (axis 1 of (nlay, ncol, ...)) with edge values."""
    pad = ncol_pad - x.shape[1]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[1] = (0, pad)
    return jnp.pad(x, widths, mode="edge")


def _pad_last(x, ncol_pad):
    """Pad the trailing column axis with edge values (band-leading arrays)."""
    pad = ncol_pad - x.shape[-1]
    if pad == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths, mode="edge")


def _flat(x, rows):
    return x.reshape(rows, *x.shape[2:])


def _interp_table(
    tables_hi, tables_lo, lkp, pt2d, eta2d, q2d, fp2d, cm_pair, *, windowed, block
):
    """Run the fused kernel for one (press,temp,eta) table over all rows."""
    nlay, ncol_pad = q2d.shape
    rows = nlay * ncol_pad
    kw = dict(
        n_temp=pk.rows_per_slab(lkp.n_temp),  # slab stride in the row layout
        n_eta=lkp.n_eta,
        n_gpt=lkp.n_gpt,
        bnd_lims_gpt=lkp.bnd_lims_gpt,
    )
    f32 = lambda x: x.astype(jnp.float32)
    # eta data arrives band-LEADING (nbnd, nlay, ncol); this cold fallback
    # kernel wants (rows, nbnd) — pay one transpose per operand here.
    bt = lambda x: jnp.moveaxis(x, 0, -1).reshape(rows, -1)
    args = (
        _flat(q2d, rows).astype(jnp.int32),
        f32(_flat(fp2d, rows)),
        f32(_flat(pt2d.ftemp, rows)),
        bt(eta2d.jeta1),
        f32(bt(eta2d.feta1)),
        bt(eta2d.jeta2),
        f32(bt(eta2d.feta2)),
        f32(bt(cm_pair[0])),
        f32(bt(cm_pair[1])),
    )
    if windowed:
        q_base, ok = pk.window_bases(
            q2d, pk.rows_per_slab(lkp.n_temp), tables_hi.shape[0], 96
        )
        out = jax.lax.cond(
            ok,
            lambda: pk.interp_pt_eta_windowed(
                tables_hi, tables_lo, q_base, *args, block_cols=block, **kw
            ),
            # block capped at 128: the full-table kernel keeps both bf16 table
            # halves (~8 MB) resident, so a 256-row block's W/r intermediates
            # blow the 16 MB scoped-VMEM limit (seen at ncol=512, SW table).
            lambda: pk.interp_pt_eta(
                tables_hi, tables_lo, *args, block_rows=min(block, 128), **kw
            ),
        )
    else:
        out = pk.interp_pt_eta(
            tables_hi, tables_lo, *args, block_rows=min(block, 128), **kw
        )
    return out.reshape(nlay, ncol_pad, lkp.n_gpt)


def _prep(lkp: GasLookup, as_: AtmosphericState, block: int, band_pad: bool = False,
          eta_node_mode: str = "continuous"):
    """Shared per-solve preprocessing: pt/eta data, padded to block multiple.

    Eta data is band-LEADING — each EtaInterp field (nbnd, nlay, ncol_pad) —
    so the pack rows are plain reshapes (no strided transposes) and the eta
    arithmetic runs on full 128-lane vectors. band_pad (mega callers) pads
    the eta band axis to 8-aligned rows inside the producing fusion, so the
    megakernels' pad_band is a no-op (saves 4 x ~126 MB HBM pad copies per
    SW solve; the kernels' expand-matrix pad rows are zero, masking the
    dummy-band values — band_pad eta must NEVER feed per-band-index paths
    like _tau_minor_merged or band reductions). eta_node_mode: see
    gas_optics.ETA_NODE_MODES (the kernels consume jeta/feta as data, so the
    node semantics are decided entirely here)."""
    pt = compute_pt_interp(lkp, as_.p_lay, as_.t_lay)
    nbnd_out = -(-lkp.n_bnd // 8) * 8 if band_pad else None
    eta = compute_eta_interp_bl(
        lkp, as_.vmr, pt, nbnd_out=nbnd_out, node_mode=eta_node_mode
    )
    ncol = as_.ncol
    ncol_pad = -(-ncol // block) * block
    padp = lambda x: _pad_cols(x, ncol_pad)
    pt2d = PTInterp(*(padp(x) for x in pt))
    eta2d = EtaInterp(*(_pad_last(x, ncol_pad) for x in eta))
    f32 = lambda x: x.astype(jnp.float32)
    q_major = pt2d.jpress_base * pk.rows_per_slab(lkp.n_temp) + pt2d.jtemp
    return pt, eta, pt2d, eta2d, q_major, f32, ncol, ncol_pad


def _tau_minor_merged(lkp, tables, as_, pt2d, eta2d, ncol_pad, block):
    """Minor-gas tau via ONE kernel call over all groups (pack layout built
    statically from minor_groups; scalings computed in XLA, folded into the
    pack)."""
    nlay = as_.nlay
    rows = nlay * ncol_pad
    dtype = jnp.float32
    vmr = as_.vmr
    col_dry = _pad_cols(as_.col_dry, ncol_pad).astype(dtype)
    p_lay = _pad_cols(as_.p_lay, ncol_pad).astype(dtype)
    t_lay = _pad_cols(as_.t_lay, ncol_pad).astype(dtype)

    vmr_h2o_raw = get_vmr(vmr, lkp.idx_h2o)
    vmr_h2o = (
        _pad_cols(vmr_h2o_raw, ncol_pad) if vmr_h2o_raw.ndim == 2 else vmr_h2o_raw
    ).astype(dtype)
    dry_fact = 1.0 / (1.0 + vmr_h2o)
    density_fact = 0.01 * p_lay / t_lay

    def interval_scaling(itv, mask):
        vmr_m = get_vmr(vmr, itv.gas)
        if vmr_m.ndim == 2:
            vmr_m = _pad_cols(vmr_m, ncol_pad)
        scaling = vmr_m.astype(dtype) * col_dry
        if itv.scales_with_density:
            scaling = scaling * density_fact
            if itv.scaling_gas > 0:
                sg = get_vmr(vmr, itv.scaling_gas)
                if sg.ndim == 2:
                    sg = _pad_cols(sg, ncol_pad)
                sg = sg.astype(dtype)
                if itv.scale_by_complement:
                    scaling = scaling * (1.0 - sg * dry_fact)
                else:
                    scaling = scaling * (sg * dry_fact)
        return jnp.where(mask, scaling, 0.0)

    g2b = gpt2band_np(lkp)
    # transposed build + one dense transpose (see _build_pack)
    cols = [
        _flat(pt2d.jtemp, rows).astype(dtype).reshape(1, rows),
        _flat(pt2d.ftemp, rows).astype(dtype).reshape(1, rows),
    ]
    groups_static, scal_offs, eta_offs = [], [], []
    off = 2
    for g0, g1, entries in tables.minor_groups:
        ibnd = int(g2b[g0])
        eta_offs.append(off)
        cols += [
            eta2d.jeta1[ibnd].astype(dtype).reshape(1, rows),
            eta2d.feta1[ibnd].astype(dtype).reshape(1, rows),
            eta2d.jeta2[ibnd].astype(dtype).reshape(1, rows),
            eta2d.feta2[ibnd].astype(dtype).reshape(1, rows),
        ]
        off += 4
        scal_offs.append(off)
        for side, itv in entries:
            mask = pt2d.tropo_lower if side == 0 else jnp.logical_not(pt2d.tropo_lower)
            cols.append(interval_scaling(itv, mask).reshape(1, rows))
            off += 1
        groups_static.append((g0, g1, len(entries)))
    pack_t = jnp.concatenate(cols, axis=0)
    wpad = -(-pack_t.shape[0] // 128) * 128
    if wpad != pack_t.shape[0]:
        pack_t = jnp.pad(pack_t, ((0, wpad - pack_t.shape[0]), (0, 0)))
    pack = pack_t.T

    out = pk.interp_minor_merged(
        tables.minor_hi, tables.minor_lo, pack,
        ntp=tables.minor_ntp, n_eta=lkp.n_eta, n_gpt=lkp.n_gpt,
        groups=tuple(groups_static), scal_offs=tuple(scal_offs),
        eta_offs=tuple(eta_offs), block_rows=block,
    )
    return out.reshape(nlay, ncol_pad, lkp.n_gpt)


def _build_pack(lkp, tables, as_, pt2d, eta2d, q_major, ncol_pad, with_ray):
    """Assemble the single packed (rows, 128k) input array for optics_fused
    plus the static minor-group metadata (see pallas_interp pack layout)."""
    nlay = as_.nlay
    rows = nlay * ncol_pad
    dtype = jnp.float32
    vmr = as_.vmr
    col_dry = _pad_cols(as_.col_dry, ncol_pad).astype(dtype)
    p_lay = _pad_cols(as_.p_lay, ncol_pad).astype(dtype)
    t_lay = _pad_cols(as_.t_lay, ncol_pad).astype(dtype)

    vmr_h2o_raw = get_vmr(vmr, lkp.idx_h2o)
    vmr_h2o = (
        _pad_cols(vmr_h2o_raw, ncol_pad) if vmr_h2o_raw.ndim == 2 else vmr_h2o_raw
    ).astype(dtype)
    dry_fact = 1.0 / (1.0 + vmr_h2o)
    density_fact = 0.01 * p_lay / t_lay

    def interval_scaling(itv, mask):
        vmr_m = get_vmr(vmr, itv.gas)
        if vmr_m.ndim == 2:
            vmr_m = _pad_cols(vmr_m, ncol_pad)
        scaling = vmr_m.astype(dtype) * col_dry
        if itv.scales_with_density:
            scaling = scaling * density_fact
            if itv.scaling_gas > 0:
                sg = get_vmr(vmr, itv.scaling_gas)
                if sg.ndim == 2:
                    sg = _pad_cols(sg, ncol_pad)
                sg = sg.astype(dtype)
                if itv.scale_by_complement:
                    scaling = scaling * (1.0 - sg * dry_fact)
                else:
                    scaling = scaling * (sg * dry_fact)
        return jnp.where(mask, scaling, 0.0)

    # The scalar pack stays TRANSPOSED — (npk, rows), rows on lanes — so the
    # XLA assembly is a cheap sublane concat of ~13 contiguous (1, rows)
    # pieces (the old (rows, 128) layout needed a sublane-amplified 252 MB
    # concat plus per-piece layout copies, ~12 ms/solve at 8k cols). The
    # kernel transposes its (npk, B) tile in VMEM. Eta data rides as four
    # separate band-leading (nbnd, rows) operands, zero-copy from eta interp.
    c1 = lambda x: x.astype(dtype).reshape(1, rows)
    cb = lambda x: x.astype(dtype).reshape(-1, rows)
    if with_ray:
        q_ray = jnp.where(pt2d.tropo_lower, 0, pk.rows_per_slab(lkp.n_temp)) + pt2d.jtemp
        ray_cm = (vmr_h2o + 1.0) * col_dry
    else:
        q_ray = jnp.zeros_like(pt2d.jtemp)
        ray_cm = jnp.zeros_like(col_dry)
    cols = [
        c1(q_major), c1(pt2d.jtemp), c1(pt2d.fpress), c1(pt2d.ftemp),
        c1(col_dry), c1(q_ray), c1(ray_cm),
    ]
    eta_ops = (
        cb(eta2d.jeta1.astype(dtype) + eta2d.feta1.astype(dtype)),
        cb(eta2d.col_mix1),
        cb(eta2d.jeta2.astype(dtype) + eta2d.feta2.astype(dtype)),
        cb(eta2d.col_mix2),
    )
    off = 7
    g2b = gpt2band_np(lkp)
    groups_static, scal_offs = [], []
    for g0, g1, entries in tables.minor_groups:
        scal_offs.append(off)
        for side, itv in entries:
            mask = pt2d.tropo_lower if side == 0 else jnp.logical_not(pt2d.tropo_lower)
            cols.append(interval_scaling(itv, mask).reshape(1, rows))
            off += 1
        groups_static.append((g0, g1, len(entries), int(g2b[g0])))
    # 8-row alignment by appending zero rows INTO the concat (a post-hoc
    # jnp.pad re-copies the whole ~126 MB pack at DYAMOND widths; zero
    # broadcast pieces are written directly by the same concat)
    npk = len(cols)
    wpad = -(-npk // 8) * 8
    if wpad != npk:
        cols.append(jnp.zeros((wpad - npk, rows), dtype))
    pack_t = jnp.concatenate(cols, axis=0)
    return pack_t, eta_ops, tuple(groups_static), tuple(scal_offs)


def compute_min_window(
    lkp: GasLookup, as_: AtmosphericState, mega: bool = False
) -> int:
    """Smallest safe kernel window for this atmosphere (EAGER — the window is
    a static kernel shape). Returns the smallest MXU-tile bucket covering
    every layer's (press, temp) row span: the stacked-K major contraction
    uses K = 3*window bf16, so 42 -> one 128-row K tile, 85 -> two, 128 ->
    three. The span depends only on the p/t fields' per-layer spread across
    columns; for time-stepped hosts compute it once from a worst-case state
    (or rely on windowed="auto"'s runtime fallback). Buckets are 8-row
    aligned (Mosaic DMA slice-shape requirement): 40 -> K=120 (one tile),
    80 -> K=240 (two), 128 -> K=384 (three)."""
    rps = pk.rows_per_slab(lkp.n_temp)
    pt = compute_pt_interp(lkp, as_.p_lay, as_.t_lay)
    q = pt.jpress_base * rps + pt.jtemp
    q_min = jnp.min(q, axis=1)
    q_max = jnp.max(q, axis=1)
    n_rows = (lkp.n_press + 1) * rps
    if mega:
        # sec-minor interleaved space (row 3q+sec): base = 16-aligned floor
        # of 3*q_min, so only the per-layer q SPREAD enters — one MXU K-tile
        # (window <= 128) except for extreme per-layer p/t spreads
        base = ((3 * q_min) // 16) * 16
        req = int(jnp.max(3 * (q_max + rps + 1) + 3 - base))
        n3 = 3 * n_rows
        for bucket in (48, 64, 80, 96, 112, 128):
            if req <= bucket <= n3:
                return bucket
        return min(-(-req // 16) * 16, n3)
    base = (q_min // 16) * 16  # = slab base: slabs are 16-aligned by layout
    req = int(jnp.max(q_max + rps + 2 - base))
    for bucket in (32, 40, 48, 80, 128):
        if req <= bucket <= n_rows:
            return bucket
    return min(-(-req // 16) * 16, n_rows)


def compute_planck_window(lkp: GasLookup, as_: AtmosphericState) -> int:
    """Smallest safe per-block totplnk window (temp-node rows, static kernel
    shape; see compute_min_window for the contract). Blocks are 512-long
    flattened (lay, col) runs of t_lay / t_lev / t_sfc — their node span is
    the across-column temperature spread at one layer."""
    n_t = int(lkp.totplnk.shape[0])
    rows_pad = -(-n_t // 8) * 8
    t_min = float(lkp.t_planck_min)
    t_delta = float(lkp.t_planck_delta)
    req = 0
    for t in (as_.t_lay, as_.t_lev, as_.t_sfc):
        flat = jnp.ravel(t).astype(jnp.float32)
        n = flat.shape[0]
        npad = -(-n // 2048) * 2048
        blocks = jnp.pad(flat, (0, npad - n), mode="edge").reshape(-1, 2048)
        j = jnp.clip(jnp.floor((blocks - t_min) / t_delta), 0, n_t - 2).astype(
            jnp.int32
        )
        base = jnp.clip((jnp.min(j, axis=1) // 8) * 8, 0, None)
        req = max(req, int(jnp.max(jnp.max(j, axis=1) + 2 - base)))
    for bucket in (16, 24, 32, 48, 64, 96, 128):
        if req <= bucket <= rows_pad:
            return bucket
    return rows_pad


def compute_ray_window(lkp: GasLookup, as_: AtmosphericState) -> int:
    """Smallest safe Rayleigh-table window (interleaved-row space, static
    kernel shape; see compute_min_window for the contract). The span depends
    only on the per-layer (tropo, jtemp) spread across columns — typically
    one 8-row tile except for layers straddling the tropopause with a wide
    temperature spread. Full-table fallback = 4*rows_per_slab."""
    rps = pk.rows_per_slab(lkp.n_temp)
    pt = compute_pt_interp(lkp, as_.p_lay, as_.t_lay)
    q_ray = jnp.where(pt.tropo_lower, 0, rps) + pt.jtemp
    n_rows = 2 * rps
    q_min = jnp.min(q_ray, axis=1)
    q_max = jnp.max(q_ray, axis=1)
    base = jnp.clip(((2 * q_min) // 8) * 8, 0, None)
    req = int(jnp.max(2 * (q_max + 1) + 2 - base))
    full = 2 * n_rows
    for bucket in (16, 24, 32, 48):
        if req <= bucket <= full:
            return bucket
    return full


def _optics_fused_call(
    lkp, tables, as_, pt2d, eta2d, q_major, ncol_pad, block, with_ray,
    windowed="auto", window_size=96, out_padded=False, eta_chunk=1,
):
    """optics_fused when the window invariant holds; composed v1 path else.

    windowed: "auto" = runtime lax.cond on the per-layer window invariant
    (costs operand copies ~5 ms at DYAMOND widths); "force" = assume it holds
    (callers may verify once, eagerly, on the first step — the invariant
    depends only on the pressure grid); "off" = always the full-width path.
    window_size: static table-row window per layer; see compute_min_window.
    """
    nlay = as_.nlay
    rows = nlay * ncol_pad
    f32 = lambda x: x.astype(jnp.float32)
    pack, eta_ops, groups_static, scal_offs = _build_pack(
        lkp, tables, as_, pt2d, eta2d, q_major, ncol_pad, with_ray
    )
    window = min(window_size, tables.fused_hi.shape[0])
    q_base, ok = pk.window_bases(
        q_major, pk.rows_per_slab(lkp.n_temp), tables.fused_hi.shape[0], window
    )
    n_tables = tables.fused_n_tables

    def fused():
        return pk.optics_fused(
            tables.fused_hi, tables.fused_lo, tables.minor_stack,
            tables.minor_proj, tables.ray_stack, q_base, pack, eta_ops,
            n_temp=pk.rows_per_slab(lkp.n_temp), n_eta=lkp.n_eta, n_gpt=lkp.n_gpt,
            bnd_lims_gpt=lkp.bnd_lims_gpt, n_tables=n_tables, window=window,
            minor_groups=groups_static, scal_offs=scal_offs,
            minor_ntp=tables.minor_ntp, with_rayleigh=with_ray,
            block_rows=block, out_padded=out_padded, eta_chunk=eta_chunk,
        )

    def fallback():
        cm = (f32(eta2d.col_mix1), f32(eta2d.col_mix2))
        tau_major = _interp_table(
            tables.kmajor_hi, tables.kmajor_lo, lkp, pt2d, eta2d, q_major,
            f32(pt2d.fpress), cm, windowed=False, block=block,
        )
        tau_minor = _tau_minor_merged(lkp, tables, as_, pt2d, eta2d, ncol_pad, block)
        col_dry = _pad_cols(as_.col_dry, ncol_pad).astype(jnp.float32)
        tau = tau_major * col_dry[..., None] + tau_minor
        if with_ray:
            vmr_h2o_raw = get_vmr(as_.vmr, lkp.idx_h2o)
            vmr_h2o = (
                _pad_cols(vmr_h2o_raw, ncol_pad) if vmr_h2o_raw.ndim == 2 else vmr_h2o_raw
            ).astype(jnp.float32)
            # band-leading like the rest of the eta data
            ray_cm = jnp.broadcast_to(
                ((vmr_h2o + 1.0) * col_dry)[None],
                (lkp.n_bnd, *col_dry.shape),
            )
            q_ray = jnp.where(pt2d.tropo_lower, 0, pk.rows_per_slab(lkp.n_temp)) + pt2d.jtemp
            tau_ray = _interp_table(
                tables.rayl_hi, tables.rayl_lo, lkp, pt2d, eta2d, q_ray,
                jnp.zeros_like(f32(pt2d.fpress)), (ray_cm, ray_cm),
                windowed=False, block=block,
            )
            tau = jnp.maximum(tau + tau_ray, 0.0)
            ray_c = jnp.maximum(tau_ray, 0.0)
            second = jnp.where(tau > 0.0, ray_c / jnp.where(tau > 0.0, tau, 1.0), 0.0)
        else:
            tau = jnp.maximum(tau, 0.0)
            ones = jnp.ones_like(cm[0])
            second = _interp_table(
                tables.planck_hi, tables.planck_lo, lkp, pt2d, eta2d, q_major,
                f32(pt2d.fpress), (ones, ones), windowed=False, block=block,
            )
        tau2 = tau.reshape(rows, lkp.n_gpt)
        sec2 = second.reshape(rows, lkp.n_gpt)
        if out_padded:
            gpad = pk.gpt_pad(lkp.n_gpt) - lkp.n_gpt
            tau2 = jnp.pad(tau2, ((0, 0), (0, gpad)))
            sec2 = jnp.pad(sec2, ((0, 0), (0, gpad)))
        return (tau2, sec2)

    if windowed == "force":
        tau, second = fused()
    elif windowed == "off":
        tau, second = fallback()
    else:
        tau, second = jax.lax.cond(ok, fused, fallback)
    ng = pk.gpt_pad(lkp.n_gpt) if out_padded else lkp.n_gpt
    shape3 = (nlay, ncol_pad, ng)
    return tau.reshape(shape3), second.reshape(shape3)


def _planck_sources_pallas(lkp, tables, as_, pfrac, need_lay=True):
    """compute_planck_sources with the band interpolation in a Pallas kernel
    (the XLA one-hot matmul materializes a (rows, n_t_plnk) weight tensor —
    ~400 MB of HBM traffic at DYAMOND widths; in-kernel it never leaves
    VMEM). Source combination mirrors ref Optics.jl:228-248."""
    nlay, ncol = as_.p_lay.shape
    dtype = as_.p_lay.dtype
    g2b = jnp.asarray(gpt2band_np(lkp))
    kw = dict(
        n_t=int(lkp.totplnk.shape[0]),
        t_min=float(lkp.t_planck_min),
        t_delta=float(lkp.t_planck_delta),
    )

    # one kernel call per temperature field: slicing a merged call's output
    # costs two ~250 MB copies (XLA slices materialize), more than the saved
    # dispatches
    bp = lambda t: pk.planck_band_pallas(
        t.reshape(-1), tables.totplnk_hi, tables.totplnk_lo, **kw
    )
    take = lambda b: jnp.take(b, g2b, axis=-1).astype(dtype)
    planck_lev = take(bp(as_.t_lev)).reshape(nlay + 1, ncol, lkp.n_gpt)
    planck_sfc = take(bp(as_.t_sfc))

    # the two-stream solver's Toon sources use only LEVEL values
    # (ref longwave2stream.jl:133-161); skip the (nlay, ncol, ngpt)
    # lay_source tensor + its Planck kernel call when not needed
    lay_source = None
    if need_lay:
        planck_lay = take(bp(as_.t_lay)).reshape(nlay, ncol, lkp.n_gpt)
        lay_source = planck_lay * pfrac
    lev0 = planck_lev[0] * pfrac[0]
    interior = planck_lev[1:nlay] * jnp.sqrt(pfrac[:-1] * pfrac[1:])
    top = planck_lev[nlay] * pfrac[-1]
    lev_source = jnp.concatenate([lev0[None], interior, top[None]], axis=0)
    sfc_source = planck_sfc * pfrac[0]
    return LWSources(lay_source=lay_source, lev_source=lev_source, sfc_source=sfc_source)


def mega_lw_inputs(
    lkp: GasLookup, tables: PallasGasTables, as_: AtmosphericState, window: int,
    need_lay: bool = True,
    planck_window: int | None = None,
    eta_node_mode: str = "continuous",
):
    """Inputs for ops.pallas_mega.lw_clear_mega: pack/eta operands in
    layer-leading layout, band-leading Planck values, static minor metadata.

    Requires ncol to be a multiple of the mega block (caller checks). The
    window invariant is the caller's responsibility (windowed="force"
    semantics; see compute_min_window). planck_window (static temp-node rows;
    see compute_planck_window) dispatches the windowed band-Planck kernel;
    the returned plk_ok bool is False when any block's span overflows it
    (callers poison like the optics guards)."""
    from .pallas_mega import planck_band_pallas_t

    block = 128
    pt, eta, pt2d, eta2d, q_major, f32, ncol, ncol_pad = _prep(
        lkp, as_, block, band_pad=True, eta_node_mode=eta_node_mode
    )
    assert ncol == ncol_pad, (ncol, ncol_pad)
    nlay = as_.nlay
    pack_t, eta_ops, groups_static, scal_offs = _build_pack(
        lkp, tables, as_, pt2d, eta2d, q_major, ncol_pad, with_ray=False
    )
    npk = pack_t.shape[0]
    pack3 = jnp.swapaxes(pack_t.reshape(npk, nlay, ncol), 0, 1)
    eta3 = tuple(
        jnp.swapaxes(x.reshape(x.shape[0], nlay, ncol), 0, 1) for x in eta_ops
    )
    q_base, _ = pk.mega_window_bases(
        q_major, pk.rows_per_slab(lkp.n_temp), tables.fused_hi.shape[0], window
    )

    nbp = -(-lkp.n_bnd // 8) * 8
    kw = dict(
        n_t=int(lkp.totplnk.shape[0]),
        t_min=float(lkp.t_planck_min),
        t_delta=float(lkp.t_planck_delta),
        nbp_sub=nbp,
    )
    plk_ok = jnp.asarray(True)
    if planck_window is not None:
        from .pallas_mega import planck_band_windowed

        def bp(t):
            nonlocal plk_ok
            r, ok = planck_band_windowed(
                t.reshape(-1), tables.totplnk_rows, wr=planck_window, **kw
            )
            plk_ok = jnp.logical_and(plk_ok, ok)
            return r

    else:
        bp = lambda t: planck_band_pallas_t(t.reshape(-1), tables.totplnk_t, **kw)
    plk_lay = (
        jnp.swapaxes(bp(as_.t_lay).reshape(nbp, nlay, ncol), 0, 1)
        if need_lay
        else None
    )
    plk_lev = jnp.swapaxes(bp(as_.t_lev).reshape(nbp, nlay + 1, ncol), 0, 1)
    plk_sfc = bp(as_.t_sfc)
    return (
        q_base, pack3, eta3, plk_lay, plk_lev, plk_sfc,
        groups_static, scal_offs, plk_ok,
    )


def mega_sw_inputs(
    lkp: GasLookup, tables: PallasGasTables, as_: AtmosphericState, window: int,
    ray_window: int | None = None,
    eta_node_mode: str = "continuous",
):
    """Inputs for ops.pallas_mega.sw_clear_mega (see mega_lw_inputs).

    Input prep is block-size independent: ncol must be a multiple of 128
    (the minimum mega block), which any larger block divides. ray_window
    (interleaved Rayleigh rows; see compute_ray_window) defaults to the full
    table; when given, also returns the per-layer ray window bases."""
    pt, eta, pt2d, eta2d, q_major, f32, ncol, ncol_pad = _prep(
        lkp, as_, 128, band_pad=True, eta_node_mode=eta_node_mode
    )
    assert ncol == ncol_pad, (ncol, ncol_pad)
    nlay = as_.nlay
    pack_t, eta_ops, groups_static, scal_offs = _build_pack(
        lkp, tables, as_, pt2d, eta2d, q_major, ncol_pad, with_ray=True
    )
    npk = pack_t.shape[0]
    pack3 = jnp.swapaxes(pack_t.reshape(npk, nlay, ncol), 0, 1)
    eta3 = tuple(
        jnp.swapaxes(x.reshape(x.shape[0], nlay, ncol), 0, 1) for x in eta_ops
    )
    q_base, _ = pk.mega_window_bases(
        q_major, pk.rows_per_slab(lkp.n_temp), tables.fused_hi.shape[0], window
    )
    rps = pk.rows_per_slab(lkp.n_temp)
    if ray_window is None:
        ray_window = 4 * rps
    q_ray2d = jnp.where(pt2d.tropo_lower, 0, rps) + pt2d.jtemp
    ray_base, _ = pk.ray_window_bases(
        q_ray2d.reshape(nlay, ncol), 2 * rps, ray_window
    )
    return q_base, pack3, eta3, groups_static, scal_offs, ray_base


class RawLWOptics(NamedTuple):
    """LW optics with Planck sources left in banded form for the fused sweep
    (pallas_rte.lw_noscat_banded_reduced): pfrac per g-point plus per-BAND
    Planck emission values — the (nlay, ncol, ngpt) source tensors are never
    materialized (ref Optics.jl:228-248 builds them per column in registers;
    this is the TPU analogue)."""

    tau: jax.Array       # (nlay, ncol, ngpt) f32
    pfrac: jax.Array     # (nlay, ncol, ngpt) f32
    plk_lay: jax.Array   # (nlay, ncol, nbp) f32, band Planck at t_lay
    plk_lev: jax.Array   # (nlev, ncol, nbp) f32, band Planck at t_lev
    plk_sfc: jax.Array   # (ncol, nbp) f32, band Planck at t_sfc


def gas_optics_lw_raw(
    lkp: GasLookup, tables: PallasGasTables, as_: AtmosphericState, *,
    block: int = 256, windowed: str = "auto", window_size: int = 96,
    keep_padded: bool = False, eta_chunk: int = 1,
    eta_node_mode: str = "continuous",
) -> RawLWOptics:
    """LW gas optics for the source-fused sweep: tau + pfrac + band Plancks.

    keep_padded (requires ncol % block == 0): tau/pfrac keep the g-point pad
    lanes (exact zeros) so the sweep kernel consumes them directly — skips a
    0.5 GB slice + re-pad round trip per tensor."""
    pt, eta, pt2d, eta2d, q_major, f32, ncol, ncol_pad = _prep(
        lkp, as_, block, eta_node_mode=eta_node_mode
    )
    if keep_padded:
        assert ncol == ncol_pad, (ncol, ncol_pad)
    tau, pfrac = _optics_fused_call(
        lkp, tables, as_, pt2d, eta2d, q_major, ncol_pad, block, with_ray=False,
        windowed=windowed, window_size=window_size, out_padded=keep_padded,
        eta_chunk=eta_chunk,
    )
    nlay = as_.nlay
    kw = dict(
        n_t=int(lkp.totplnk.shape[0]),
        t_min=float(lkp.t_planck_min),
        t_delta=float(lkp.t_planck_delta),
    )
    # one kernel call per temperature field (see _planck_sources_pallas)
    bp = lambda t: pk.planck_band_pallas(
        t.reshape(-1), tables.totplnk_hi, tables.totplnk_lo, **kw
    )
    return RawLWOptics(
        tau=tau if keep_padded else tau[:, :ncol, :],
        pfrac=pfrac if keep_padded else pfrac[:, :ncol, :],
        plk_lay=bp(as_.t_lay).reshape(nlay, ncol, -1),
        plk_lev=bp(as_.t_lev).reshape(nlay + 1, ncol, -1),
        plk_sfc=bp(as_.t_sfc),
    )


def gas_optics_lw(
    lkp: GasLookup, tables: PallasGasTables, as_: AtmosphericState, *,
    block: int = 256, windowed: str = "auto", window_size: int = 96,
    need_lay_source: bool = True, eta_node_mode: str = "continuous",
) -> LWOptics:
    """LW gas optics via Pallas kernels; same contract as gas_optics.gas_optics_lw."""
    pt, eta, pt2d, eta2d, q_major, f32, ncol, ncol_pad = _prep(
        lkp, as_, block, eta_node_mode=eta_node_mode
    )

    tau, pfrac = _optics_fused_call(
        lkp, tables, as_, pt2d, eta2d, q_major, ncol_pad, block, with_ray=False,
        windowed=windowed, window_size=window_size,
    )
    tau = tau[:, :ncol, :]
    pfrac = pfrac[:, :ncol, :]
    sources = _planck_sources_pallas(
        lkp, tables, as_, pfrac.astype(as_.p_lay.dtype), need_lay=need_lay_source
    )
    return LWOptics(tau=tau.astype(as_.p_lay.dtype), sources=sources)


def gas_optics_sw(
    lkp: GasLookup, tables: PallasGasTables, as_: AtmosphericState, *,
    block: int = 256, windowed: str = "auto", window_size: int = 96,
    keep_padded: bool = False, eta_chunk: int = 1,
    eta_node_mode: str = "continuous",
) -> SWOptics:
    """SW gas optics via Pallas kernels; same contract as gas_optics.gas_optics_sw.

    keep_padded: see gas_optics_lw_raw (pad-lane tau/ssa are exact zeros)."""
    pt, eta, pt2d, eta2d, q_major, f32, ncol, ncol_pad = _prep(
        lkp, as_, block, eta_node_mode=eta_node_mode
    )
    if keep_padded:
        assert ncol == ncol_pad, (ncol, ncol_pad)
    tau, ssa = _optics_fused_call(
        lkp, tables, as_, pt2d, eta2d, q_major, ncol_pad, block, with_ray=True,
        windowed=windowed, window_size=window_size, out_padded=keep_padded,
        eta_chunk=eta_chunk,
    )
    dtype = as_.p_lay.dtype
    if keep_padded:
        return SWOptics(tau=tau.astype(dtype), ssa=ssa.astype(dtype))
    return SWOptics(tau=tau[:, :ncol, :].astype(dtype), ssa=ssa[:, :ncol, :].astype(dtype))
