"""Pallas TPU kernel: MERRA aerosol band properties.

Computes the cumulative raw aerosol band sums (tau, tau*ssa, tau*ssa*g) —
the pre-ratio stage of ops.aerosol_optics.aerosol_optics_bands (ref
/root/reference/src/optics/aerosol_optics.jl:121-185) — entirely in VMEM,
with BAND-LEADING (mb, nlay*ncol) outputs that flow straight into the
megakernels' (nlay, mb, ncol) operands. The XLA formulation churned ~1 GB of
(rows, 3*nbnd) intermediates per active species per solve (~57 ms at DYAMOND
widths); here only masses/sizes/RH in and three narrow band tensors out
touch HBM.

Numerics: size-bin selection is exact; RH interpolation weights ride an
exact-0/1-plus-hi/lo bf16 table contraction (~1e-7 rel), vs the XLA path's
f32 HIGHEST dots — inside the f32 flux tolerance.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data.lookups import AerosolLookup
from ..states import AerosolState
from .aerosol_optics import (
    BC_IDX,
    BC_RH_IDX,
    DUST_IDXS,
    OC_IDX,
    OC_RH_IDX,
    SALT_IDXS,
    SULFATE_IDX,
)
from .pallas_interp import _split_hi_lo


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _table_t(tbl, mb):
    """(3, ..., nbnd) f32 table -> transposed (3*mb, K) [columns = flattened
    leading index]; bf16 [hi | hi | lo] lane-stack. Pure numpy (ml_dtypes)
    so it stays concrete under an enclosing trace."""
    import ml_dtypes

    t = np.asarray(tbl, np.float32)          # (3, *K, nbnd)
    nbnd = t.shape[-1]
    k = int(np.prod(t.shape[1:-1])) if t.ndim > 2 else 1
    t = t.reshape(3, k, nbnd)
    out = np.zeros((3 * mb, k), np.float32)
    for v in range(3):
        out[v * mb : v * mb + nbnd] = t[v].T
    hi = out.astype(ml_dtypes.bfloat16)
    lo = (out - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return jnp.asarray(np.concatenate([hi, hi, lo], axis=1))


def _aero_kernel(
    mass_ref, size_ref, rh_ref,
    dust_t, salt_t, sulf_t, bcrh_t, ocrh_t, bc_t, oc_t,
    t_ref, ts_ref, tsg_ref,
    *, mb, nbin, nrh, rh_levels, bin_lo, bin_hi, active, has_rh_zero,
):
    b = mass_ref.shape[1]
    rh = rh_ref[:]  # (1, B)

    # RH location/factor (non-uniform grid; ref optics_utils.jl:49-57)
    loc = jnp.zeros((1, b), jnp.float32)
    for j in range(1, nrh):
        loc = loc + jnp.where(rh >= rh_levels[j], 1.0, 0.0)
    loc = jnp.clip(loc - 0.0, 0.0, nrh - 2)  # index of lower level
    lev_lo = jnp.zeros((1, b), jnp.float32)
    lev_hi = jnp.zeros((1, b), jnp.float32)
    for j in range(nrh - 1):
        sel = loc == j
        lev_lo = jnp.where(sel, rh_levels[j], lev_lo)
        lev_hi = jnp.where(sel, rh_levels[j + 1], lev_hi)
    fac = jnp.clip((rh - lev_lo) / (lev_hi - lev_lo), 0.0, 1.0)
    omf = 1.0 - fac

    def dot_t(tbl3_ref, w32):
        """[T_hi | T_hi | T_lo] @ [w_hi; w_lo; w_hi] -> (3mb, B) f32."""
        w_hi, w_lo = _split_hi_lo(w32)
        return jnp.dot(
            tbl3_ref[...], jnp.concatenate([w_hi, w_lo, w_hi], axis=0),
            preferred_element_type=jnp.float32,
        )

    def w_rh_rows():
        iota = jax.lax.broadcasted_iota(jnp.int32, (nrh, b), 0).astype(jnp.float32)
        return jnp.where(iota == loc, omf, 0.0) + jnp.where(iota == loc + 1.0, fac, 0.0)

    def size_bin(sz):
        first = jnp.full((1, b), float(nbin - 1))
        for j in reversed(range(nbin)):
            inside = jnp.logical_and(sz >= bin_lo[j], sz <= bin_hi[j])
            first = jnp.where(inside, float(j), first)
        return first  # (1, B) f32 bin index

    acc_t = jnp.zeros((mb, b), jnp.float32)
    acc_ts = jnp.zeros((mb, b), jnp.float32)
    acc_tsg = jnp.zeros((mb, b), jnp.float32)

    def accum(vals, m):
        nonlocal acc_t, acc_ts, acc_tsg
        ext = vals[:mb]
        ssa = vals[mb : 2 * mb]
        asy = vals[2 * mb :]
        live = m > 0.0  # (1, B) broadcasts over bands
        t = jnp.where(live, m * ext, 0.0)
        ts = t * ssa
        acc_t = acc_t + t
        acc_ts = acc_ts + ts
        acc_tsg = acc_tsg + ts * asy

    w_rh = w_rh_rows() if has_rh_zero else None

    for i in DUST_IDXS:
        if i not in active:
            continue
        bin_ = size_bin(size_ref[i : i + 1])
        iota = jax.lax.broadcasted_iota(jnp.int32, (nbin, b), 0).astype(jnp.float32)
        w = jnp.where(iota == bin_, 1.0, 0.0)
        accum(dot_t(dust_t, w), mass_ref[i : i + 1])

    for i in SALT_IDXS:
        if i not in active:
            continue
        bin_ = size_bin(size_ref[i : i + 1])
        iota = jax.lax.broadcasted_iota(jnp.int32, (nrh * nbin, b), 0)
        jrh = (iota // nbin).astype(jnp.float32)
        jbin = (iota % nbin).astype(jnp.float32)
        hit = jbin == bin_
        w = jnp.where(jnp.logical_and(jrh == loc, hit), omf, 0.0) + jnp.where(
            jnp.logical_and(jrh == loc + 1.0, hit), fac, 0.0
        )
        accum(dot_t(salt_t, w), mass_ref[i : i + 1])

    for tbl, idx in ((sulf_t, SULFATE_IDX), (bcrh_t, BC_RH_IDX), (ocrh_t, OC_RH_IDX)):
        if idx not in active:
            continue
        accum(dot_t(tbl, w_rh), mass_ref[idx : idx + 1])

    for tbl, idx in ((bc_t, BC_IDX), (oc_t, OC_IDX)):
        if idx not in active:
            continue
        ones = jnp.ones((1, b), jnp.float32)
        accum(dot_t(tbl, ones), mass_ref[idx : idx + 1])

    t_ref[:] = acc_t
    ts_ref[:] = acc_ts
    tsg_ref[:] = acc_tsg


@functools.partial(
    jax.jit,
    static_argnames=("rh_levels", "bin_lims", "mb", "active", "block_cols"),
)
def _aero_bands_call(
    mass2, size2, rh2, tables, *, rh_levels, bin_lims, mb, active, block_cols
):
    n_aero, n = mass2.shape
    npad = -(-n // block_cols) * block_cols
    padn = lambda x: jnp.pad(x.astype(jnp.float32), ((0, 0), (0, npad - n)))
    nbin = len(bin_lims[0])
    nrh = len(rh_levels)
    has_rh = any(
        i in active for i in (*SALT_IDXS, SULFATE_IDX, BC_RH_IDX, OC_RH_IDX)
    )
    kernel = functools.partial(
        _aero_kernel, mb=mb, nbin=nbin, nrh=nrh, rh_levels=rh_levels,
        bin_lo=bin_lims[0], bin_hi=bin_lims[1], active=active,
        has_rh_zero=has_rh,
    )
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    col = lambda d0: pl.BlockSpec((d0, block_cols), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(npad // block_cols,),
        in_specs=[col(n_aero), col(n_aero), col(1)] + [full(t) for t in tables],
        out_specs=tuple(col(mb) for _ in range(3)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((mb, npad), jnp.float32) for _ in range(3)
        ),
        interpret=_interpret(),
    )(padn(mass2), padn(size2), padn(rh2), *tables)
    return tuple(o[:, :n] for o in out)


def aerosol_bands_pallas(
    lkp: AerosolLookup, aero: AerosolState, rel_hum: jax.Array,
    active_species: tuple, *, block_cols: int = 512,
):
    """Raw aerosol band sums (t, ts, tsg), each BAND-LEADING (nlay, mb, ncol)
    f32 with mb = nbnd padded to 8 sublanes. Same accumulation as
    aerosol_optics_bands (pre-ratio); active_species is required and STATIC."""
    n_aero, nlay, ncol = aero.aero_mass.shape
    nbnd = lkp.dust.shape[-1]
    mb = -(-nbnd // 8) * 8
    tables = (
        _table_t(lkp.dust, mb),
        # sea_salt (3, nrh, nbin, nbnd): C-order flatten of (nrh, nbin) gives
        # the rh-major joint index (rh*nbin + bin) the kernel's weights use
        _table_t(lkp.sea_salt, mb),
        _table_t(lkp.sulfate, mb),
        _table_t(lkp.black_carbon_rh, mb),
        _table_t(lkp.organic_carbon_rh, mb),
        _table_t(np.asarray(lkp.black_carbon)[:, None, :], mb),
        _table_t(np.asarray(lkp.organic_carbon)[:, None, :], mb),
    )
    rh_levels = tuple(float(x) for x in np.asarray(lkp.rh_levels))
    _bins = np.asarray(lkp.size_bin_limits)
    bin_lims = (
        tuple(float(x) for x in _bins[0]),
        tuple(float(x) for x in _bins[1]),
    )
    n = nlay * ncol
    out = _aero_bands_call(
        aero.aero_mass.reshape(n_aero, n), aero.aero_size.reshape(n_aero, n),
        rel_hum.reshape(1, n), tables, rh_levels=rh_levels, bin_lims=bin_lims,
        mb=mb, active=tuple(active_species), block_cols=block_cols,
    )
    return tuple(
        jnp.swapaxes(o.reshape(mb, nlay, ncol), 0, 1) for o in out
    )
