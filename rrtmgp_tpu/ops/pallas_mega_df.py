"""Split-precision (double-f32) LW no-scat megakernel: the fast f64 tier.

TPUs have no f64 ALU. The exact-precision XLA f64 path materializes the
(nlay, ncol, ngpt[, neta]) spectral intermediates in HBM and runs XLA's
software f64 everywhere — measured 37x slower than the f32 megakernel
(PARITY.md). Measured on-chip (benchmarks/f64_split.py): XLA's f64
emulation is actually GOOD for fused elementwise chains (~4x f32) and a
pure-XLA double-f32 path LOSES to it (fusion limits materialize the deep
compensated chains); only transcendentals favor df32 (2.2x). The winning
structure is therefore IN-KERNEL double-f32: the megakernel organization
(whole solve fused, no HBM spectral intermediates) with every value-path
quantity carried as an (hi, lo) f32 pair (ops/df32), which Mosaic keeps in
registers at true VPU cost.

Numerical design (target: clear-sky flux L-inf <= 1e-4 W/m^2 vs the XLA
f64 path — the reference's headline f64 tolerance,
/root/reference/test/runtests.jl:21-23):

- Tables: the f64 kmajor/planck-fraction tables are split into FOUR bf16
  slices per row (s1+s2 reconstruct the top 16 mantissa bits EXACTLY under
  f32 dot accumulation; s3+s4 the next 16 at scale 2^-16) interleaved as
  row' = 4q + s. A pure ONE-HOT (0/1, bf16-exact) extraction dot per
  (temp half x press node x hi/lo part) — M = 8B rows in one MXU dot —
  recovers each trilinear node's table value as an f32 pair with relative
  error ~2^-32, with NO MXU rounding in the value path (every product is
  exact; every output group sums exactly in f32). Interpolation weights
  never enter the MXU: press/eta/temp combining runs on the VPU in df32.
- Prologue (pressure/temperature/eta fractions, col_mix, col_dry, band
  Planck values, surface emissivity) computed in f64 XLA and shipped to
  the kernel as exact hi/lo pairs. XLA WHILE-EMULATES f64 dot_general,
  divide, log and exp on TPU (profiled at ~250 ms of an early prologue at
  8k cols), so table reads use EXACT one-hot f32-split extraction and the
  transcendentals use f32-seeded Newton/df refinements (mul/add only) —
  each measured, each within 2^-44 of exact.
- Minor gases: interpolated by _tau_minor_f64_mxu (exact node extraction,
  f64 weights) and streamed into the kernel as ONE (nlay, ncol, ngpt)
  hi/lo pair — the one spectral-sized input this tier materializes (~2
  tensors vs the f64 path's ~34). Ragged minor intervals stay out of the
  kernel.
- Transport: Clough/Taylor source math, exp (ops.df32.df_exp), and both
  radiance recurrences in df32; g-point flux reductions by lane-halving
  df summation (plain f32 lane sums of 256 positive terms cost ~2^-21
  relative — right at the tolerance).
- In-kernel band->gpt expansion of f64-exact band quantities uses 4+2
  bf16-slice one-hot dots (error ~2^-32), not the f32 kernels' 2-slice
  [hi|lo] split (~2^-16).

Scope: CLEAR-SKY LW no-scattering, single angle (the reference's f64
headline gate). Cloudy/aerosol f64 stays on the exact XLA path.
Ref parity anchors: gas_optics.jl:82-188 (interp), longwave1scalar.jl:
100-212 (transport), Optics.jl:228-248 (sources).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .df32 import (
    df_add,
    df_add_f,
    df_exp,
    df_mul,
    df_mul_f,
    df_sqrt,
    df_sub,
    fast_two_sum,
    two_sum,
)
from .gas_optics import compute_pt_interp
from .pallas_interp import gpt_pad, rows_per_slab


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# bf16 slice splitting
# ---------------------------------------------------------------------------


def _bf16_slices(x_f32, n: int):
    """n-way bf16 slice split of an f32 array: x ~= sum(slices), residual
    ~2^-8n relative. Consecutive PAIRS of slices sum exactly in f32."""
    out = []
    r = jnp.asarray(x_f32, jnp.float32)
    for _ in range(n):
        s = r.astype(jnp.bfloat16)
        out.append(s)
        r = r - s.astype(jnp.float32)
    return out


def split4_f64(x64):
    """f64 -> 4 bf16 slices covering ~32 mantissa bits (groups [s1,s2] and
    [s3,s4] each sum exactly in f32)."""
    x64 = jnp.asarray(x64, jnp.float64)
    s = []
    r = x64
    for _ in range(4):
        si = r.astype(jnp.float32).astype(jnp.bfloat16)
        s.append(si)
        r = r - si.astype(jnp.float32).astype(jnp.float64)
    return s


class Df64Tables(NamedTuple):
    """Kernel tables for the df64 LW tier (build once at init, f64 input)."""

    fused4: jax.Array       # (4*rows, n_eta*2*npad) bf16, row' = 4q + slice
    n_rows: int             # q rows (press_slabs * rows_per_slab)
    km_scale_pow: int       # kmajor scaled by 2^pow in the table (exact);
                            # col_dry carries 2^-pow — keeps every df
                            # intermediate at O(1)-O(100) magnitude. Without
                            # it the pre-col_dry tau (~1e-24) pushes df lo
                            # words/compensation terms into the f32
                            # SUBNORMAL range, where jit (and TPU hardware,
                            # always) flush to zero — measured 2^-23.5
                            # relative tau error, the whole flux budget


def build_df64_tables(lkp) -> Df64Tables:
    """4-slice interleaved [kmajor | planck_fraction] table from the f64
    lookup. Mirrors gas_optics_pallas.build_pallas_tables' fused layout
    (row q = jpress*rps + jtemp; columns (eta, table, gpt)) at double
    precision."""
    assert lkp.planck_fraction is not None, "LW lookup required"

    def emajor64(table):
        ngpt, npp, nt, neta = table.shape
        npad = gpt_pad(ngpt)
        rps = rows_per_slab(nt)
        arr = jnp.asarray(table, jnp.float64)
        k4 = jnp.transpose(arr, (1, 2, 3, 0))
        k4 = jnp.pad(k4, ((0, 0), (0, rps - nt), (0, 0), (0, npad - ngpt)))
        return k4.reshape(npp * rps, neta, npad)

    km = emajor64(lkp.kmajor)       # (rows, neta, npad)
    pf = emajor64(lkp.planck_fraction)
    # normalize kmajor to ~O(1) with an EXACT power-of-two scale (absorption
    # coefficients are ~1e-30..1e-20; see km_scale_pow in Df64Tables)
    km_max = float(jnp.max(jnp.abs(km)))
    scale_pow = int(np.floor(-np.log2(km_max))) if km_max > 0 else 0
    km = km * np.float64(2.0) ** scale_pow
    fused = jnp.concatenate([km, pf], axis=2)  # (rows, neta, 2*npad)
    rows = fused.shape[0]
    fused2 = fused.reshape(rows, -1)
    s1, s2, s3, s4 = split4_f64(fused2)
    fused4 = jnp.stack([s1, s2, s3, s4], axis=1).reshape(4 * rows, -1)
    return Df64Tables(fused4=fused4, n_rows=rows, km_scale_pow=scale_pow)


def mega4_window_bases(q: jax.Array, rps: int, n_rows: int, window: int):
    """Per-layer window base + validity in the 4-slice row space (row=4q+s);
    see pallas_interp.mega_window_bases."""
    q_min = jnp.min(q, axis=1)
    q_max = jnp.max(q, axis=1)
    base = ((4 * q_min) // 16) * 16
    max_base = (max(4 * n_rows - window, 0) // 16) * 16
    base = jnp.clip(base, 0, max_base).astype(jnp.int32)
    ok = jnp.all(4 * (q_max + rps + 1) + 4 - base <= window)
    return base, ok


def compute_df64_window(lkp, as_) -> int:
    """Static kernel window (4-slice rows) for this atmosphere, 16-aligned
    with the same +margin policy as the f32 force mode."""
    pt = compute_pt_interp(lkp, as_.p_lay, as_.t_lay)
    rps = rows_per_slab(lkp.n_temp)
    q = pt.jpress_base * rps + pt.jtemp
    q_min = jnp.min(q, axis=1)
    q_max = jnp.max(q, axis=1)
    need = jnp.max(4 * (q_max + rps + 1) + 4 - ((4 * q_min) // 16) * 16)
    return int(-(-int(need) // 16) * 16) + 16


# ---------------------------------------------------------------------------
# kernel-side df helpers
# ---------------------------------------------------------------------------


def _df_lane_sum(pair, n_real: int):
    """Compensated sum over the lane (last) axis of a (B, G) df pair ->
    (B, 1): halve with df_add until one lane. Pad lanes must be zero."""
    hi, lo = pair
    g = hi.shape[-1]
    while g > 1:
        h = g // 2
        hi, lo = df_add((hi[:, :h], lo[:, :h]), (hi[:, h:], lo[:, h:]))
        g = h
    return hi, lo


def _mask_lanes(pair, b_cols, npad, n_gpt):
    """Zero the g-point pad lanes of a (B, npad) df pair before reduction."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (b_cols, npad), 1)
    live = lane < n_gpt
    return jnp.where(live, pair[0], 0.0), jnp.where(live, pair[1], 0.0)


def _df_max0(x):
    m = x[0] > 0.0
    return jnp.where(m, x[0], 0.0), jnp.where(m, x[1], 0.0)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _lw_df_kernel(
    qb_ref,
    pack_ref,      # (nlay, 12, B) f32: q, jt, fp_hi, fp_lo, ft_hi, ft_lo,
                   #                    cd_hi, cd_lo (+4 zero pad rows)
    eta1_ref,      # (nlay, 4*mb, B): loc1_hi, loc1_lo, cm1_hi, cm1_lo blocks
    eta2_ref,      # (nlay, 4*mb, B): loc2/cm2
    plkl_ref,      # (nlay, 2*mb, B): band Planck at t_lay (hi | lo)
    plke_ref,      # (nlev, 2*mb, B)
    plks_ref,      # (2*mb, B)
    emis_ref,      # (2*mb, B)
    tmin_hi_hbm,   # ANY (nlay, ncol, G) f32  minor-gas tau hi
    tmin_lo_hbm,   # ANY (nlay, ncol, G) f32
    tab_hbm,       # ANY (4*rows, NE) bf16
    m6_ref,        # (6*mb, 2*G) bf16 exact band-expand matrix (4+2 slices)
    up_hi_ref, up_lo_ref, dn_hi_ref, dn_lo_ref,   # (B, nlev) outputs
    *maybe_dbg,      # [dbg_tau hi/lo outputs when debug_tau] + scratch refs
    nlay, window, n_eta, npad, slab, ds, w_mu, n_gpt, debug_tau,
):
    if debug_tau:
        dbg_hi_ref, dbg_lo_ref = maybe_dbg[0], maybe_dbg[1]
        rest = maybe_dbg[2:]
    else:
        rest = maybe_dbg
    (tab_vmem, mh_buf, ml_buf, trans_hi_s, trans_lo_s, sup_hi_s, sup_lo_s,
     uacc_hi, uacc_lo, dacc_hi, dacc_lo, sem) = rest
    blk = pl.program_id(0)
    b_cols = pack_ref.shape[2]
    G = npad
    NE = 2 * npad  # columns per eta node (kmajor | pfrac)

    _i = np.int32  # solve_lw_df64 traces under jax_enable_x64: every index
    # must stay i32 (Mosaic rejects i64 memref/semaphore indices)

    @pl.when(blk == 0)
    def _load_table():
        cp = pltpu.make_async_copy(tab_hbm, tab_vmem, sem.at[_i(0)])
        cp.start()
        cp.wait()

    def start_minor(l, slot):
        c0 = pl.multiple_of(blk * _i(b_cols), 128)
        pltpu.make_async_copy(
            tmin_hi_hbm.at[l, pl.ds(c0, b_cols)], mh_buf.at[slot], sem.at[_i(1)]
        ).start()
        pltpu.make_async_copy(
            tmin_lo_hbm.at[l, pl.ds(c0, b_cols)], ml_buf.at[slot], sem.at[_i(2)]
        ).start()

    def wait_minor(slot):
        pltpu.make_async_copy(
            tmin_hi_hbm.at[_i(0), pl.ds(_i(0), b_cols)], mh_buf.at[slot],
            sem.at[_i(1)],
        ).wait()
        pltpu.make_async_copy(
            tmin_lo_hbm.at[_i(0), pl.ds(_i(0), b_cols)], ml_buf.at[slot],
            sem.at[_i(2)],
        ).wait()

    start_minor(_i(nlay - 1), _i((nlay - 1) % 2))

    m6 = m6_ref[:]
    mb = m6.shape[0] // 6
    eps64 = float(np.finfo(np.float64).eps)
    tau_thresh = 100.0 * eps64   # the f64 path's threshold (rte.py _eps)

    iota_q = jax.lax.broadcasted_iota(jnp.int32, (b_cols, window), 1)

    def expand_df(pair):
        """Exact-ish band->gpt broadcast of a df pair: (B', 2mb) rows-style
        input given as (hi (B', mb), lo (B', mb)); returns df (B', G)."""
        hi, lo = pair
        h = _bf16_slices(hi, 4)
        l2 = _bf16_slices(lo, 2)
        cat = jnp.concatenate([h[0], h[1], h[2], h[3], l2[0], l2[1]], axis=1)
        out = jnp.dot(cat, m6, preferred_element_type=jnp.float32)
        return fast_two_sum(out[:, :G], out[:, G:])

    def clough_df(trans, fact, lay_val, lev_val):
        # (1-trans)*lev + 2*fact*(lay-lev)
        one_m_t = df_add_f((-trans[0], -trans[1]), np.float32(1.0))
        a = df_mul(one_m_t, lev_val)
        b = df_mul(df_mul_f(fact, np.float32(2.0)), df_sub(lay_val, lev_val))
        return df_add(a, b)

    zero = jnp.zeros((b_cols, G), jnp.float32)

    def optics_step(i, carry):
        l = _i(nlay - 1) - i
        (pf_h, pf_l, th_a, tl_a, fh_a, fl_a, lh_a, ll_a, ih_a, il_a) = carry
        pf_above = (pf_h, pf_l)
        trans_above = (th_a, tl_a)
        fact_above = (fh_a, fl_a)
        lay_above = (lh_a, ll_a)
        i_dn = (ih_a, il_a)

        d = pack_ref[l].T  # (B, 12)
        q = d[:, 0:1].astype(jnp.int32)
        fp = (d[:, 2:3], d[:, 3:4])
        ft = (d[:, 4:5], d[:, 5:6])
        cd = (d[:, 6:7], d[:, 7:8])
        base = pl.multiple_of(qb_ref[l], 16)
        r0 = 4 * q - base

        # one-hot extraction weights: 8 row groups =
        # [part hi: (h0,p0) (h1,p0) (h0,p1) (h1,p1) | part lo: same]
        w_rows = []
        for part in (0, 1):
            secs = (0, 1) if part == 0 else (2, 3)
            for p in (0, 1):
                for h in (0, 1):
                    rr = r0 + 4 * (h + p * slab)
                    w = jnp.where(iota_q == rr + secs[0], 1.0, 0.0) + jnp.where(
                        iota_q == rr + secs[1], 1.0, 0.0
                    )
                    w_rows.append(w)
        w8 = jnp.concatenate(w_rows, axis=0).astype(jnp.bfloat16)  # (8B, win)

        k_win = tab_vmem[pl.ds(base, window)]
        r8 = jnp.dot(w8, k_win, preferred_element_type=jnp.float32)
        B2 = 2 * b_cols
        # (h stacked in M: rows [h0;h1] per press) -> (2B, n_eta*NE) pairs
        v_p0 = (r8[0:B2], r8[4 * b_cols : 4 * b_cols + B2])
        v_p1 = (r8[B2 : 2 * B2], r8[6 * b_cols : 8 * b_cols])

        # press combine in df: (1-fp)*v0 + fp*v1, fp broadcast to (2B, 1)
        fp2 = (jnp.concatenate([fp[0], fp[0]], 0), jnp.concatenate([fp[1], fp[1]], 0))
        omfp2 = df_add_f((-fp2[0], -fp2[1]), np.float32(1.0))
        # press combine with full product-error compensation (the hi*hi
        # rounding term is ~2^-24 RELATIVE and correlated across gpts —
        # dropping it would eat the whole flux budget)
        p0h, p0e = _tp(v_p0[0], omfp2[0])
        p1h, p1e = _tp(v_p1[0], fp2[0])
        s_hi, s_e = two_sum(p0h, p1h)
        lo_terms = (
            p0e + p1e + s_e
            + v_p0[0] * omfp2[1] + v_p0[1] * omfp2[0]
            + v_p1[0] * fp2[1] + v_p1[1] * fp2[0]
        )
        vt = fast_two_sum(s_hi, lo_terms)

        # eta interpolation (hat weights) in df over the 9 nodes
        e1 = eta1_ref[l].T  # (B, 4mb)
        e2 = eta2_ref[l].T
        loc_pair = (
            jnp.concatenate([e1[:, 0:mb], e2[:, 0:mb]], 0),
            jnp.concatenate([e1[:, mb : 2 * mb], e2[:, mb : 2 * mb]], 0),
        )
        cm_pair = (
            jnp.concatenate([e1[:, 2 * mb : 3 * mb], e2[:, 2 * mb : 3 * mb]], 0),
            jnp.concatenate([e1[:, 3 * mb :], e2[:, 3 * mb :]], 0),
        )
        loc_g = expand_df(loc_pair)   # (2B, G)
        cm_g = expand_df(cm_pair)

        t_acc = (jnp.zeros((B2, G), jnp.float32),) * 2
        p_acc = (jnp.zeros((B2, G), jnp.float32),) * 2
        for e in range(n_eta):
            # hat(loc, e) = clamp(1 - |loc - e|, 0, 1) in df
            dl = df_add_f(loc_g, np.float32(-e))
            neg = dl[0] < 0.0
            absdl = (jnp.where(neg, -dl[0], dl[0]), jnp.where(neg, -dl[1], dl[1]))
            w_e = df_add_f((-absdl[0], -absdl[1]), np.float32(1.0))
            pos = w_e[0] > 0.0
            w_e = (jnp.where(pos, w_e[0], 0.0), jnp.where(pos, w_e[1], 0.0))
            sl = vt[0][:, e * NE : e * NE + G], vt[1][:, e * NE : e * NE + G]
            t_acc = df_add(t_acc, df_mul(sl, w_e))
            sp = (
                vt[0][:, e * NE + G : (e + 1) * NE],
                vt[1][:, e * NE + G : (e + 1) * NE],
            )
            p_acc = df_add(p_acc, df_mul(sp, w_e))

        # temp-half combine: (1-ft)*acc[:B] + ft*acc[B:]
        omft = df_add_f((-ft[0], -ft[1]), np.float32(1.0))

        def combine(acc):
            a0 = (acc[0][:b_cols], acc[1][:b_cols])
            a1 = (acc[0][b_cols:], acc[1][b_cols:])
            return df_add(df_mul(a0, omft), df_mul(a1, ft))

        tau = combine(df_mul(cm_g, t_acc))
        pf = combine(p_acc)
        if debug_tau == "nocd":
            dbg_hi_ref[l] = tau[0]
            dbg_lo_ref[l] = tau[1]

        # + minor gases (streamed exact f64 pair), * col_dry
        wait_minor(jax.lax.rem(l, _i(2)))

        @pl.when(l > 0)
        def _prefetch_next():
            ln = l - _i(1)
            start_minor(ln, jax.lax.rem(ln, _i(2)))
        tau = df_mul(tau, cd)
        slot = jax.lax.rem(l, _i(2))
        tau = df_add(tau, (mh_buf[slot], ml_buf[slot]))
        tau = _df_max0(tau)
        if debug_tau is True:
            dbg_hi_ref[l] = tau[0]
            dbg_lo_ref[l] = tau[1]

        # transport
        tau_loc = df_mul_f(tau, np.float32(ds))
        trans = df_exp((-tau_loc[0], -tau_loc[1]))
        one_m_t = df_add_f((-trans[0], -trans[1]), np.float32(1.0))
        big = tau_loc[0] > tau_thresh
        safe = (jnp.where(big, tau_loc[0], 1.0), jnp.where(big, tau_loc[1], 0.0))
        fact_big = df_sub(_df_div(one_m_t, safe), trans)
        tl = tau_loc
        fact_small = df_mul(
            tl,
            df_add_f(
                df_mul(
                    tl, df_add_f(df_mul_f(tl, np.float32(0.125)),
                                 np.float32(-1.0 / 3.0))
                ),
                np.float32(0.5),
            ),
        )
        fact = (
            jnp.where(big, fact_big[0], fact_small[0]),
            jnp.where(big, fact_big[1], fact_small[1]),
        )

        # band Planck values (exact f64 pairs from the prologue)
        pl_l = plkl_ref[l].T
        lay_val = df_mul(expand_df((pl_l[:, :mb], pl_l[:, mb:])), pf)
        pe = plke_ref[l + 1].T
        gm = df_sqrt(df_mul(pf, pf_above))
        at_top = l == nlay - 1
        pf_gm = (
            jnp.where(at_top, pf[0], gm[0]),
            jnp.where(at_top, pf[1], gm[1]),
        )
        lev_above = df_mul(expand_df((pe[:, :mb], pe[:, mb:])), pf_gm)

        sup_val = clough_df(trans, fact, lay_val, lev_above)
        sdn_above = clough_df(trans_above, fact_above, lay_above, lev_above)
        below_top = l < nlay - 1
        i_dn_new_full = df_add(df_mul(trans_above, i_dn), sdn_above)
        i_dn_new = (
            jnp.where(below_top, i_dn_new_full[0], i_dn[0]),
            jnp.where(below_top, i_dn_new_full[1], i_dn[1]),
        )
        trans_hi_s[l] = trans[0]
        trans_lo_s[l] = trans[1].astype(trans_lo_s.dtype)
        sup_hi_s[l] = sup_val[0]
        sup_lo_s[l] = sup_val[1].astype(sup_lo_s.dtype)
        # downward flux reduced IN-LOOP (a (nlev, B, G) radiance scratch pair
        # would blow the 96 MiB scoped-VMEM budget by ~2.5 MB; the ~22-issue
        # lane reduction is noise next to the ~2000-issue df layer body)
        s_dn = _df_lane_sum(_mask_lanes(i_dn_new, b_cols, npad, n_gpt), n_gpt)
        dacc_hi[l + 1] = s_dn[0][:, 0]
        dacc_lo[l + 1] = s_dn[1][:, 0]
        return (
            pf[0], pf[1], trans[0], trans[1], fact[0], fact[1],
            lay_val[0], lay_val[1], i_dn_new[0], i_dn_new[1],
        )

    init = (zero,) * 10
    out = jax.lax.fori_loop(_i(0), _i(nlay), optics_step, init)
    pf0 = (out[0], out[1])
    trans0 = (out[2], out[3])
    fact0 = (out[4], out[5])
    lay0 = (out[6], out[7])
    i_dn1 = (out[8], out[9])

    # epilogue: level 0 (clamped neighbor pfrac), surface boundary
    pe0 = plke_ref[0].T
    lev0 = df_mul(expand_df((pe0[:, :mb], pe0[:, mb:])), pf0)
    i_dn_sfc = df_add(df_mul(trans0, i_dn1), clough_df(trans0, fact0, lay0, lev0))
    s_dn0 = _df_lane_sum(_mask_lanes(i_dn_sfc, b_cols, npad, n_gpt), n_gpt)
    dacc_hi[0] = s_dn0[0][:, 0]
    dacc_lo[0] = s_dn0[1][:, 0]

    em = emis_ref[:].T
    emis = expand_df((em[:, :mb], em[:, mb:]))
    ps = plks_ref[:].T
    sfc_src = df_mul(expand_df((ps[:, :mb], ps[:, mb:])), pf0)
    one_m_e = df_add_f((-emis[0], -emis[1]), np.float32(1.0))
    i_up = df_add(df_mul(i_dn_sfc, one_m_e), df_mul(emis, sfc_src))

    # mask pad lanes (zeros by construction of the table/expand pads, but
    # the df ops can leave -0/eps dust there)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b_cols, G), 1)
    live = lane < n_gpt

    def masked(p):
        return jnp.where(live, p[0], 0.0), jnp.where(live, p[1], 0.0)

    s = _df_lane_sum(masked(i_up), n_gpt)
    uacc_hi[0] = s[0][:, 0]
    uacc_lo[0] = s[1][:, 0]

    def up_step(ilay, carry):
        tr = (trans_hi_s[ilay], trans_lo_s[ilay].astype(jnp.float32))
        sp = (sup_hi_s[ilay], sup_lo_s[ilay].astype(jnp.float32))
        c = (carry[0], carry[1])
        i_up_n = df_add(df_mul(tr, c), sp)
        s_l = _df_lane_sum(masked(i_up_n), n_gpt)
        uacc_hi[ilay + 1] = s_l[0][:, 0]
        uacc_lo[ilay + 1] = s_l[1][:, 0]
        return (i_up_n[0], i_up_n[1])

    jax.lax.fori_loop(_i(0), _i(nlay), up_step, (i_up[0], i_up[1]))

    # one batched transpose per output (single-column dynamic stores into
    # the (B, nlev) outputs are dim-1-unaligned RMW writes Mosaic rejects)
    nlev = nlay + 1
    up_hi_ref[:] = uacc_hi[:nlev].T
    up_lo_ref[:] = uacc_lo[:nlev].T
    dn_hi_ref[:] = dacc_hi[:nlev].T
    dn_lo_ref[:] = dacc_lo[:nlev].T


def _tp(a, b):
    """two_prod (Veltkamp) — local alias so the kernel body reads clean."""
    from .df32 import two_prod

    return two_prod(a, b)


def _df_div(x, y):
    from .df32 import df_div

    return df_div(x, y)


# ---------------------------------------------------------------------------
# driver + f64 prologue
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("nlay", "window", "n_eta", "n_gpt", "n_bnd",
                     "bnd_lims_gpt", "slab", "ds", "w_mu", "block_cols",
                     "n_rows", "debug_tau"),
)
def lw_noscat_mega_df(
    q_base, pack, eta1, eta2, plk_lay, plk_lev, plk_sfc, sfc_emis,
    tmin_hi, tmin_lo, fused4,
    *, nlay, window, n_eta, n_gpt, n_bnd, bnd_lims_gpt, slab, ds, w_mu,
    block_cols, n_rows, debug_tau=False,
):
    ncol = pack.shape[-1]
    nlev = nlay + 1
    gp = gpt_pad(n_gpt)
    assert ncol % block_cols == 0, (ncol, block_cols)
    nblk = ncol // block_cols
    mb = eta1.shape[1] // 4

    # exact band-expand matrix for 4+2 slice groups: rows [s1..s4 of hi,
    # s1..s2 of lo]; hi-group slices 1-2 -> cols [0:gp], slices 3-4 and the
    # lo-group -> cols [gp:2gp]
    m_band = np.zeros((mb, gp), np.float32)
    for i, (g0, g1) in enumerate(bnd_lims_gpt):
        m_band[i, g0:g1] = 1.0
    m6_np = np.zeros((6 * mb, 2 * gp), np.float32)
    m6_np[0 * mb : 1 * mb, :gp] = m_band
    m6_np[1 * mb : 2 * mb, :gp] = m_band
    for k in (2, 3, 4, 5):
        m6_np[k * mb : (k + 1) * mb, gp:] = m_band
    m6 = jnp.asarray(m6_np, jnp.bfloat16)

    lay3 = lambda d1: pl.BlockSpec(
        (nlay, d1, block_cols), lambda c, *_: (0, 0, c), memory_space=pltpu.VMEM
    )
    lev3 = lambda d1: pl.BlockSpec(
        (nlev, d1, block_cols), lambda c, *_: (0, 0, c), memory_space=pltpu.VMEM
    )
    band2 = lambda d0: pl.BlockSpec(
        (d0, block_cols), lambda c, *_: (0, c), memory_space=pltpu.VMEM
    )
    red_spec = pl.BlockSpec(
        (block_cols, nlev), lambda c, *_: (c, 0), memory_space=pltpu.VMEM
    )
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda c, *_: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _lw_df_kernel,
        nlay=nlay, window=window, n_eta=n_eta, npad=gp, slab=slab,
        ds=ds, w_mu=w_mu, n_gpt=n_gpt, debug_tau=debug_tau,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            lay3(pack.shape[1]),
            lay3(4 * mb), lay3(4 * mb),
            lay3(2 * mb), lev3(2 * mb), band2(2 * mb), band2(2 * mb),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            full(m6),
        ],
        out_specs=(red_spec,) * 4 + ((
            pl.BlockSpec((nlay, block_cols, gp), lambda c, *_: (0, c, 0),
                         memory_space=pltpu.VMEM),
        ) * 2 if debug_tau else ()),
        scratch_shapes=[
            pltpu.VMEM(fused4.shape, jnp.bfloat16),
            pltpu.VMEM((2, block_cols, gp), jnp.float32),
            pltpu.VMEM((2, block_cols, gp), jnp.float32),
            pltpu.VMEM((nlay, block_cols, gp), jnp.float32),
            pltpu.VMEM((nlay, block_cols, gp), jnp.bfloat16),
            pltpu.VMEM((nlay, block_cols, gp), jnp.float32),
            pltpu.VMEM((nlay, block_cols, gp), jnp.bfloat16),
            pltpu.VMEM((-(-nlev // 8) * 8, block_cols), jnp.float32),
            pltpu.VMEM((-(-nlev // 8) * 8, block_cols), jnp.float32),
            pltpu.VMEM((-(-nlev // 8) * 8, block_cols), jnp.float32),
            pltpu.VMEM((-(-nlev // 8) * 8, block_cols), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((ncol, nlev), jnp.float32) for _ in range(4)
    ) + (tuple(
        jax.ShapeDtypeStruct((nlay, ncol, gp), jnp.float32) for _ in range(2)
    ) if debug_tau else ())
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_interpret(),
    )(
        q_base, pack, eta1, eta2, plk_lay, plk_lev, plk_sfc, sfc_emis,
        tmin_hi, tmin_lo, fused4, m6,
    )
    # raw f32 hi/lo outputs; the f64 combine + intensity->flux scaling
    # happen in solve_lw_df64 OUTSIDE this jit: the kernel must trace with
    # x64 DISABLED (an x64 trace makes the fori induction variable i64,
    # which Mosaic cannot lower — the same reason the f32 megakernels are
    # never traced under enable_x64)
    return out


@functools.lru_cache(maxsize=1)
def _mega_df_jit():
    """lw_noscat_mega_df under the raised scoped-VMEM option (the kernel's
    per-layer df scratch exceeds the 16 MB default scoped budget at real
    spectral size; same option as every f32 megakernel jit). Cached so the
    jit (and its trace cache) is created once."""
    from ..utils.compile import tpu_compiler_options

    copts = tpu_compiler_options()
    if copts is None:
        return lw_noscat_mega_df
    return jax.jit(
        lw_noscat_mega_df.__wrapped__,
        static_argnames=("nlay", "window", "n_eta", "n_gpt", "n_bnd",
                         "bnd_lims_gpt", "slab", "ds", "w_mu", "block_cols",
                         "n_rows", "debug_tau"),
        compiler_options=copts,
    )


def _df_pair_cols(x64):
    """f64 (…,) -> (hi, lo) f32 arrays (exact split)."""
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def solve_lw_df64(
    lkp, tables: Df64Tables, as_, bcs, *,
    window: int, block_cols: int = 128, eta_node_mode: str = "continuous",
    n_gauss_angles: int = 1,
):
    """Clear-sky LW no-scat flux solve in the split-precision df64 tier.

    Everything band-granular runs in TRUE f64 XLA (cheap); the spectral hot
    path runs in the df32 megakernel. Requires f64 inputs and ncol % 128
    == 0 (callers pad). Returns (flux_up, flux_dn) f64 (nlev, ncol).
    Gate: tests_tpu/test_tpu_df64.py pins L-inf vs the exact XLA f64 path
    at the reference's 1e-4 W/m^2 (ref test/runtests.jl:21-23).
    """
    from ..angular import angular_discretization

    assert jnp.dtype(as_.p_lay.dtype) == jnp.float64, "df64 tier needs f64 input"
    nlay, ncol = as_.p_lay.shape
    rps = rows_per_slab(lkp.n_temp)
    mb = -(-lkp.n_bnd // 8) * 8

    # the whole f64 prologue runs as ONE jit (eager per-primitive dispatch
    # through the tunnel costs seconds); cached per configuration. The
    # cache VALUE keeps strong references to (lkp, tables): the key uses
    # id(), which the interpreter reuses after garbage collection — without
    # the pinned refs a recycled id could serve a jit with STALE baked
    # tables.
    key = (id(lkp), id(tables), window, eta_node_mode, nlay, ncol)
    hit = _PROLOGUE_CACHE.get(key)
    if hit is None:
        fn = jax.jit(functools.partial(
            _df64_prologue, lkp, tables, window=window,
            eta_node_mode=eta_node_mode,
        ))
        _PROLOGUE_CACHE[key] = (fn, lkp, tables)
    else:
        fn = hit[0]
    (q_base, pack, eta1, eta2, plk_lay, plk_lev, plk_sfc, emis_op,
     tm_h, tm_l, ok) = fn(as_, bcs)

    Ds, wts = angular_discretization(n_gauss_angles)
    up = dn = None
    for k in range(n_gauss_angles):
        prev_x64 = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", False)
        try:
            out = _mega_df_jit()(
                q_base, pack, eta1, eta2, plk_lay, plk_lev, plk_sfc, emis_op,
                tm_h, tm_l, tables.fused4,
                nlay=nlay, window=window, n_eta=lkp.n_eta, n_gpt=lkp.n_gpt,
                n_bnd=lkp.n_bnd, bnd_lims_gpt=lkp.bnd_lims_gpt, slab=rps,
                ds=float(Ds[k]), w_mu=float(wts[k]), block_cols=block_cols,
                n_rows=tables.n_rows,
            )
        finally:
            jax.config.update("jax_enable_x64", prev_x64)
        up_hi, up_lo, dn_hi, dn_lo = out[:4]
        i2f = float(np.pi) * float(wts[k])
        up_k = (up_hi.T.astype(jnp.float64) + up_lo.T.astype(jnp.float64)) * i2f
        dn_k = (dn_hi.T.astype(jnp.float64) + dn_lo.T.astype(jnp.float64)) * i2f
        up = up_k if up is None else up + up_k
        dn = dn_k if dn is None else dn + dn_k
    bad = jnp.where(ok, 0.0, jnp.nan).astype(up.dtype)
    return up + bad, dn + bad


_PROLOGUE_CACHE: dict = {}


def _df64_prologue(lkp, tables, as_, bcs, *, window, eta_node_mode):
    """f64 XLA prologue of the df64 tier: interpolation data, exact hi/lo
    operand pairs, minor-gas tau, band Planck values (one jitted program)."""
    nlay, ncol = as_.p_lay.shape
    rps = rows_per_slab(lkp.n_temp)
    mb = -(-lkp.n_bnd // 8) * 8
    pt = _pt_interp_fast(lkp, as_.p_lay, as_.t_lay)
    eta = _eta_interp_bl_fast(
        lkp, as_.vmr, pt, nbnd_out=mb, node_mode=eta_node_mode
    )
    q_major = pt.jpress_base * rps + pt.jtemp
    q_base, ok = mega4_window_bases(q_major, rps, tables.n_rows, window)

    # pack: q, jt, fp hi/lo, ft hi/lo, col_dry hi/lo (+ pad to 16 rows)
    fp_h, fp_l = _df_pair_cols(pt.fpress)
    ft_h, ft_l = _df_pair_cols(pt.ftemp)
    # col_dry carries the inverse of the table's power-of-two scale (exact)
    cd_h, cd_l = _df_pair_cols(
        as_.col_dry * np.float64(2.0) ** (-tables.km_scale_pow)
    )
    pack = jnp.stack(
        [
            q_major.astype(jnp.float32), pt.jtemp.astype(jnp.float32),
            fp_h, fp_l, ft_h, ft_l, cd_h, cd_l,
        ]
        + [jnp.zeros_like(fp_h)] * 8,
        axis=1,
    )  # (nlay, 16, ncol) f32

    # eta operands, band-leading (mb rows): loc = jeta + feta (the kernel
    # hat-accumulates over ALL nodes, so the location is the only quantity
    # needed — identical to the f32 megakernel's loc_g2 contract)
    def eta_operand(je, fe, cm):
        loc64 = je.astype(jnp.float64) + fe
        lh, ll = _df_pair_cols(loc64)   # (mb, nlay, ncol)
        ch, cl = _df_pair_cols(cm)
        op = jnp.concatenate([lh, ll, ch, cl], axis=0)  # (4mb, nlay, ncol)
        return jnp.swapaxes(op, 0, 1)                   # (nlay, 4mb, ncol)

    eta1 = eta_operand(eta.jeta1, eta.feta1, eta.col_mix1)
    eta2 = eta_operand(eta.jeta2, eta.feta2, eta.col_mix2)

    # band Planck values in f64: the interpolation WEIGHTS stay f64, but
    # the table-row extraction runs as EXACT one-hot f32 dots (f64
    # dot_general while-emulates on TPU — profiled at ~90 ms of this
    # prologue at 8k cols). Table rows split exactly into two f32 words;
    # [T | roll(T)] supplies the j+1 node from the same one-hot.
    tp64 = jnp.asarray(lkp.totplnk, jnp.float64)  # (nT, nbnd)
    tp_hi = tp64.astype(jnp.float32)
    tp_lo = (tp64 - tp_hi.astype(jnp.float64)).astype(jnp.float32)
    tp_cat = jnp.concatenate(
        [tp_hi, jnp.roll(tp_hi, -1, axis=0), tp_lo, jnp.roll(tp_lo, -1, axis=0)],
        axis=1,
    )  # (nT, 4*nbnd)
    n_tp = tp64.shape[0]
    iota_tp = jnp.arange(n_tp, dtype=jnp.int32)
    nb = lkp.n_bnd

    def planck_bands(t):
        loc = (t - lkp.t_planck_min) * (1.0 / lkp.t_planck_delta)
        j = jnp.clip(jnp.floor(loc), 0, n_tp - 2)
        f = jnp.clip(loc - j, 0.0, 1.0)[..., None]
        w = (j.astype(jnp.int32)[..., None] == iota_tp).astype(jnp.float32)
        r = jax.lax.dot_general(
            w, tp_cat, (((w.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (..., 4*nbnd): exact f32 words of T[j], T[j+1]
        v0 = r[..., 0:nb].astype(jnp.float64) + r[..., 2 * nb : 3 * nb].astype(jnp.float64)
        v1 = r[..., nb : 2 * nb].astype(jnp.float64) + r[..., 3 * nb :].astype(jnp.float64)
        pb = (1.0 - f) * v0 + f * v1
        if mb != nb:
            pad = [(0, 0)] * (pb.ndim - 1) + [(0, mb - nb)]
            pb = jnp.pad(pb, pad)
        return pb

    def band_operand(pb):  # (..., mb) -> (..., 2mb, ncol)-style hi|lo
        h, l = _df_pair_cols(pb)
        return jnp.concatenate([h, l], axis=-1)

    plk_lay = jnp.swapaxes(band_operand(planck_bands(as_.t_lay)), 1, 2)
    plk_lev = jnp.swapaxes(band_operand(planck_bands(as_.t_lev)), 1, 2)
    plk_sfc = band_operand(planck_bands(as_.t_sfc)).T
    emis64 = jnp.asarray(bcs.sfc_emis, jnp.float64)
    if emis64.shape[0] == 1:
        emis64 = jnp.broadcast_to(emis64, (lkp.n_bnd, ncol))
    if mb != lkp.n_bnd:
        emis64 = jnp.pad(emis64, ((0, mb - lkp.n_bnd), (0, 0)))
    eh, el = _df_pair_cols(emis64)
    emis_op = jnp.concatenate([eh, el], axis=0)  # (2mb, ncol)

    # minor gases: exact f64 XLA, shipped as one spectral pair. The gather
    # formulation lowers to serial while-loops on TPU (profiled at ~250 of
    # the prologue's 324 ms at 8k cols); this MXU form extracts the 4
    # (temp, eta) nodes EXACTLY with one-hot f32 dots instead
    tau_minor = _tau_minor_f64_mxu(
        lkp, as_.vmr, as_.col_dry, as_.p_lay, as_.t_lay, pt, _bl_to_bt(eta)
    )
    gp = gpt_pad(lkp.n_gpt)
    if gp != lkp.n_gpt:
        tau_minor = jnp.pad(tau_minor, ((0, 0), (0, 0), (0, gp - lkp.n_gpt)))
    tm_h, tm_l = _df_pair_cols(tau_minor)
    return (q_base, pack, eta1, eta2, plk_lay, plk_lev, plk_sfc, emis_op,
            tm_h, tm_l, ok)


def _recip_f64_fast(x64):
    """1/x in f64 via an f32 seed + one Newton step (mul/sub only).

    XLA emulates f64 divide/log/exp on TPU as serial while-loops (profiled
    at ~200 ms of the df64 prologue); f64 mul/add are cheap (~4x f32,
    benchmarks/f64_split.py). Seed rel error ~2^-22 squares to ~2^-44.
    """
    r1 = (1.0 / x64.astype(jnp.float32)).astype(jnp.float64)
    return r1 * (2.0 - x64 * r1)


def _log_f64_fast(p64):
    """ln(x) in f64 without f64 transcendental emulation: f32 log seed,
    df32 exp of the seed (2^-44), Newton reciprocal, and a 3-term ln(1+x)
    series on the ~2^-22 residual (truncation ~2^-88)."""
    from .df32 import df_exp, from_f64

    l1 = jnp.log(p64.astype(jnp.float32)).astype(jnp.float64)
    e = df_exp(from_f64(l1))
    e64 = e[0].astype(jnp.float64) + e[1].astype(jnp.float64)
    x = p64 * _recip_f64_fast(e64) - 1.0
    return l1 + x - 0.5 * x * x + (x * x * x) * (1.0 / 3.0)


def _pt_interp_fast(lkp, p_lay, t_lay):
    """compute_pt_interp with the f64 log/divides replaced by fast forms
    (identical indices/fractions to ~2^-44; used only by the df64
    prologue — the exact paths keep gas_optics.compute_pt_interp)."""
    from .gas_optics import PTInterp

    loc_t = (t_lay - lkp.t_ref_min) * (1.0 / lkp.t_ref_delta)
    jtemp = jnp.clip(jnp.floor(loc_t), 0, lkp.n_temp - 2).astype(jnp.int32)
    ftemp = loc_t - jtemp
    log_p = _log_f64_fast(p_lay)
    loc_p = (lkp.ln_p_ref_max - log_p) * (1.0 / lkp.ln_p_ref_delta)
    jp = jnp.clip(jnp.floor(loc_p), 0, lkp.n_press - 2).astype(jnp.int32)
    fpress = loc_p - jp
    tropo_lower = p_lay > lkp.p_ref_tropo
    jpress_base = jp + jnp.where(tropo_lower, 0, 1)
    return PTInterp(jtemp, ftemp, jpress_base, fpress, tropo_lower)


def _eta_interp_bl_fast(lkp, vmr, pt, nbnd_out=None, node_mode="continuous"):
    """compute_eta_interp_bl with the per-band f64 divide replaced by the
    Newton-reciprocal form (~2^-44; df64-prologue-only)."""
    from .gas_optics import _eta_frac, get_vmr

    nbnd = lkp.n_bnd
    mb = nbnd_out if (nbnd_out is not None and nbnd_out > nbnd) else nbnd
    n_eta = lkp.n_eta
    dtype = lkp.eta_half.dtype
    shape2d = pt.jtemp.shape
    nlay, ncol = shape2d

    def vmr_stack(slot, t):
        return jnp.stack(
            [
                jnp.broadcast_to(
                    get_vmr(vmr, lkp.key_species[min(b, nbnd - 1)][t][slot]),
                    shape2d,
                )
                for b in range(mb)
            ],
            axis=0,
        ).astype(dtype)

    sel = pt.tropo_lower[None]
    vmr1 = jnp.where(sel, vmr_stack(0, 0), vmr_stack(0, 1))
    vmr2 = jnp.where(sel, vmr_stack(1, 0), vmr_stack(1, 1))

    eh = jnp.transpose(lkp.eta_half, (2, 0, 1))
    if mb != nbnd:
        eh = jnp.pad(eh, ((0, 0), (0, mb - nbnd), (0, 0)))
    ntemp = eh.shape[0]
    eh2 = jnp.asarray(eh.reshape(ntemp, -1), jnp.float64)
    eh_cat64 = jnp.concatenate([eh2, jnp.roll(eh2, -1, axis=0)], axis=1)
    # exact f32-split extraction (an f64 dot_general while-emulates on TPU)
    ec_hi = eh_cat64.astype(jnp.float32)
    ec_lo = (eh_cat64 - ec_hi.astype(jnp.float64)).astype(jnp.float32)
    nb2 = eh_cat64.shape[1]
    iota_t = jnp.arange(ntemp, dtype=jnp.int32)
    w_t = (pt.jtemp.reshape(-1)[None] == iota_t[:, None]).astype(jnp.float32)
    r = jax.lax.dot_general(
        jnp.concatenate([ec_hi, ec_lo], axis=1).T, w_t,
        (((1,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST,
    )  # (2*nb2, N)
    ehg_both = (
        r[:nb2].astype(jnp.float64) + r[nb2:].astype(jnp.float64)
    ).reshape(2, mb, 2, nlay, ncol)

    from .gas_optics import EtaInterp

    outs = []
    for itemp in (0, 1):
        eta_half = jnp.where(sel, ehg_both[itemp, :, 0], ehg_both[itemp, :, 1])
        col_mix = vmr1 + eta_half * vmr2
        pos = col_mix > 0.0
        eta = jnp.where(
            pos,
            vmr1 * _recip_f64_fast(jnp.where(pos, col_mix, 1.0)),
            0.5,
        )
        # exact-node guard: vmr2 == 0 means eta == 1 EXACTLY (common on
        # real data) — the Newton reciprocal's 2^-44 wobble would otherwise
        # land loc_eta just off the node, where the "reference" node
        # semantics (full-cell jump, gas_optics._eta_frac) diverge
        eta = jnp.where(pos & (vmr2 == 0.0), 1.0, eta)
        loc_eta = eta * (n_eta - 1)
        jeta_f = jnp.minimum(jnp.floor(loc_eta), n_eta - 2)
        jeta = jeta_f.astype(jnp.int32)
        feta = _eta_frac(loc_eta, jeta_f, node_mode)
        outs.append((jeta, feta, col_mix))
    (j1, f1, c1), (j2, f2, c2) = outs
    return EtaInterp(j1, f1, j2, f2, c1, c2)


def _tau_minor_f64_mxu(lkp, vmr, col_dry, p_lay, t_lay, pt, eta):
    """Minor-gas tau in f64 with MXU-friendly exact node extraction.

    Same arithmetic as gas_optics.compute_tau_minor (ref gas_optics.jl:
    255-306). Each interval's 2x2 (temp, eta) interpolation nodes are
    EXTRACTED via one-hot f32 dots over the combined (temp*neta) row axis —
    one dot per temp node per interval, against [T_hi | roll(T_hi) | T_lo |
    roll(T_lo)] so the (e, e+1) pair comes from a single one-hot (the roll
    supplies e+1). A one-hot f32 dot at HIGHEST precision picks a single
    row exactly, and the f64 table splits exactly into two f32 words, so
    the extracted f64 values are EXACT; the interpolation weights then
    combine in true f64 on the VPU. TPU-only motivation: XLA lowers the
    equivalent row gather to serial while-loops (measured ~250 ms of the
    8k-col df64 prologue; this form ~20 ms)."""
    from .gas_optics import get_vmr, gpt2band_np

    nlay, ncol = p_lay.shape
    dtype = col_dry.dtype
    neta = lkp.n_eta
    ntemp = lkp.n_temp
    N = nlay * ncol
    tau = jnp.zeros((nlay, ncol, lkp.n_gpt), dtype)

    vmr_h2o = get_vmr(vmr, lkp.idx_h2o)
    dry_fact = _recip_f64_fast(1.0 + jnp.broadcast_to(vmr_h2o, p_lay.shape))
    density_fact = 0.01 * p_lay * _recip_f64_fast(t_lay)
    ft = pt.ftemp[..., None].astype(dtype)
    iota = jnp.arange(ntemp * neta, dtype=jnp.int32)
    hp = jax.lax.Precision.HIGHEST

    def extract(K2_64, idx):
        """(ntemp*neta, ng) f64 table, (nlay, ncol) int rows ->
        f64 (nlay, ncol, ng) values at idx and idx+1 (exact)."""
        hi = K2_64.astype(jnp.float32)
        lo = (K2_64 - hi.astype(jnp.float64)).astype(jnp.float32)
        cat = jnp.concatenate(
            [hi, jnp.roll(hi, -1, axis=0), lo, jnp.roll(lo, -1, axis=0)],
            axis=1,
        )
        w = (idx.reshape(-1)[:, None] == iota[None, :]).astype(jnp.float32)
        r = jax.lax.dot_general(
            w, cat, (((1,), (0,)), ((), ())), precision=hp
        )  # (N, 4*ng)
        ng = K2_64.shape[1]
        v0 = r[:, 0:ng].astype(jnp.float64) + r[:, 2 * ng : 3 * ng].astype(jnp.float64)
        v1 = r[:, ng : 2 * ng].astype(jnp.float64) + r[:, 3 * ng :].astype(jnp.float64)
        return v0.reshape(nlay, ncol, ng), v1.reshape(nlay, ncol, ng)

    g2b = gpt2band_np(lkp)
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
            ibnd = int(g2b[itv.gpt0])
            krows = kminor[itv.k0 : itv.k0 + ng]          # (ng, nt, neta)
            K2 = jnp.asarray(krows, jnp.float64).transpose(1, 2, 0).reshape(
                ntemp * neta, ng
            )
            fe1 = eta.feta1[:, :, ibnd][..., None].astype(dtype)
            fe2 = eta.feta2[:, :, ibnd][..., None].astype(dtype)
            r00, r01 = extract(K2, pt.jtemp * neta + eta.jeta1[:, :, ibnd])
            r10, r11 = extract(K2, (pt.jtemp + 1) * neta + eta.jeta2[:, :, ibnd])
            v1 = (1.0 - fe1) * r00 + fe1 * r01
            v2 = (1.0 - fe2) * r10 + fe2 * r11
            contrib = (1.0 - ft) * v1 + ft * v2
            contrib = contrib * (scaling * jnp.where(mask, 1.0, 0.0))[..., None]
            tau = tau.at[:, :, itv.gpt0 : itv.gpt1].add(contrib)
    return tau


def _bl_to_bt(eta):
    """Band-leading EtaInterp (nbnd, nlay, ncol) -> band-trailing
    (nlay, ncol, nbnd) for compute_tau_minor."""
    from .gas_optics import EtaInterp

    t = lambda x: jnp.transpose(x, (1, 2, 0))
    return EtaInterp(
        t(eta.jeta1), t(eta.feta1), t(eta.jeta2), t(eta.feta2),
        t(eta.col_mix1), t(eta.col_mix2),
    )
