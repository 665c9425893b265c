"""Pallas TPU kernels: fused RTE vertical sweeps.

The reference keeps the vertical recurrence in registers per column
(/root/reference/src/rte/shortwave2stream.jl:226-311,
 longwave1scalar.jl:149-212). The XLA ``lax.scan`` formulation materializes
per-layer coefficient tensors in HBM and pays per-step slice/carry copies
(~10x roofline at DYAMOND widths). These kernels keep a whole column block's
vertical extent resident in VMEM: layer coefficients (Meador-Weaver /
Zdunkowski PIFM, Clough sources) are computed on the VPU inside the kernel,
the bidirectional adding/doubling recurrences run as ``fori_loop`` over VMEM
rows, and only (tau, ssa, g, sources) in and fluxes out touch HBM.

Layout: blocks are (nlay-or-nlev, B columns, gpt_pad) — lanes = g-points,
sublanes = columns, vertical = untiled leading axis (cheap dynamic row
indexing).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_interp import _expand_bands, _split_hi_lo, gpt_pad


def _interpret() -> bool:
    """Run kernels in interpret mode off-TPU (CPU tests, debugging)."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Shortwave two-stream sweep
# ---------------------------------------------------------------------------


def _sw_coeffs(tau, ssa, g, mu0, eps, T0=None):
    """Zdunkowski PIFM + Meador-Weaver direct R/T with energy clamps.

    Identical arithmetic to ops.rte.sw_2stream_coeffs
    (ref shortwave2stream.jl:135-195); runs on the VPU inside the kernel.
    T0 (the direct transmittance exp(-tau/mu0)) may be passed in when the
    caller already computed it — the exp+divide is one of the kernel's
    costlier VPU ops and the SW megakernel needs the same value for its
    direct-beam scratch.
    """
    k_min = eps ** 0.5
    # trace-time clear-sky specialization: with asymmetry g == 0 (a Python
    # scalar, not a traced zero array) gamma3 = gamma4 = 1/2, so
    # alpha1 == alpha2 == (gamma1+gamma2)/2 and k_g3 == k_g4 == k/2 —
    # several full-width VPU ops collapse into shared ones
    isotropic = isinstance(g, (int, float)) and g == 0.0
    gamma1 = (8.0 - ssa * (5.0 + 3.0 * g)) * 0.25
    gamma2 = 3.0 * (ssa * (1.0 - g)) * 0.25
    if isotropic:
        alpha1 = alpha2 = 0.5 * (gamma1 + gamma2)
    else:
        gamma3 = (2.0 - (3.0 * mu0) * g) * 0.25
        gamma4 = 1.0 - gamma3
        alpha1 = gamma1 * gamma4 + gamma2 * gamma3
        alpha2 = gamma1 * gamma3 + gamma2 * gamma4
    k = jnp.sqrt(jnp.maximum((gamma1 - gamma2) * (gamma1 + gamma2), k_min))

    ektau = jnp.exp(-tau * k)
    e2ktau = ektau * ektau
    if T0 is None:
        T0 = jnp.exp(-tau / jnp.maximum(mu0, eps))
    k_mu = k * mu0
    if isotropic:
        k_g3 = k_g4 = 0.5 * k
    else:
        k_g3 = k * gamma3
        k_g4 = k * gamma4
    omk2 = 1.0 - k_mu * k_mu
    denom = jnp.where(jnp.abs(omk2) >= eps, omk2, eps)
    # one reciprocal serves rt AND rt2: 1/(base*denom) * denom == 1/base,
    # * ssa == ssa/(base*denom) — saves a full-width divide per layer
    base = k * (1.0 + e2ktau) + gamma1 * (1.0 - e2ktau)
    inv = 1.0 / (base * denom)
    rt = inv * denom
    Rdif = rt * gamma2 * (1.0 - e2ktau)
    Tdif = rt * 2.0 * k * ektau
    rt2 = ssa * inv
    Rdir_u = rt2 * (
        (1.0 - k_mu) * (alpha2 + k_g3)
        - (1.0 + k_mu) * (alpha2 - k_g3) * e2ktau
        - 2.0 * (k_g3 - alpha2 * k_mu) * ektau * T0
    )
    Tdir_u = -rt2 * (
        (1.0 + k_mu) * (alpha1 + k_g4) * T0
        - (1.0 - k_mu) * (alpha1 - k_g4) * e2ktau * T0
        - 2.0 * (k_g4 + alpha1 * k_mu) * ektau
    )
    Rdir = jnp.maximum(0.0, jnp.minimum(Rdir_u, 1.0 - T0))
    Tdir = jnp.maximum(0.0, jnp.minimum(Tdir_u, 1.0 - T0 - Rdir))
    return Rdir, Tdir, Rdif, Tdif


def _sw_sweep_kernel(
    tau_ref, ssa_ref, g_ref,          # (nlay, B, G)
    mu0_ref, toa_ref, adir_ref, adif_ref, incdif_ref,  # (B, G)
    up_ref, dn_ref, dir_ref,          # (nlev, B, G) outputs
    albedo, src,                      # scratch (nlev, B, G)
    *, nlay: int,
):
    """Full-spectrum SW sweep: per-g-point fluxes written to HBM."""
    eps = float(jnp.finfo(jnp.float32).eps)
    mu0 = mu0_ref[:]
    mu0_safe = jnp.maximum(mu0, eps)
    dir_top = toa_ref[:] * mu0

    # direct beam, TOA -> surface (ref :244-251)
    dir_ref[nlay] = dir_top

    def dir_step(i, carry):
        ilay = nlay - 1 - i
        d = carry * jnp.exp(-tau_ref[ilay] / mu0_safe)
        dir_ref[ilay] = d
        return d

    jax.lax.fori_loop(0, nlay, dir_step, dir_top)

    # bottom-up albedo/src (ref :259-281)
    albedo[0] = adif_ref[:]
    src[0] = dir_ref[0] * adir_ref[:]

    def up_step(ilay, carry):
        alb_i, src_i = carry
        Rdir, Tdir, Rdif, Tdif = _sw_coeffs(
            tau_ref[ilay], ssa_ref[ilay], g_ref[ilay], mu0, eps
        )
        denom = 1.0 / (1.0 - Rdif * alb_i)
        d_above = dir_ref[ilay + 1]
        alb_n = Rdif + Tdif * Tdif * alb_i * denom
        src_n = Rdir * d_above + Tdif * denom * (src_i + alb_i * Tdir * d_above)
        albedo[ilay + 1] = alb_n
        src[ilay + 1] = src_n
        return alb_n, src_n

    jax.lax.fori_loop(0, nlay, up_step, (albedo[0], src[0]))

    # top-down diffuse flux (ref :287-309)
    fd_top = incdif_ref[:]
    up_ref[nlay] = fd_top * albedo[nlay] + src[nlay]
    dn_ref[nlay] = fd_top + dir_ref[nlay]

    def down_step(i, carry):
        ilay = nlay - 1 - i
        Rdir, Tdir, Rdif, Tdif = _sw_coeffs(
            tau_ref[ilay], ssa_ref[ilay], g_ref[ilay], mu0, eps
        )
        alb_i = albedo[ilay]
        src_i = src[ilay]
        denom = 1.0 / (1.0 - Rdif * alb_i)
        fd = (Tdif * carry + Rdif * src_i + Tdir * dir_ref[ilay + 1]) * denom
        up_ref[ilay] = fd * alb_i + src_i
        dn_ref[ilay] = fd + dir_ref[ilay]
        return fd

    jax.lax.fori_loop(0, nlay, down_step, fd_top)


@functools.partial(jax.jit, static_argnames=("block_cols",))
def sw_2stream_pallas(
    tau: jax.Array,   # (nlay, ncol, ngpt) f32
    ssa: jax.Array,
    g: jax.Array,
    mu0: jax.Array,          # (ncol, ngpt)
    toa_flux: jax.Array,     # (ncol, ngpt)
    sfc_alb_direct: jax.Array,
    sfc_alb_diffuse: jax.Array,
    inc_flux_diffuse: jax.Array | None = None,
    block_cols: int = 16,
):
    """Fused SW two-stream sweep; returns (flux_up, flux_dn_total, flux_dn_dir).

    Same numerics as ops.rte.sw_2stream (night-column zeroing is the caller's
    job, as there).
    """
    nlay, ncol, ngpt = tau.shape
    nlev = nlay + 1
    gp = gpt_pad(ngpt)
    assert ncol % block_cols == 0, (ncol, block_cols)

    def padg(x):
        if x.shape[-1] == gp:
            return x.astype(jnp.float32)
        w = [(0, 0)] * x.ndim
        w[-1] = (0, gp - ngpt)
        return jnp.pad(x.astype(jnp.float32), w)

    inc = (
        jnp.zeros_like(mu0) if inc_flux_diffuse is None else inc_flux_diffuse
    )
    lay_spec = pl.BlockSpec((nlay, block_cols, gp), lambda c: (0, c, 0), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((block_cols, gp), lambda c: (c, 0), memory_space=pltpu.VMEM)
    lev_spec = pl.BlockSpec((nlev, block_cols, gp), lambda c: (0, c, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_sw_sweep_kernel, nlay=nlay),
        interpret=_interpret(),
        grid=(ncol // block_cols,),
        in_specs=[lay_spec] * 3 + [col_spec] * 5,
        out_specs=(lev_spec, lev_spec, lev_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nlev, ncol, gp), jnp.float32) for _ in range(3)
        ),
        scratch_shapes=[
            pltpu.VMEM((nlev, block_cols, gp), jnp.float32),
            pltpu.VMEM((nlev, block_cols, gp), jnp.float32),
        ],
    )(
        padg(tau), padg(ssa), padg(g),
        padg(mu0), padg(toa_flux), padg(sfc_alb_direct), padg(sfc_alb_diffuse),
        padg(inc),
    )
    return tuple(o[..., :ngpt] for o in out)


def _sw_sweep_reduced_kernel(
    *refs,
    # with has_g: tau, ssa, g (nlay,B,G); mu0, toa, adir, adif, incdif (B,G);
    # outputs up, dn, dir (B, nlev); scratch dirf/albedo/src (nlev,B,G),
    # up_acc/dn_acc (nlev,B). Without has_g the g_ref operand is absent and
    # the asymmetry factor is the constant 0 (clear-sky Rayleigh scattering,
    # ref shortwave2stream.jl: gas-only ssa has g=0) — saves one full
    # (nlay, ncol, ngpt) HBM tensor of write+read traffic.
    nlay: int,
    has_g: bool,
):
    """SW sweep with the spectral reduction fused in: only (nlev, B) flux
    columns leave VMEM (the reference accumulates per-g-point fluxes into one
    buffer, /root/reference/src/rte/shortwave2stream.jl:92-102; here the
    g-point axis lives on lanes so the accumulation is a lane-axis sum)."""
    if has_g:
        (tau_ref, ssa_ref, g_ref, mu0_ref, toa_ref, adir_ref, adif_ref,
         incdif_ref, up_ref, dn_ref, dir_ref, dirf, albedo, src,
         up_acc, dn_acc) = refs
        gval = lambda ilay: g_ref[ilay]
    else:
        (tau_ref, ssa_ref, mu0_ref, toa_ref, adir_ref, adif_ref,
         incdif_ref, up_ref, dn_ref, dir_ref, dirf, albedo, src,
         up_acc, dn_acc) = refs
        gval = lambda ilay: 0.0
    eps = float(jnp.finfo(jnp.float32).eps)
    mu0 = mu0_ref[:]
    mu0_safe = jnp.maximum(mu0, eps)
    dir_top = toa_ref[:] * mu0

    dirf[nlay] = dir_top

    def dir_step(i, carry):
        ilay = nlay - 1 - i
        d = carry * jnp.exp(-tau_ref[ilay] / mu0_safe)
        dirf[ilay] = d
        return d

    jax.lax.fori_loop(0, nlay, dir_step, dir_top)

    albedo[0] = adif_ref[:]
    src[0] = dirf[0] * adir_ref[:]

    def up_step(ilay, carry):
        alb_i, src_i = carry
        Rdir, Tdir, Rdif, Tdif = _sw_coeffs(
            tau_ref[ilay], ssa_ref[ilay], gval(ilay), mu0, eps
        )
        denom = 1.0 / (1.0 - Rdif * alb_i)
        d_above = dirf[ilay + 1]
        alb_n = Rdif + Tdif * Tdif * alb_i * denom
        src_n = Rdir * d_above + Tdif * denom * (src_i + alb_i * Tdir * d_above)
        albedo[ilay + 1] = alb_n
        src[ilay + 1] = src_n
        return alb_n, src_n

    jax.lax.fori_loop(0, nlay, up_step, (albedo[0], src[0]))

    fd_top = incdif_ref[:]
    up_acc[nlay] = jnp.sum(fd_top * albedo[nlay] + src[nlay], axis=-1)
    dn_acc[nlay] = jnp.sum(fd_top + dirf[nlay], axis=-1)

    def down_step(i, carry):
        ilay = nlay - 1 - i
        Rdir, Tdir, Rdif, Tdif = _sw_coeffs(
            tau_ref[ilay], ssa_ref[ilay], gval(ilay), mu0, eps
        )
        alb_i = albedo[ilay]
        src_i = src[ilay]
        denom = 1.0 / (1.0 - Rdif * alb_i)
        fd = (Tdif * carry + Rdif * src_i + Tdir * dirf[ilay + 1]) * denom
        up_acc[ilay] = jnp.sum(fd * alb_i + src_i, axis=-1)
        dn_acc[ilay] = jnp.sum(fd + dirf[ilay], axis=-1)
        return fd

    jax.lax.fori_loop(0, nlay, down_step, fd_top)
    up_ref[:] = up_acc[:].T
    dn_ref[:] = dn_acc[:].T
    dir_ref[:] = jnp.sum(dirf[:], axis=-1).T


def _sw_sweep_reduced_stream_kernel(
    tau_hbm, ssa_hbm, *rest,
    nlay: int, has_g: bool, block_cols: int,
):
    """Streamed SW reduced sweep for large column blocks.

    tau/ssa(/g) stay in HBM (ANY memory space) and stream through a 2-slot
    ring buffer, one layer slab per step with depth-1 prefetch — the
    auto-pipelined (nlay, B, G) operand blocks double-buffered by pallas_call
    cap B at 64 within VMEM; streaming runs B=128 (2x fewer, 2x wider grid
    steps). The two-stream coefficients are computed ONCE in the direct-beam
    pass and cached in VMEM scratch for the bottom-up and top-down passes
    (the non-streamed kernel recomputes them per pass)."""
    idx = 1 if has_g else 0
    g_hbm = rest[0] if has_g else None
    (mu0_ref, toa_ref, adir_ref, adif_ref, incdif_ref,
     up_ref, dn_ref, dir_ref,
     rdir_s, tdir_s, rdif_s, tdif_s, dirf, albedo, src,
     up_acc, dn_acc, bufs, sems) = rest[idx:]
    nstream = 3 if has_g else 2
    eps = float(jnp.finfo(jnp.float32).eps)
    mu0 = mu0_ref[:]
    mu0_safe = jnp.maximum(mu0, eps)
    cb = pl.program_id(0) * block_cols
    hbms = (tau_hbm, ssa_hbm) + ((g_hbm,) if has_g else ())

    def copies(ilay, slot):
        return [
            pltpu.make_async_copy(
                hbm.at[ilay, pl.ds(cb, block_cols)],
                bufs.at[slot, j],
                sems.at[slot, j],
            )
            for j, hbm in enumerate(hbms)
        ]

    def start(ilay, slot):
        for cp in copies(ilay, slot):
            cp.start()

    def wait(ilay, slot):
        for cp in copies(ilay, slot):
            cp.wait()

    # pass 1: direct beam TOA -> surface; coefficients computed and cached
    dir_top = toa_ref[:] * mu0
    dirf[nlay] = dir_top
    start(nlay - 1, (nlay - 1) % 2)

    def p1_step(i, carry):
        ilay = nlay - 1 - i
        slot = ilay % 2
        wait(ilay, slot)

        @pl.when(ilay >= 1)
        def _prefetch():
            start(ilay - 1, (ilay - 1) % 2)

        tau = bufs[slot, 0]
        ssa = bufs[slot, 1]
        gv = bufs[slot, 2] if has_g else 0.0
        Rdir, Tdir, Rdif, Tdif = _sw_coeffs(tau, ssa, gv, mu0, eps)
        rdir_s[ilay] = Rdir
        tdir_s[ilay] = Tdir
        rdif_s[ilay] = Rdif
        tdif_s[ilay] = Tdif
        d = carry * jnp.exp(-tau / mu0_safe)
        dirf[ilay] = d
        return d

    jax.lax.fori_loop(0, nlay, p1_step, dir_top)

    # pass 2: bottom-up albedo/src (coefficients from scratch)
    albedo[0] = adif_ref[:]
    src[0] = dirf[0] * adir_ref[:]

    def up_step(ilay, carry):
        alb_i, src_i = carry
        Rdif = rdif_s[ilay]
        Tdif = tdif_s[ilay]
        denom = 1.0 / (1.0 - Rdif * alb_i)
        d_above = dirf[ilay + 1]
        alb_n = Rdif + Tdif * Tdif * alb_i * denom
        src_n = rdir_s[ilay] * d_above + Tdif * denom * (
            src_i + alb_i * tdir_s[ilay] * d_above
        )
        albedo[ilay + 1] = alb_n
        src[ilay + 1] = src_n
        return alb_n, src_n

    jax.lax.fori_loop(0, nlay, up_step, (albedo[0], src[0]))

    # pass 3: top-down diffuse flux + spectral reduction
    fd_top = incdif_ref[:]
    up_acc[nlay] = jnp.sum(fd_top * albedo[nlay] + src[nlay], axis=-1)
    dn_acc[nlay] = jnp.sum(fd_top + dirf[nlay], axis=-1)

    def down_step(i, carry):
        ilay = nlay - 1 - i
        alb_i = albedo[ilay]
        src_i = src[ilay]
        Rdif = rdif_s[ilay]
        denom = 1.0 / (1.0 - Rdif * alb_i)
        fd = (tdif_s[ilay] * carry + Rdif * src_i + tdir_s[ilay] * dirf[ilay + 1]) * denom
        up_acc[ilay] = jnp.sum(fd * alb_i + src_i, axis=-1)
        dn_acc[ilay] = jnp.sum(fd + dirf[ilay], axis=-1)
        return fd

    jax.lax.fori_loop(0, nlay, down_step, fd_top)
    up_ref[:] = up_acc[:].T
    dn_ref[:] = dn_acc[:].T
    dir_ref[:] = jnp.sum(dirf[:], axis=-1).T


@functools.partial(jax.jit, static_argnames=("block_cols",))
def sw_2stream_pallas_reduced(
    tau: jax.Array,   # (nlay, ncol, ngpt) f32
    ssa: jax.Array,
    g: jax.Array | None,     # None => asymmetry identically 0 (clear sky)
    mu0: jax.Array,          # (ncol, ngpt)
    toa_flux: jax.Array,     # (ncol, ngpt)
    sfc_alb_direct: jax.Array,
    sfc_alb_diffuse: jax.Array,
    inc_flux_diffuse: jax.Array | None = None,
    block_cols: int = 16,
):
    """Fused SW sweep + spectral sum; returns (flux_up, flux_dn_total,
    flux_dn_dir), each (nlev, ncol) — never materializing per-g-point fluxes."""
    nlay, ncol, ngpt = tau.shape
    nlev = nlay + 1
    gp = gpt_pad(ngpt)
    cp = -ncol % block_cols

    def padg(x):
        w = [(0, 0)] * x.ndim
        w[-1] = (0, gp - x.shape[-1])
        w[-2] = (0, cp)
        return jnp.pad(x.astype(jnp.float32), w)

    inc = (
        jnp.zeros_like(mu0) if inc_flux_diffuse is None else inc_flux_diffuse
    )
    ncp = ncol + cp
    lay_spec = pl.BlockSpec((nlay, block_cols, gp), lambda c: (0, c, 0), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((block_cols, gp), lambda c: (c, 0), memory_space=pltpu.VMEM)
    # Reduced fluxes come out column-major (ncol, nlev): the lane axis must be
    # a full array dimension for Mosaic, and nlev (~61) is far below a lane
    # tile. One cheap XLA transpose restores the (nlev, ncol) convention.
    red_spec = pl.BlockSpec((block_cols, nlev), lambda c: (c, 0), memory_space=pltpu.VMEM)

    has_g = g is not None
    lay_ops = [padg(tau), padg(ssa)] + ([padg(g)] if has_g else [])
    if block_cols >= 32:
        # streamed variant: tau/ssa(/g) stay in HBM, coefficients cached
        nstream = len(lay_ops)
        out = pl.pallas_call(
            functools.partial(
                _sw_sweep_reduced_stream_kernel,
                nlay=nlay, has_g=has_g, block_cols=block_cols,
            ),
            interpret=_interpret(),
            grid=(ncp // block_cols,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nstream
            + [col_spec] * 5,
            out_specs=(red_spec, red_spec, red_spec),
            out_shape=tuple(
                jax.ShapeDtypeStruct((ncp, nlev), jnp.float32) for _ in range(3)
            ),
            scratch_shapes=[
                pltpu.VMEM((nlay, block_cols, gp), jnp.float32) for _ in range(4)
            ]
            + [pltpu.VMEM((nlev, block_cols, gp), jnp.float32) for _ in range(3)]
            + [pltpu.VMEM((nlev, block_cols), jnp.float32) for _ in range(2)]
            + [
                pltpu.VMEM((2, nstream, block_cols, gp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, nstream)),
            ],
        )(
            *lay_ops,
            padg(mu0), padg(toa_flux), padg(sfc_alb_direct), padg(sfc_alb_diffuse),
            padg(inc),
        )
        return tuple(o[:ncol].T for o in out)
    out = pl.pallas_call(
        functools.partial(_sw_sweep_reduced_kernel, nlay=nlay, has_g=has_g),
        interpret=_interpret(),
        grid=(ncp // block_cols,),
        in_specs=[lay_spec] * len(lay_ops) + [col_spec] * 5,
        out_specs=(red_spec, red_spec, red_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((ncp, nlev), jnp.float32) for _ in range(3)
        ),
        scratch_shapes=[pltpu.VMEM((nlev, block_cols, gp), jnp.float32) for _ in range(3)]
        + [pltpu.VMEM((nlev, block_cols), jnp.float32) for _ in range(2)],
    )(
        *lay_ops,
        padg(mu0), padg(toa_flux), padg(sfc_alb_direct), padg(sfc_alb_diffuse),
        padg(inc),
    )
    return tuple(o[:ncol].T for o in out)


# ---------------------------------------------------------------------------
# Longwave no-scattering sweep
# ---------------------------------------------------------------------------


def _lw_noscat_kernel(
    tau_ref, lay_ref,                 # (nlay, B, G)
    lev_ref,                          # (nlev, B, G)
    sfc_src_ref, emis_ref, inc_ref,   # (B, G)
    up_ref, dn_ref,                   # (nlev, B, G) outputs
    *, nlay: int, ds: float, w_mu: float,
):
    """LW no-scat source-function integration (ref longwave1scalar.jl:149-212).

    Identical arithmetic to ops.rte.lw_noscat.
    """
    eps = float(jnp.finfo(jnp.float32).eps)
    tau_thresh = 100.0 * eps
    i2f = float(jnp.pi) * w_mu
    f2i = 1.0 / i2f

    def srcs(ilay, lev_val):
        tau_loc = tau_ref[ilay] * ds
        trans = jnp.exp(-tau_loc)
        tau_safe = jnp.where(tau_loc > tau_thresh, tau_loc, 1.0)
        fact = jnp.where(
            tau_loc > tau_thresh,
            (1.0 - trans) / tau_safe - trans,
            tau_loc * (0.5 + tau_loc * (-1.0 / 3.0 + tau_loc * 0.125)),
        )
        return trans, (1.0 - trans) * lev_val + 2.0 * fact * (lay_ref[ilay] - lev_val)

    # downward, TOA -> surface
    i_dn_top = inc_ref[:] * f2i
    dn_ref[nlay] = i_dn_top * i2f

    def down_step(i, carry):
        ilay = nlay - 1 - i
        trans, s = srcs(ilay, lev_ref[ilay])
        i_dn = trans * carry + s
        dn_ref[ilay] = i_dn * i2f
        return i_dn

    i_dn_sfc = jax.lax.fori_loop(0, nlay, down_step, i_dn_top)

    # surface reflection + emission, then upward
    emis = emis_ref[:]
    i_up = i_dn_sfc * (1.0 - emis) + emis * sfc_src_ref[:]
    up_ref[0] = i_up * i2f

    def up_step(ilay, carry):
        trans, s = srcs(ilay, lev_ref[ilay + 1])
        i_up_n = trans * carry + s
        up_ref[ilay + 1] = i_up_n * i2f
        return i_up_n

    jax.lax.fori_loop(0, nlay, up_step, i_up)


def _lw_noscat_reduced_kernel(
    tau_ref, lay_ref,                 # (nlay, B, G)
    lev_ref,                          # (nlev, B, G)
    sfc_src_ref, emis_ref, inc_ref,   # (B, G)
    up_ref, dn_ref,                   # (B, nlev) outputs: g-point-summed fluxes
    up_acc, dn_acc,                   # scratch (nlev, B)
    *, nlay: int, ds: float, w_mu: float,
):
    """LW no-scat sweep with the spectral reduction fused in (the recurrence
    carry is the only per-g-point state)."""
    eps = float(jnp.finfo(jnp.float32).eps)
    tau_thresh = 100.0 * eps
    i2f = float(jnp.pi) * w_mu
    f2i = 1.0 / i2f

    def srcs(ilay, lev_val):
        tau_loc = tau_ref[ilay] * ds
        trans = jnp.exp(-tau_loc)
        tau_safe = jnp.where(tau_loc > tau_thresh, tau_loc, 1.0)
        fact = jnp.where(
            tau_loc > tau_thresh,
            (1.0 - trans) / tau_safe - trans,
            tau_loc * (0.5 + tau_loc * (-1.0 / 3.0 + tau_loc * 0.125)),
        )
        return trans, (1.0 - trans) * lev_val + 2.0 * fact * (lay_ref[ilay] - lev_val)

    i_dn_top = inc_ref[:] * f2i
    dn_acc[nlay] = jnp.sum(i_dn_top, axis=-1) * i2f

    def down_step(i, carry):
        ilay = nlay - 1 - i
        trans, s = srcs(ilay, lev_ref[ilay])
        i_dn = trans * carry + s
        dn_acc[ilay] = jnp.sum(i_dn, axis=-1) * i2f
        return i_dn

    i_dn_sfc = jax.lax.fori_loop(0, nlay, down_step, i_dn_top)

    emis = emis_ref[:]
    i_up = i_dn_sfc * (1.0 - emis) + emis * sfc_src_ref[:]
    up_acc[0] = jnp.sum(i_up, axis=-1) * i2f

    def up_step(ilay, carry):
        trans, s = srcs(ilay, lev_ref[ilay + 1])
        i_up_n = trans * carry + s
        up_acc[ilay + 1] = jnp.sum(i_up_n, axis=-1) * i2f
        return i_up_n

    jax.lax.fori_loop(0, nlay, up_step, i_up)
    up_ref[:] = up_acc[:].T
    dn_ref[:] = dn_acc[:].T


@functools.partial(jax.jit, static_argnames=("ds", "w_mu", "block_cols"))
def lw_noscat_pallas_reduced(
    tau: jax.Array,         # (nlay, ncol, ngpt)
    lay_source: jax.Array,
    lev_source: jax.Array,  # (nlev, ncol, ngpt)
    sfc_source: jax.Array,  # (ncol, ngpt)
    sfc_emis: jax.Array,
    ds: float,
    w_mu: float,
    inc_flux: jax.Array | None = None,
    block_cols: int = 16,
):
    """Fused LW no-scat sweep + spectral sum; returns (flux_up, flux_dn),
    each (nlev, ncol)."""
    nlay, ncol, ngpt = tau.shape
    nlev = nlay + 1
    gp = gpt_pad(ngpt)
    cp = -ncol % block_cols

    def padg(x):
        w = [(0, 0)] * x.ndim
        w[-1] = (0, gp - x.shape[-1])
        w[-2] = (0, cp)
        return jnp.pad(x.astype(jnp.float32), w)

    inc = jnp.zeros_like(sfc_source) if inc_flux is None else inc_flux
    ncp = ncol + cp
    lay_spec = pl.BlockSpec((nlay, block_cols, gp), lambda c: (0, c, 0), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((block_cols, gp), lambda c: (c, 0), memory_space=pltpu.VMEM)
    lev_spec = pl.BlockSpec((nlev, block_cols, gp), lambda c: (0, c, 0), memory_space=pltpu.VMEM)
    # (ncol, nlev) out layout: see sw_2stream_pallas_reduced.
    red_spec = pl.BlockSpec((block_cols, nlev), lambda c: (c, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_lw_noscat_reduced_kernel, nlay=nlay, ds=ds, w_mu=w_mu),
        interpret=_interpret(),
        grid=(ncp // block_cols,),
        in_specs=[lay_spec, lay_spec, lev_spec] + [col_spec] * 3,
        out_specs=(red_spec, red_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((ncp, nlev), jnp.float32) for _ in range(2)
        ),
        scratch_shapes=[pltpu.VMEM((nlev, block_cols), jnp.float32) for _ in range(2)],
    )(padg(tau), padg(lay_source), padg(lev_source), padg(sfc_source), padg(sfc_emis), padg(inc))
    return tuple(o[:ncol].T for o in out)


def _lw_2stream_reduced_kernel(
    tau_hbm, ssa_hbm, g_hbm, lev_hbm,          # ANY: (nlay|nlev, ncp, G)
    sfc_src_ref, emis_ref, inc_ref,            # (B, G)
    up_ref, dn_ref,                            # (B, nlev) outputs (reduced)
    rdif_s, tdif_s, srcdn_s,                   # scratch (nlay, B, G)
    albedo, src,                               # scratch (nlev, B, G)
    up_acc, dn_acc,                            # scratch (nlev, B)
    bufs, lev0_buf, sems, lev0_sem,            # stream ring + lev[0] buffer
    *, nlay: int, block_cols: int,
):
    """LW two-stream adding/doubling with in-kernel spectral reduction.

    Same math as ops.rte.lw_2stream (Meador-Weaver Rdif/Tdif + Toon linear-
    in-tau sources, Shonk-Hogan adding; ref longwave2stream.jl:110-253).
    Structure mirrors _sw_sweep_reduced_stream_kernel: tau/ssa/g/lev_source
    stream through a 2-slot ring (the four (nlay, B, G) operand blocks would
    blow VMEM at useful block sizes), coefficients are computed once in the
    bottom-up pass and cached for the top-down flux pass. The bottom-up pass
    consumes lev_source[ilay] (carried) and lev_source[ilay+1] (streamed,
    offset +1 from the tau/ssa/g slabs).
    """
    eps = float(jnp.finfo(jnp.float32).eps)
    k_min = eps ** 0.5
    tau_thresh = 100.0 * eps
    lw_diff_sec = 1.66
    pi = float(jnp.pi)
    cb = pl.program_id(0) * block_cols
    hbms = (tau_hbm, ssa_hbm, g_hbm)

    def copies(step, slot):
        cps = [
            pltpu.make_async_copy(
                hbm.at[step, pl.ds(cb, block_cols)],
                bufs.at[slot, j],
                sems.at[slot, j],
            )
            for j, hbm in enumerate(hbms)
        ]
        cps.append(
            pltpu.make_async_copy(
                lev_hbm.at[step + 1, pl.ds(cb, block_cols)],
                bufs.at[slot, 3],
                sems.at[slot, 3],
            )
        )
        return cps

    def start(step, slot):
        for cp in copies(step, slot):
            cp.start()

    def wait(step, slot):
        for cp in copies(step, slot):
            cp.wait()

    # prologue: lev_source[0] (surface level) + first slab set
    cp0 = pltpu.make_async_copy(
        lev_hbm.at[0, pl.ds(cb, block_cols)], lev0_buf, lev0_sem
    )
    cp0.start()
    cp0.wait()
    start(0, 0)

    emis = emis_ref[:]
    albedo[0] = 1.0 - emis
    src[0] = pi * emis * sfc_src_ref[:]

    def up_step(ilay, carry):
        alb_i, src_i, lev_bot = carry
        slot = ilay % 2
        wait(ilay, slot)

        @pl.when(ilay + 1 < nlay)
        def _prefetch():
            start(ilay + 1, (ilay + 1) % 2)

        tau = bufs[slot, 0]
        ssa = bufs[slot, 1]
        g = bufs[slot, 2]
        lev_top = bufs[slot, 3]

        gamma1 = lw_diff_sec * (1.0 - 0.5 * ssa * (1.0 + g))
        gamma2 = lw_diff_sec * 0.5 * ssa * (1.0 - g)
        k = jnp.sqrt(jnp.maximum((gamma1 + gamma2) * (gamma1 - gamma2), k_min))
        ektau = jnp.exp(-tau * k)
        coeff = ektau * ektau
        rt = 1.0 / (k * (1.0 + coeff) + gamma1 * (1.0 - coeff))
        Rdif = rt * gamma2 * (1.0 - coeff)
        Tdif = rt * 2.0 * k * ektau
        big = tau > tau_thresh
        tau_safe = jnp.where(big, tau, 1.0)
        Z = (lev_bot - lev_top) / (tau_safe * (gamma1 + gamma2))
        src_up = jnp.where(
            big, pi * (Z + lev_top - Rdif * (lev_top - Z) - Tdif * (Z + lev_bot)), 0.0
        )
        src_dn = jnp.where(
            big, pi * (lev_bot - Z - Rdif * (Z + lev_bot) - Tdif * (lev_top - Z)), 0.0
        )
        rdif_s[ilay] = Rdif
        tdif_s[ilay] = Tdif
        srcdn_s[ilay] = src_dn

        denom = 1.0 / (1.0 - Rdif * alb_i)
        alb_n = Rdif + Tdif * Tdif * alb_i * denom
        src_n = src_up + Tdif * denom * (src_i + alb_i * src_dn)
        albedo[ilay + 1] = alb_n
        src[ilay + 1] = src_n
        return alb_n, src_n, lev_top

    jax.lax.fori_loop(0, nlay, up_step, (albedo[0], src[0], lev0_buf[:]))

    # top-down diffuse flux + spectral reduction
    fd_top = inc_ref[:]
    up_acc[nlay] = jnp.sum(fd_top * albedo[nlay] + src[nlay], axis=-1)
    dn_acc[nlay] = jnp.sum(fd_top, axis=-1)

    def down_step(i, carry):
        ilay = nlay - 1 - i
        alb_i = albedo[ilay]
        src_i = src[ilay]
        Rdif = rdif_s[ilay]
        denom = 1.0 / (1.0 - Rdif * alb_i)
        fd = (tdif_s[ilay] * carry + Rdif * src_i + srcdn_s[ilay]) * denom
        up_acc[ilay] = jnp.sum(fd * alb_i + src_i, axis=-1)
        dn_acc[ilay] = jnp.sum(fd, axis=-1)
        return fd

    jax.lax.fori_loop(0, nlay, down_step, fd_top)
    up_ref[:] = up_acc[:].T
    dn_ref[:] = dn_acc[:].T


@functools.partial(jax.jit, static_argnames=("block_cols",))
def lw_2stream_pallas_reduced(
    tau: jax.Array,          # (nlay, ncol, ngpt)
    ssa: jax.Array,
    g: jax.Array,
    lev_source: jax.Array,   # (nlev, ncol, ngpt)
    sfc_source: jax.Array,   # (ncol, ngpt)
    sfc_emis: jax.Array,     # (ncol, ngpt)
    inc_flux: jax.Array | None = None,
    block_cols: int = 128,
):
    """Fused LW two-stream sweep + spectral sum; returns (flux_up, flux_dn),
    each (nlev, ncol). Needs utils.compile.tpu_compiler_options() on the
    enclosing jit at block_cols >= 64 (VMEM scratches)."""
    nlay, ncol, ngpt = tau.shape
    nlev = nlay + 1
    gp = gpt_pad(ngpt)
    cp = -ncol % block_cols

    def padg(x):
        w = [(0, 0)] * x.ndim
        w[-1] = (0, gp - x.shape[-1])
        w[-2] = (0, cp)
        return jnp.pad(x.astype(jnp.float32), w)

    inc = jnp.zeros_like(sfc_source) if inc_flux is None else inc_flux
    ncp = ncol + cp
    col_spec = pl.BlockSpec((block_cols, gp), lambda c: (c, 0), memory_space=pltpu.VMEM)
    red_spec = pl.BlockSpec((block_cols, nlev), lambda c: (c, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _lw_2stream_reduced_kernel, nlay=nlay, block_cols=block_cols
        ),
        interpret=_interpret(),
        grid=(ncp // block_cols,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4 + [col_spec] * 3,
        out_specs=(red_spec, red_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((ncp, nlev), jnp.float32) for _ in range(2)
        ),
        scratch_shapes=[
            pltpu.VMEM((nlay, block_cols, gp), jnp.float32) for _ in range(3)
        ]
        + [pltpu.VMEM((nlev, block_cols, gp), jnp.float32) for _ in range(2)]
        + [pltpu.VMEM((nlev, block_cols), jnp.float32) for _ in range(2)]
        + [
            pltpu.VMEM((2, 4, block_cols, gp), jnp.float32),
            pltpu.VMEM((block_cols, gp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(
        padg(tau), padg(ssa), padg(g), padg(lev_source),
        padg(sfc_source), padg(sfc_emis), padg(inc),
    )
    return tuple(o[:ncol].T for o in out)


def _lw_noscat_banded_kernel(
    tau_ref, pfrac_ref,               # (nlay, B, G)
    plk_lay_ref,                      # (nlay, B, NBP)
    plk_lev_ref,                      # (nlev, B, NBP)
    plk_sfc_ref, emis_ref,            # (B, NBP)
    inc_ref,                          # (B, G)
    m2_ref,                           # (2*NBP, G) 0/1 band matrix [M; M]
    up_ref, dn_ref,                   # (B, nlev) outputs: g-point-summed fluxes
    up_acc, dn_acc,                   # scratch (nlev, B)
    *, nlay: int, ds: float, w_mu: float,
):
    """LW no-scat sweep with Planck-source construction fused in.

    The Planck sources (lay/lev/sfc, ref Optics.jl:228-248) are products of a
    per-BAND emission value and the per-g-point Planck fraction; materializing
    them in HBM costs three (nlay, ncol, ngpt) tensors of traffic. Here only
    pfrac (one such tensor) and the tiny band arrays enter. Sources are built
    PER STEP in registers: band->g-point expansion rides the MXU (hi/lo-split
    value against the exact 0/1 band matrix — the lane-broadcast expansion
    and the (nlay, B, G) source scratches of the previous version were the
    kernel's VPU/VMEM bottleneck: 2x slower and capped at 16-column blocks).
    Level value = geometric mean sqrt(pfrac_below * pfrac_above), boundary
    levels clamp the neighbor index (sqrt(pf*pf) = pf reproduces the
    reference's edge handling, ref Optics.jl:236-246).
    """
    eps = float(jnp.finfo(jnp.float32).eps)
    tau_thresh = 100.0 * eps
    i2f = float(jnp.pi) * w_mu
    f2i = 1.0 / i2f
    m2 = m2_ref[:]

    def expand(v):
        v_hi, v_lo = _split_hi_lo(v)
        return jnp.dot(
            jnp.concatenate([v_hi, v_lo], axis=1), m2,
            preferred_element_type=jnp.float32,
        )

    def srcs(ilay, ilev, jnbr):
        pf = pfrac_ref[ilay]
        lev_val = expand(plk_lev_ref[ilev]) * jnp.sqrt(pf * pfrac_ref[jnbr])
        lay_val = expand(plk_lay_ref[ilay]) * pf
        tau_loc = tau_ref[ilay] * ds
        trans = jnp.exp(-tau_loc)
        tau_safe = jnp.where(tau_loc > tau_thresh, tau_loc, 1.0)
        fact = jnp.where(
            tau_loc > tau_thresh,
            (1.0 - trans) / tau_safe - trans,
            tau_loc * (0.5 + tau_loc * (-1.0 / 3.0 + tau_loc * 0.125)),
        )
        return trans, (1.0 - trans) * lev_val + 2.0 * fact * (lay_val - lev_val)

    # downward, TOA -> surface
    i_dn_top = inc_ref[:] * f2i
    dn_acc[nlay] = jnp.sum(i_dn_top, axis=-1) * i2f

    def down_step(i, carry):
        ilay = nlay - 1 - i
        trans, s = srcs(ilay, ilay, jnp.maximum(ilay - 1, 0))
        i_dn = trans * carry + s
        dn_acc[ilay] = jnp.sum(i_dn, axis=-1) * i2f
        return i_dn

    i_dn_sfc = jax.lax.fori_loop(0, nlay, down_step, i_dn_top)

    emis = expand(emis_ref[:])
    sfc_src = expand(plk_sfc_ref[:]) * pfrac_ref[0]
    i_up = i_dn_sfc * (1.0 - emis) + emis * sfc_src
    up_acc[0] = jnp.sum(i_up, axis=-1) * i2f

    def up_step(ilay, carry):
        trans, s = srcs(ilay, ilay + 1, jnp.minimum(ilay + 1, nlay - 1))
        i_up_n = trans * carry + s
        up_acc[ilay + 1] = jnp.sum(i_up_n, axis=-1) * i2f
        return i_up_n

    jax.lax.fori_loop(0, nlay, up_step, i_up)
    up_ref[:] = up_acc[:].T
    dn_ref[:] = dn_acc[:].T


@functools.partial(
    jax.jit, static_argnames=("ds", "w_mu", "bnd_lims_gpt", "block_cols")
)
def lw_noscat_banded_reduced(
    tau: jax.Array,         # (nlay, ncol, ngpt)
    pfrac: jax.Array,       # (nlay, ncol, ngpt)
    plk_lay: jax.Array,     # (nlay, ncol, nbp) band Planck at t_lay
    plk_lev: jax.Array,     # (nlev, ncol, nbp) band Planck at t_lev
    plk_sfc: jax.Array,     # (ncol, nbp) band Planck at t_sfc
    sfc_emis: jax.Array,    # (ncol, nbnd) per-band emissivity
    ds: float,
    w_mu: float,
    bnd_lims_gpt: tuple,
    inc_flux: jax.Array | None = None,
    block_cols: int = 16,
):
    """Fused LW no-scat sweep with in-kernel Planck sources + spectral sum;
    returns (flux_up, flux_dn), each (nlev, ncol).

    block_cols > 16 needs a raised scoped-VMEM limit (the tau/pfrac blocks
    are (nlay, B, G) f32) — pass utils.compile.tpu_compiler_options() to the
    enclosing jit; 128 measured ~2.5x faster than 16 at 8k columns."""
    nlay, ncol, ngpt = tau.shape
    nlev = nlay + 1
    gp = gpt_pad(ngpt)
    nbp = gpt_pad(plk_lay.shape[-1])
    cp = -ncol % block_cols

    def padto(x, lanes):
        w = [(0, 0)] * x.ndim
        w[-1] = (0, lanes - x.shape[-1])
        w[-2] = (0, cp)
        return jnp.pad(x.astype(jnp.float32), w)

    m_np = np.zeros((nbp, gp), np.float32)
    for i, (g0, g1) in enumerate(bnd_lims_gpt):
        m_np[i, g0:g1] = 1.0
    m2 = jnp.asarray(np.concatenate([m_np, m_np], axis=0), jnp.bfloat16)

    inc = (
        jnp.zeros((ncol, ngpt), jnp.float32) if inc_flux is None else inc_flux
    )
    ncp = ncol + cp
    lay_spec = pl.BlockSpec((nlay, block_cols, gp), lambda c: (0, c, 0), memory_space=pltpu.VMEM)
    layb_spec = pl.BlockSpec((nlay, block_cols, nbp), lambda c: (0, c, 0), memory_space=pltpu.VMEM)
    levb_spec = pl.BlockSpec((nlev, block_cols, nbp), lambda c: (0, c, 0), memory_space=pltpu.VMEM)
    colb_spec = pl.BlockSpec((block_cols, nbp), lambda c: (c, 0), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((block_cols, gp), lambda c: (c, 0), memory_space=pltpu.VMEM)
    red_spec = pl.BlockSpec((block_cols, nlev), lambda c: (c, 0), memory_space=pltpu.VMEM)

    full_spec = pl.BlockSpec(m2.shape, lambda c: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_lw_noscat_banded_kernel, nlay=nlay, ds=ds, w_mu=w_mu),
        interpret=_interpret(),
        grid=(ncp // block_cols,),
        in_specs=[
            lay_spec, lay_spec, layb_spec, levb_spec, colb_spec, colb_spec,
            col_spec, full_spec,
        ],
        out_specs=(red_spec, red_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((ncp, nlev), jnp.float32) for _ in range(2)
        ),
        scratch_shapes=[
            pltpu.VMEM((nlev, block_cols), jnp.float32),
            pltpu.VMEM((nlev, block_cols), jnp.float32),
        ],
    )(
        padto(tau, gp), padto(pfrac, gp),
        padto(plk_lay, nbp), padto(plk_lev, nbp), padto(plk_sfc, nbp),
        padto(sfc_emis, nbp), padto(inc, gp), m2,
    )
    return tuple(o[:ncol].T for o in out)


@functools.partial(jax.jit, static_argnames=("ds", "w_mu", "block_cols"))
def lw_noscat_pallas(
    tau: jax.Array,         # (nlay, ncol, ngpt)
    lay_source: jax.Array,
    lev_source: jax.Array,  # (nlev, ncol, ngpt)
    sfc_source: jax.Array,  # (ncol, ngpt)
    sfc_emis: jax.Array,
    ds: float,
    w_mu: float,
    inc_flux: jax.Array | None = None,
    block_cols: int = 16,
):
    """Fused LW no-scat sweep; returns (flux_up, flux_dn)."""
    nlay, ncol, ngpt = tau.shape
    nlev = nlay + 1
    gp = gpt_pad(ngpt)
    assert ncol % block_cols == 0, (ncol, block_cols)

    def padg(x):
        if x.shape[-1] == gp:
            return x.astype(jnp.float32)
        w = [(0, 0)] * x.ndim
        w[-1] = (0, gp - ngpt)
        return jnp.pad(x.astype(jnp.float32), w)

    inc = jnp.zeros_like(sfc_source) if inc_flux is None else inc_flux
    lay_spec = pl.BlockSpec((nlay, block_cols, gp), lambda c: (0, c, 0), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((block_cols, gp), lambda c: (c, 0), memory_space=pltpu.VMEM)
    lev_spec = pl.BlockSpec((nlev, block_cols, gp), lambda c: (0, c, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_lw_noscat_kernel, nlay=nlay, ds=ds, w_mu=w_mu),
        interpret=_interpret(),
        grid=(ncol // block_cols,),
        in_specs=[lay_spec, lay_spec, lev_spec] + [col_spec] * 3,
        out_specs=(lev_spec, lev_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nlev, ncol, gp), jnp.float32) for _ in range(2)
        ),
    )(padg(tau), padg(lay_source), padg(lev_source), padg(sfc_source), padg(sfc_emis), padg(inc))
    return tuple(o[..., :ngpt] for o in out)
