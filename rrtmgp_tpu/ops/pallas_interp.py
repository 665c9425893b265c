"""Pallas TPU kernels: fused k-distribution table interpolation.

The hot op of RRTMGP gas optics is the trilinear (press, temp, eta)
interpolation into the kmajor / planck-fraction / rayleigh / kminor tables
(ref /root/reference/src/optics/optics_utils.jl:80-149). TPUs have no fast
pointwise gather; the TPU-native formulation is one-hot contraction on the
MXU, fully fused in VMEM:

  per block of (layer, column) rows:
    W[b, q]  = 2-hot (press-slab, temp) weights            (VPU, iota compare)
    R        = W @ K2                                      (MXU, bf16 hi/lo x3)
    out     += sum_e (R e-chunk) * (band eta weights @ M)  (VPU + tiny MXU)

Numerics: f32 operands are split into bf16 hi + lo parts; three bf16 MXU
passes (hi*hi + hi*lo + lo*hi) give f32-equivalent accuracy (~1e-7 rel)
without the VMEM blow-up of XLA's HIGHEST-precision expansion.

Two variants:
- ``interp_pt_eta``: full-width contraction over all (press, temp) rows.
- ``interp_pt_eta_windowed``: exploits vertical coherence — for one LAYER,
  all columns' (press, temp) rows live in a narrow window (pressure varies
  little across columns at fixed layer), so each grid step DMAs only a
  WINDOW-row slab of the table (scalar-prefetched per-layer base row) and
  contracts against it: ~13x fewer MXU FLOPs at real sizes. The caller must
  verify the window invariant (see ``window_bases``) and fall back to the
  full kernel otherwise.

K2 is the table flattened to (npress+1 * ntemp, neta * ngpt) with E-MAJOR
row content so the eta reduction is 9 contiguous lane chunks; M is the static
0/1 band->gpt expansion matrix.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_hi_lo(x32):
    hi = x32.astype(jnp.bfloat16)
    lo = (x32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_f32(a32, k_hi, k_lo):
    """f32-accurate A @ K via 3 bf16 MXU passes (drop lo*lo)."""
    a_hi, a_lo = _split_hi_lo(a32)
    d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    return d(a_hi, k_hi) + d(a_hi, k_lo) + d(a_lo, k_hi)


def _interp_body(q, fp_ref, ft_ref, je_refs, fe_refs, cm_refs, m_hi, k_hi, k_lo,
                 out_ref, *, n_temp, n_eta, n_gpt_pad):
    """Shared body: build W, contract, eta-reduce. ``q`` is the (B, 1)
    window-local row index; k_hi/k_lo are the (rows, neta*ngpt) bf16 parts."""
    b = q.shape[0]
    nq = k_hi.shape[0]
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (b, nq), 1)

    acc = jnp.zeros((b, n_gpt_pad), jnp.float32)
    for half in (0, 1):
        qh = q + half
        fp = fp_ref[:]
        w = jnp.where(iota_q == qh, 1.0 - fp, 0.0) + jnp.where(
            iota_q == (qh + n_temp), fp, 0.0
        )
        r = _dot_f32(w, k_hi, k_lo)  # (B, neta*ngpt)

        je = je_refs[half][:]
        fe = fe_refs[half][:]
        cm = cm_refs[half][:]
        ft = ft_ref[:]
        wt = ft if half else (1.0 - ft)

        half_acc = jnp.zeros((b, n_gpt_pad), jnp.float32)
        for e in range(n_eta):
            w_band = (
                jnp.where(je == e, 1.0 - fe, 0.0) + jnp.where(je + 1 == e, fe, 0.0)
            ) * cm  # (B, nbnd) f32
            # band->gpt expansion: M is 0/1 (exact in bf16); split w_band
            wb_hi, wb_lo = _split_hi_lo(w_band)
            w_gpt = jnp.dot(wb_hi, m_hi, preferred_element_type=jnp.float32) + jnp.dot(
                wb_lo, m_hi, preferred_element_type=jnp.float32
            )
            half_acc = half_acc + r[:, e * n_gpt_pad : (e + 1) * n_gpt_pad] * w_gpt
        acc = acc + wt * half_acc
    out_ref[:] = acc


def _full_kernel(q_ref, fp_ref, ft_ref, je1_ref, fe1_ref, je2_ref, fe2_ref,
                 cm1_ref, cm2_ref, khi_ref, klo_ref, m_ref, out_ref,
                 *, n_temp, n_eta, n_gpt_pad):
    _interp_body(
        q_ref[:], fp_ref, ft_ref, (je1_ref, je2_ref), (fe1_ref, fe2_ref),
        (cm1_ref, cm2_ref), m_ref[:], khi_ref[:], klo_ref[:], out_ref,
        n_temp=n_temp, n_eta=n_eta, n_gpt_pad=n_gpt_pad,
    )


def _windowed_kernel(q_base_ref, q_ref, fp_ref, ft_ref, je1_ref, fe1_ref,
                     je2_ref, fe2_ref, cm1_ref, cm2_ref, khi_hbm, klo_hbm,
                     m_ref, out_ref, khi_buf, klo_buf, sem,
                     *, n_temp, n_eta, n_gpt_pad, window):
    il = pl.program_id(0)
    base = pl.multiple_of(q_base_ref[il], 16)  # window_bases aligns to 16
    cp_hi = pltpu.make_async_copy(khi_hbm.at[pl.ds(base, window)], khi_buf, sem.at[0])
    cp_lo = pltpu.make_async_copy(klo_hbm.at[pl.ds(base, window)], klo_buf, sem.at[1])
    cp_hi.start()
    cp_lo.start()
    cp_hi.wait()
    cp_lo.wait()
    _interp_body(
        q_ref[:] - base, fp_ref, ft_ref, (je1_ref, je2_ref), (fe1_ref, fe2_ref),
        (cm1_ref, cm2_ref), m_ref[:], khi_buf[:], klo_buf[:], out_ref,
        n_temp=n_temp, n_eta=n_eta, n_gpt_pad=n_gpt_pad,
    )


def gpt_pad(n_gpt: int) -> int:
    """Pad the per-eta g-point chunk to a lane-tile multiple (128)."""
    return -(-n_gpt // 128) * 128


def _band_matrix(bnd_lims_gpt, n_gpt):
    nbnd = len(bnd_lims_gpt)
    m_np = np.zeros((nbnd, gpt_pad(n_gpt)), np.float32)
    for i, (g0, g1) in enumerate(bnd_lims_gpt):
        m_np[i, g0:g1] = 1.0
    return jnp.asarray(m_np, jnp.bfloat16)  # 0/1 entries exact in bf16


@functools.partial(
    jax.jit,
    static_argnames=("n_temp", "n_eta", "n_gpt", "bnd_lims_gpt", "block_rows"),
)
def interp_pt_eta(
    k2_hi: jax.Array,   # (npress+1 * ntemp, neta * ngpt) bf16 hi part
    k2_lo: jax.Array,   # bf16 lo part
    q0: jax.Array,      # (rows,) int32 combined (press_slab * ntemp + jtemp)
    fp: jax.Array,      # (rows,)
    ft: jax.Array,      # (rows,)
    je1: jax.Array,     # (rows, nbnd) int32
    fe1: jax.Array,
    je2: jax.Array,
    fe2: jax.Array,
    cm1: jax.Array,     # (rows, nbnd); pass ones for tables without col_mix
    cm2: jax.Array,
    *,
    n_temp: int,
    n_eta: int,
    n_gpt: int,
    bnd_lims_gpt: tuple,
    block_rows: int = 256,
) -> jax.Array:
    """Full-width fused interp3d over all rows; returns (rows, ngpt) f32."""
    rows = q0.shape[0]
    nbnd = len(bnd_lims_gpt)
    assert rows % block_rows == 0, (rows, block_rows)
    m = _band_matrix(bnd_lims_gpt, n_gpt)
    col = lambda x: x.reshape(rows, 1)

    row_spec = lambda width: pl.BlockSpec(
        (block_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    npad = gpt_pad(n_gpt)
    kernel = functools.partial(_full_kernel, n_temp=n_temp, n_eta=n_eta, n_gpt_pad=npad)
    out = pl.pallas_call(
        kernel,
        grid=(rows // block_rows,),
        in_specs=[
            row_spec(1), row_spec(1), row_spec(1),
            row_spec(nbnd), row_spec(nbnd), row_spec(nbnd), row_spec(nbnd),
            row_spec(nbnd), row_spec(nbnd),
            full(k2_hi), full(k2_lo), full(m),
        ],
        out_specs=row_spec(npad),
        out_shape=jax.ShapeDtypeStruct((rows, npad), jnp.float32),
    )(col(q0), col(fp), col(ft), je1, fe1, je2, fe2, cm1, cm2, k2_hi, k2_lo, m)
    return out[:, :n_gpt]


@functools.partial(
    jax.jit,
    static_argnames=("n_temp", "n_eta", "n_gpt", "bnd_lims_gpt", "window", "block_cols"),
)
def interp_pt_eta_windowed(
    k2_hi: jax.Array,    # (npress+1 * ntemp, neta * ngpt) bf16
    k2_lo: jax.Array,
    q_base: jax.Array,   # (nlay,) int32 per-layer window base row
    q0: jax.Array,       # (nlay * ncol,) int32, LAYER-MAJOR rows
    fp: jax.Array,
    ft: jax.Array,
    je1: jax.Array,      # (nlay * ncol, nbnd)
    fe1: jax.Array,
    je2: jax.Array,
    fe2: jax.Array,
    cm1: jax.Array,
    cm2: jax.Array,
    *,
    n_temp: int,
    n_eta: int,
    n_gpt: int,
    bnd_lims_gpt: tuple,
    window: int = 96,
    block_cols: int = 256,
) -> jax.Array:
    """Windowed fused interp3d: per layer, only ``window`` table rows
    (starting at the scalar-prefetched q_base[layer]) are DMAed and
    contracted. Caller must guarantee q0[l, :] in [q_base[l],
    q_base[l] + window - n_temp - 1]; see ``window_bases``."""
    nlay = q_base.shape[0]
    rows = q0.shape[0]
    ncol = rows // nlay
    nbnd = len(bnd_lims_gpt)
    assert ncol % block_cols == 0, (ncol, block_cols)
    nblk = ncol // block_cols
    m = _band_matrix(bnd_lims_gpt, n_gpt)
    col = lambda x: x.reshape(rows, 1)

    # flattened rows are layer-major: block index for (layer l, col block c)
    row_idx = lambda l, c: (l * nblk + c, 0)
    row_spec = lambda width: pl.BlockSpec(
        (block_cols, width), lambda l, c, *_: row_idx(l, c), memory_space=pltpu.VMEM
    )

    npad = gpt_pad(n_gpt)
    kernel = functools.partial(
        _windowed_kernel, n_temp=n_temp, n_eta=n_eta, n_gpt_pad=npad, window=window
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nlay, nblk),
        in_specs=[
            row_spec(1), row_spec(1), row_spec(1),
            row_spec(nbnd), row_spec(nbnd), row_spec(nbnd), row_spec(nbnd),
            row_spec(nbnd), row_spec(nbnd),
            pl.BlockSpec(memory_space=pltpu.ANY),  # k2_hi stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # k2_lo
            pl.BlockSpec(m.shape, lambda l, c, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_cols, npad), lambda l, c, *_: row_idx(l, c), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((window, k2_hi.shape[1]), jnp.bfloat16),
            pltpu.VMEM((window, k2_hi.shape[1]), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, npad), jnp.float32),
    )(q_base, col(q0), col(fp), col(ft), je1, fe1, je2, fe2, cm1, cm2, k2_hi, k2_lo, m)
    return out[:, :n_gpt]


def _minor_group_kernel(jt_ref, ft_ref, scal_ref, je1_ref, fe1_ref, je2_ref,
                        fe2_ref, khi_ref, klo_ref, out_ref,
                        *, ntp, n_eta, n_gpt_pad, n_i):
    """Grouped minor-gas contraction: intervals sharing one g-point range.

    All intervals share the same (temp, eta) interpolation data; the W matrix
    carries each interval's scaling in its 1-hot rows, so ONE MXU contraction
    sums Sum_i scaling_i * interp_t(kminor_i) — the reference's per-interval
    accumulation loop (gas_optics.jl:283-303) as a single matmul.
    """
    b = jt_ref.shape[0]
    jt = jt_ref[:]       # (B, 1)
    ft = ft_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, ntp), 1)

    acc = jnp.zeros((b, n_gpt_pad), jnp.float32)
    for half in (0, 1):
        blocks = []
        for i in range(n_i):
            blocks.append(jnp.where(iota == jt + half, scal_ref[:, i : i + 1], 0.0))
        w = jnp.concatenate(blocks, axis=1)  # (B, n_i*ntp)
        r = _dot_f32(w, khi_ref[:], klo_ref[:])  # (B, neta*ngp)

        je = (je1_ref if half == 0 else je2_ref)[:]
        fe = (fe1_ref if half == 0 else fe2_ref)[:]
        wt = ft if half else (1.0 - ft)
        half_acc = jnp.zeros((b, n_gpt_pad), jnp.float32)
        for e in range(n_eta):
            w_e = jnp.where(je == e, 1.0 - fe, 0.0) + jnp.where(je + 1 == e, fe, 0.0)
            half_acc = half_acc + r[:, e * n_gpt_pad : (e + 1) * n_gpt_pad] * w_e
        acc = acc + wt * half_acc
    out_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("ntp", "n_eta", "n_gpt", "n_i", "block_rows")
)
def interp_minor_group(
    k2_hi: jax.Array,   # (n_i * ntp, neta * gpt_pad(n_gpt)) bf16, stacked intervals
    k2_lo: jax.Array,
    jt: jax.Array,      # (rows,) int32 temperature row
    ft: jax.Array,      # (rows,)
    scal: jax.Array,    # (rows, n_i) per-interval scaling (x tropo mask)
    je1: jax.Array,     # (rows,) int32 — the group's band eta indices
    fe1: jax.Array,
    je2: jax.Array,
    fe2: jax.Array,
    *,
    ntp: int,
    n_eta: int,
    n_gpt: int,
    n_i: int,
    block_rows: int = 256,
) -> jax.Array:
    """Minor-gas tau for one interval group; returns (rows, n_gpt) f32."""
    rows = jt.shape[0]
    assert rows % block_rows == 0
    npad = gpt_pad(n_gpt)
    col = lambda x: x.reshape(rows, 1)
    row_spec = lambda width: pl.BlockSpec(
        (block_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _minor_group_kernel, ntp=ntp, n_eta=n_eta, n_gpt_pad=npad, n_i=n_i
    )
    out = pl.pallas_call(
        kernel,
        grid=(rows // block_rows,),
        in_specs=[
            row_spec(1), row_spec(1), row_spec(n_i),
            row_spec(1), row_spec(1), row_spec(1), row_spec(1),
            full(k2_hi), full(k2_lo),
        ],
        out_specs=row_spec(npad),
        out_shape=jax.ShapeDtypeStruct((rows, npad), jnp.float32),
    )(col(jt), col(ft), scal, col(je1), col(fe1), col(je2), col(fe2), k2_hi, k2_lo)
    return out[:, :n_gpt]


def window_bases(q: jax.Array, n_temp: int, n_rows: int, window: int):
    """Per-layer window base + validity for the windowed kernel.

    q: (nlay, ncol) combined row indices. Returns (q_base (nlay,) int32,
    ok scalar bool). A layer's rows span [q_min, q_max + n_temp + 1]; bases
    are aligned DOWN to 16 rows (Mosaic DMA tiling) and clamped so the
    window stays inside the table; validity requires the aligned window to
    cover every layer's span.
    """
    q_min = jnp.min(q, axis=1)
    q_max = jnp.max(q, axis=1)
    base = (q_min // 16) * 16
    max_base = (max(n_rows - window, 0) // 16) * 16  # keep 16-aligned after clamp
    base = jnp.clip(base, 0, max_base).astype(jnp.int32)
    ok = jnp.all(q_max + n_temp + 2 - base <= window)
    return base, ok


def split_table_emajor(table) -> tuple[jax.Array, jax.Array]:
    """(ngpt, npress+1, ntemp, neta) table -> e-major 2D bf16 (hi, lo) parts.

    Rows are zero-padded to a multiple of 16 so windowed-kernel DMA bases
    stay tile-aligned after clamping.
    """
    ngpt, npp, nt, neta = table.shape
    npad = gpt_pad(ngpt)
    arr = jnp.asarray(table, jnp.float32)
    k4 = jnp.transpose(arr, (1, 2, 3, 0))  # (npp, nt, neta, ngpt)
    if npad != ngpt:
        k4 = jnp.pad(k4, ((0, 0), (0, 0), (0, 0), (0, npad - ngpt)))
    k2 = k4.reshape(npp * nt, neta * npad)
    pad = (-k2.shape[0]) % 16
    if pad:
        k2 = jnp.concatenate([k2, jnp.zeros((pad, k2.shape[1]), k2.dtype)], axis=0)
    return _split_hi_lo(k2)
