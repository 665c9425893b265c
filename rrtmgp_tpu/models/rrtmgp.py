"""Full-physics RRTMGP radiation solvers (clear-sky / cloudy / all-sky).

The TPU-native counterpart of the reference's solver dispatch + outer loops
(/root/reference/src/rte/RTESolver.jl and rte_*_solve! drivers in
/root/reference/src/rte/*.jl). Control flow is restructured:

- The reference loops g-points serially (bounding memory with one temp flux
  buffer) and columns in parallel. Here ALL g-points solve in one batched
  program: optics (nlay, ncol, ngpt) -> RTE with batch (ncol, ngpt) ->
  g-point reduction is a lane-axis sum. At large ncol, memory is bounded by
  sharding/chunking columns (the natural parallel axis), not by serializing
  the spectrum.
- Band-dependent quantities (cloud/aerosol optical properties, surface
  emissivity/albedo) are computed at band granularity and expanded to
  g-points with one static band->gpt take along the trailing axis.
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
from ..ops.aerosol_optics import aerosol_optics_bands
from ..ops.cloud_optics import (
    cloud_optics_bands,
    delta_scale,
    increment_2stream,
)
from ..ops.gas_optics import gas_optics_lw, gas_optics_sw, gpt2band_np
from ..states import AtmosphericState, LwBCs, SwBCs, tree_map_columns as _tree_map_columns


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


def pad_columns(pytree, ncol: int, multiple: int = 128):
    """Edge-replicate-pad every column leaf (trailing axis ``ncol``) up to the
    next multiple of ``multiple``. Edge replication duplicates real columns,
    so the p/t min/max (and hence the Pallas kernel window invariant) are
    unchanged. No-op when already aligned."""
    npad = -(-ncol // multiple) * multiple
    if npad == ncol:
        return pytree

    def pad_leaf(x):
        if x is None or not hasattr(x, "ndim") or x.ndim == 0 or x.shape[-1] != ncol:
            return x
        widths = [(0, 0)] * (x.ndim - 1) + [(0, npad - ncol)]
        return jnp.pad(x, widths, mode="edge")

    return _tree_map_columns(pad_leaf, lambda x: x, pytree)


def slice_columns(pytree, ncol: int, multiple: int = 128):
    """Undo ``pad_columns`` on outputs: slice trailing padded axes to ncol."""
    npad = -(-ncol // multiple) * multiple
    if npad == ncol:
        return pytree

    def slice_leaf(x):
        if x is None or not hasattr(x, "ndim") or x.ndim == 0 or x.shape[-1] != npad:
            return x
        return x[..., :ncol]

    return _tree_map_columns(slice_leaf, lambda x: x, pytree)


def solve_chunked(solve_fn, as_: AtmosphericState, bcs, chunk: int, *,
                  cld_mask=None, cld_mask_seed=None):
    """Run a solve over column chunks sequentially (lax.map) to bound memory.

    The reference bounds memory by serializing the g-point loop with one flux
    temp buffer (/root/reference/src/optics/RTE.jl:47); the TPU-native
    equivalent serializes COLUMN chunks — the embarrassingly parallel axis —
    keeping the full spectrum batched on-chip. ncol must be a multiple of
    ``chunk`` (pad upstream). cld_mask, when given, is chunked too.

    solve_fn: (atm_chunk, bcs_chunk[, cld_mask_chunk | seed, col_offset]) ->
    flux namedtuple. In seed mode solve_fn receives the (replicated) seed AND
    the chunk's global column offset — forward both to solve_lw/solve_sw
    (cld_mask_seed=seed, col_offset=off) so the McICA sample equals the
    unchunked one bitwise. Returns the flux namedtuple with columns
    re-concatenated.
    """
    ncol = as_.ncol
    assert ncol % chunk == 0, (ncol, chunk)
    n_chunks = ncol // chunk

    def chunk_rep(x):
        # replicated leaf (e.g. global-mean vmr vector): broadcast over chunks
        if x is None or not hasattr(x, "ndim"):
            return x
        return jnp.broadcast_to(x[None], (n_chunks, *x.shape))

    def chunk_leaf(x):
        if x is None or not hasattr(x, "ndim") or x.ndim == 0 or x.shape[-1] != ncol:
            return chunk_rep(x)
        return jnp.moveaxis(x.reshape(*x.shape[:-1], n_chunks, chunk), -2, 0)

    as_c = _tree_map_columns(chunk_leaf, chunk_rep, as_)
    bcs_c = _tree_map_columns(chunk_leaf, chunk_rep, bcs)

    if cld_mask is not None:
        # (nlay, ncol, ngpt): chunk the middle axis
        m = cld_mask.reshape(cld_mask.shape[0], n_chunks, chunk, cld_mask.shape[-1])
        m = jnp.moveaxis(m, 1, 0)
        fluxes = jax.lax.map(lambda args: solve_fn(*args), (as_c, bcs_c, m))
    elif cld_mask_seed is not None:
        # one shared seed + per-chunk GLOBAL column offsets: each chunk's
        # McICA stream is keyed on (seed, global column/block), so chunked
        # == unchunked bitwise (and chunks stay decorrelated)
        seeds = jnp.broadcast_to(
            jnp.asarray(cld_mask_seed, jnp.int32), (n_chunks,)
        )
        offs = jnp.arange(n_chunks, dtype=jnp.int32) * jnp.int32(chunk)
        fluxes = jax.lax.map(lambda args: solve_fn(*args), (as_c, bcs_c, seeds, offs))
    else:
        fluxes = jax.lax.map(lambda args: solve_fn(*args), (as_c, bcs_c))

    def unchunk(x):  # (n_chunks, nlev, chunk) -> (nlev, ncol)
        return jnp.moveaxis(x, 0, -2).reshape(*x.shape[1:-1], ncol)

    return jax.tree_util.tree_map(unchunk, fluxes)


def _window_guard_ok(lkp, tables, as_, window: int, mega: bool) -> jax.Array:
    """Traced (in-jit) validity of the windowed="force" table-window
    invariant for the CURRENT p/t fields. Returns a () bool.

    Force mode trusts a static window computed at init; if the host drifts
    pressures/temperatures beyond it, the kernels would read wrong table
    rows — silently wrong fluxes, the worst failure mode. This check costs
    one min/max reduction over (nlay, ncol); solves apply it by poisoning
    outputs with NaN when violated (see _poison_unless), so violations are
    loud. Recovery: rebuild the solver (recomputing the window) or use
    windowed="auto".
    """
    from ..ops import pallas_interp as pk
    from ..ops.gas_optics import compute_pt_interp

    rps = pk.rows_per_slab(lkp.n_temp)
    pt = compute_pt_interp(lkp, as_.p_lay, as_.t_lay)
    q = pt.jpress_base * rps + pt.jtemp
    n_rows = tables.fused_hi.shape[0]
    if mega:
        _, ok = pk.mega_window_bases(q, rps, n_rows, window)
    else:
        _, ok = pk.window_bases(q, rps, n_rows, window)
    return ok


def _ray_guard_ok(lkp, as_, ray_win: int) -> jax.Array:
    """Traced validity of the SW Rayleigh-table window (interleaved rows;
    see gas_optics_pallas.compute_ray_window). Same contract and failure
    mode as _window_guard_ok."""
    from ..ops import pallas_interp as pk
    from ..ops.gas_optics import compute_pt_interp

    rps = pk.rows_per_slab(lkp.n_temp)
    pt = compute_pt_interp(lkp, as_.p_lay, as_.t_lay)
    q_ray = jnp.where(pt.tropo_lower, 0, rps) + pt.jtemp
    _, ok = pk.ray_window_bases(q_ray, 2 * rps, ray_win)
    return ok


def _poison_unless(flux, ok):
    """NaN-poison all flux fields unless ``ok`` (a () bool) holds."""
    if ok is None:
        return flux
    return type(flux)(*(jnp.where(ok, f, jnp.nan) for f in flux))


def _bands_to_gpt(lkp: GasLookup, x_bands: jax.Array) -> jax.Array:
    """Expand a per-band array (..., nbnd) to per-g-point (..., ngpt)."""
    return jnp.take(x_bands, jnp.asarray(gpt2band_np(lkp)), axis=-1)


def _apply_metric_scaling(flux, metric_scaling):
    """Deep-atmosphere metric scaling (ref /root/reference/src/optics/Fluxes.jl:227-236)."""
    if metric_scaling is None:
        return flux
    return type(flux)(*(f * metric_scaling for f in flux))


def _add_cloud_all(lkp, lkp_cld, as_, tau, ssa, g_asym, cld_mask, delta_scaling):
    """Cloud optics per band, expanded to g-points, incremented under mask.

    1-scalar path (ssa None) adds absorption only (ref cloud_optics.jl:44);
    2-stream uses increment_2stream (ref cloud_optics.jl:115-124).
    cld_mask: (nlay, ncol, ngpt) bool.
    """
    cs = as_.cloud_state
    tau_b, ssa_b, g_b = cloud_optics_bands(lkp_cld, cs)  # (nlay, ncol, nbnd)
    tau_c = _bands_to_gpt(lkp, tau_b)                    # (nlay, ncol, ngpt)
    ssa_c = _bands_to_gpt(lkp, ssa_b)
    g_c = _bands_to_gpt(lkp, g_b)
    if ssa is None:
        return tau + jnp.where(cld_mask, tau_c - ssa_c * tau_c, 0.0), None, None
    if delta_scaling:
        tau_c, ssa_c, g_c = delta_scale(tau_c, ssa_c, g_c)
    tn, sn, gn = increment_2stream(tau, ssa, g_asym, tau_c, ssa_c, g_c)
    return (
        jnp.where(cld_mask, tn, tau),
        jnp.where(cld_mask, sn, ssa),
        jnp.where(cld_mask, gn, g_asym),
    )


def _aerosol_bands_masked(lkp_aero, as_, delta_scaling, collect_aod,
                          active_species=None):
    """Band-level aerosol two-stream props + active mask for the megakernels.

    Identical arithmetic to _add_aerosol_all's pre-increment stage — the
    ssa/g ratio forms and delta scaling are pointwise in band-constant
    values, so they commute exactly with the band->g-point broadcast."""
    eps = float(jnp.finfo(as_.p_lay.dtype).eps)
    aero = as_.aerosol_state
    active = jnp.any(aero.aero_mass > 0.0, axis=0)  # (nlay, ncol)
    if active_species is not None:
        # Pallas kernel: raw band sums computed in VMEM, band-leading output
        # (the per-species mass>0 masks make the outer `active` zeroing a
        # numeric no-op, so it is skipped)
        from ..ops.pallas_aerosol import aerosol_bands_pallas

        t_b, ts_b, tsg_b = aerosol_bands_pallas(
            lkp_aero, aero, as_.rel_hum, active_species
        )  # each (nlay, mb, ncol)
        aod_ext = aod_sca = None
        if collect_aod and lkp_aero.iband_550nm >= 0:
            aod_ext = jnp.sum(t_b[:, lkp_aero.iband_550nm], axis=0)
            aod_sca = jnp.sum(ts_b[:, lkp_aero.iband_550nm], axis=0)
        g_a = tsg_b / jnp.maximum(eps, ts_b)
        ssa_a = ts_b / jnp.maximum(eps, t_b)
        if delta_scaling:
            t_b, ssa_a, g_a = delta_scale(t_b, ssa_a, g_a)
        return (t_b, ssa_a, g_a), active, aod_ext, aod_sca
    t_b, ts_b, tsg_b = aerosol_optics_bands(
        lkp_aero, aero, as_.rel_hum, active_species
    )
    t_b = jnp.where(active[..., None], t_b, 0.0)
    ts_b = jnp.where(active[..., None], ts_b, 0.0)
    tsg_b = jnp.where(active[..., None], tsg_b, 0.0)
    aod_ext = aod_sca = None
    if collect_aod and lkp_aero.iband_550nm >= 0:
        aod_ext = jnp.sum(t_b[:, :, lkp_aero.iband_550nm], axis=0)
        aod_sca = jnp.sum(ts_b[:, :, lkp_aero.iband_550nm], axis=0)
    g_a = tsg_b / jnp.maximum(eps, ts_b)
    ssa_a = ts_b / jnp.maximum(eps, t_b)
    if delta_scaling:
        t_b, ssa_a, g_a = delta_scale(t_b, ssa_a, g_a)
    b3 = tuple(jnp.swapaxes(x, 1, 2) for x in (t_b, ssa_a, g_a))
    return b3, active, aod_ext, aod_sca


def _add_aerosol_all(lkp, lkp_aero, as_, tau, ssa, g_asym, delta_scaling,
                     collect_aod, active_species=None):
    """Aerosol optics per band, expanded to g-points (ref aerosol_optics.jl)."""
    eps = float(jnp.finfo(tau.dtype).eps)
    aero = as_.aerosol_state
    active = jnp.any(aero.aero_mass > 0.0, axis=0)  # (nlay, ncol)

    t_b, ts_b, tsg_b = aerosol_optics_bands(
        lkp_aero, aero, as_.rel_hum, active_species
    )
    t_b = jnp.where(active[..., None], t_b, 0.0)
    ts_b = jnp.where(active[..., None], ts_b, 0.0)
    tsg_b = jnp.where(active[..., None], tsg_b, 0.0)

    aod_ext = aod_sca = None
    if collect_aod and lkp_aero.iband_550nm >= 0:
        aod_ext = jnp.sum(t_b[:, :, lkp_aero.iband_550nm], axis=0)
        aod_sca = jnp.sum(ts_b[:, :, lkp_aero.iband_550nm], axis=0)

    t_a = _bands_to_gpt(lkp, t_b)
    ts_a = _bands_to_gpt(lkp, ts_b)
    tsg_a = _bands_to_gpt(lkp, tsg_b)

    if ssa is None:
        return tau + (t_a - ts_a), None, None, aod_ext, aod_sca

    g_a = tsg_a / jnp.maximum(eps, ts_a)
    ssa_a = ts_a / jnp.maximum(eps, t_a)
    if delta_scaling:
        t_a, ssa_a, g_a = delta_scale(t_a, ssa_a, g_a)
    tn, sn, gn = increment_2stream(tau, ssa, g_asym, t_a, ssa_a, g_a)
    m = active[..., None]
    return (
        jnp.where(m, tn, tau),
        jnp.where(m, sn, ssa),
        jnp.where(m, gn, g_asym),
        aod_ext,
        aod_sca,
    )


def solve_lw(
    lkp: GasLookup,
    as_: AtmosphericState,
    bcs: LwBCs,
    *,
    two_stream: bool = False,
    n_gauss_angles: int = 1,
    lkp_cld: CloudLookup | None = None,
    lkp_aero: AerosolLookup | None = None,
    cld_mask: jax.Array | None = None,   # (nlay, ncol, ngpt) McICA mask
    metric_scaling: jax.Array | None = None,
    pallas_tables=None,                  # PallasGasTables -> TPU kernel path
    pallas_rte: bool | None = None,      # None: auto (on iff pallas_tables, f32)
    pallas_windowed: str = "auto",       # gas_optics_pallas windowed mode
    pallas_window: int = 96,             # static table-row window (see
                                         # gas_optics_pallas.compute_min_window)
    pallas_planck_window: int | None = None,  # static totplnk window
                                         # (gas_optics_pallas.compute_planck_window);
                                         # None = full table. Guarded in-jit.
    pallas_sweep_cols: int = 16,         # RTE sweep column block; 128 on TPU
                                         # with utils.compile.tpu_compiler_options
    aero_species: tuple | None = None,   # STATIC active MERRA species indices
                                         # (skip zero-mass species at trace time)
    cld_mask_seed: jax.Array | None = None,  # () int32: sample the McICA mask
                                         # IN-KERNEL (TPU PRNG, counter-based;
                                         # ref reset_rng_seed semantics) instead
                                         # of passing cld_mask
    col_offset: jax.Array | int = 0,     # () int32 GLOBAL index of column 0 of
                                         # this batch: makes seed-driven McICA
                                         # a pure function of (seed, global
                                         # column), bitwise-invariant to
                                         # column sharding/chunking
    eta_node_mode: str = "continuous",   # STATIC eta grid-node semantics
                                         # (gas_optics.ETA_NODE_MODES);
                                         # "reference" for golden parity runs
) -> tuple[FluxLW, SolveDiagnostics]:
    """Longwave flux solve over all g-points.

    Mirrors rte_lw_noscat_solve!/rte_lw_2stream_solve!
    (/root/reference/src/rte/longwave1scalar.jl:29-102,
     /root/reference/src/rte/longwave2stream.jl:26-101).
    """
    dtype = as_.p_lay.dtype
    Ds, wts = angular_discretization(n_gauss_angles)

    if pallas_tables is not None and dtype != jnp.float32:
        import warnings

        warnings.warn(
            "pallas_tables ignored: the Pallas TPU kernel tier is f32-only; "
            "non-f32 inputs dispatch the exact-precision XLA path instead "
            "(slower, but true f64 — not an f32-faithful approximation)",
            stacklevel=2,
        )
        pallas_tables = None
    if pallas_rte is None:
        pallas_rte = pallas_tables is not None and dtype == jnp.float32

    # Megakernel paths: whole LW solve (optics [+ cloud composition] +
    # Planck sources + sweep) in one kernel — no (nlay, ncol, ngpt) HBM
    # intermediates. Requires the caller-verified window invariant ("force")
    # and 128-col-aligned ncol.
    mega_ok = (
        pallas_tables is not None and pallas_rte
        and dtype == jnp.float32 and pallas_windowed == "force"
        and as_.ncol % 128 == 0
        # the megakernels bake a single propagation angle into the fused
        # sweep; n_gauss_angles > 1 (no-scat only) takes the two-kernel path
        # and re-runs the sweep per angle
        and (two_stream or n_gauss_angles == 1)
    )
    # in-kernel McICA needs the TPU PRNG; off-TPU (interpret mode) the seed
    # materializes a threefry mask instead
    if (
        cld_mask is None and cld_mask_seed is not None and lkp_cld is not None
        and jax.default_backend() != "tpu"
    ):
        from ..ops.cloud_optics import build_cloud_mask_mcica

        cld_mask = build_cloud_mask_mcica(
            jax.random.key(cld_mask_seed), as_.cloud_state.cld_frac, lkp.n_gpt,
            col_offset=col_offset,
        )
        cld_mask_seed = None

    has_cld_input = cld_mask is not None or cld_mask_seed is not None
    if mega_ok and two_stream and (lkp_cld is None) == (not has_cld_input):
        from ..ops.cloud_optics import cloud_optics_bands
        from ..ops.gas_optics_pallas import mega_lw_inputs
        from ..ops.pallas_interp import rows_per_slab
        from ..ops.pallas_mega import lw2_mega

        window = min(pallas_window, pallas_tables.fused_ilv.shape[0])
        win_ok = _window_guard_ok(lkp, pallas_tables, as_, window, mega=True)
        # composed solves stay at 128 (per-block McICA stream keying);
        # LW2_MEGA_BLOCK (experiment) overrides for CLEAR solves
        lw2_block = 128
        if lkp_cld is None and as_.ncol % 256 == 0:
            import os

            lw2_block = int(os.environ.get("LW2_MEGA_BLOCK", "128"))
        (q_base, pack3, eta3, _, plk_lev, plk_sfc, groups_static,
         scal_offs, plk_ok) = mega_lw_inputs(
            lkp, pallas_tables, as_, window, need_lay=False,
            planck_window=pallas_planck_window, eta_node_mode=eta_node_mode,
        )
        win_ok = jnp.logical_and(win_ok, plk_ok)
        cld_b3 = None
        gen = lkp_cld is not None and cld_mask is None
        if lkp_cld is not None:
            tau_b, ssa_b, g_b = cloud_optics_bands(lkp_cld, as_.cloud_state)
            cld_b3 = tuple(jnp.swapaxes(x, 1, 2) for x in (tau_b, ssa_b, g_b))
        aero_b3 = aero_act = None
        if lkp_aero is not None:
            aero_b3, aero_act, _, _ = _aerosol_bands_masked(
                lkp_aero, as_, delta_scaling=False, collect_aod=False,
                active_species=aero_species,
            )
        out = lw2_mega(
            q_base, pack3, eta3, plk_lev, plk_sfc,
            bcs.sfc_emis.astype(jnp.float32),
            pallas_tables.fused_ilv,
            pallas_tables.minor_stack, pallas_tables.minor_proj,
            bcs.inc_flux, cld_b3, cld_mask, aero_b3, aero_act,
            as_.cloud_state.cld_frac if gen else None,
            cld_mask_seed if gen else None,
            cld_blk_off=col_offset // 128 if gen else 0,
            nlay=as_.nlay, window=window, n_eta=lkp.n_eta, n_gpt=lkp.n_gpt,
            n_bnd=lkp.n_bnd, bnd_lims_gpt=lkp.bnd_lims_gpt,
            minor_groups=groups_static, scal_offs=scal_offs,
            minor_ntp=pallas_tables.minor_ntp,
            slab=rows_per_slab(lkp.n_temp), block_cols=lw2_block,
        )
        flux_up, flux_dn = out[0], out[1]
        flux = FluxLW(flux_up, flux_dn, flux_up - flux_dn)
        flux = _poison_unless(_apply_metric_scaling(flux, metric_scaling), win_ok)
        diag = SolveDiagnostics()
        if gen:
            diag = diag._replace(cld_cover=out[2].astype(dtype))
        elif cld_mask is not None:
            from ..ops.cloud_optics import cloud_cover_from_mask

            diag = diag._replace(
                cld_cover=cloud_cover_from_mask(cld_mask).astype(dtype)
            )
        return flux, diag

    if mega_ok and not two_stream and (lkp_cld is None) == (not has_cld_input):
        from ..ops.gas_optics_pallas import mega_lw_inputs
        from ..ops.pallas_interp import rows_per_slab
        from ..ops.pallas_mega import lw_clear_mega

        composed = lkp_cld is not None or lkp_aero is not None
        # block 128 for ALL LW no-scat solves: a fresh r4 A/B at 32k cols
        # measured 128 at 62.20 ms vs 256 at 62.93 (the old 256-for-clear
        # default predates the r3/r4 kernel restructures); LW_MEGA_BLOCK
        # overrides for experiments on 256-aligned clear solves
        mega_block = 128
        if not composed and as_.ncol % 256 == 0:
            import os

            mega_block = int(os.environ.get("LW_MEGA_BLOCK", "128"))
        window = min(pallas_window, pallas_tables.fused_ilv.shape[0])
        win_ok = _window_guard_ok(lkp, pallas_tables, as_, window, mega=True)
        (q_base, pack3, eta3, plk_lay, plk_lev, plk_sfc, groups_static,
         scal_offs, plk_ok) = mega_lw_inputs(
            lkp, pallas_tables, as_, window,
            planck_window=pallas_planck_window, eta_node_mode=eta_node_mode,
        )
        win_ok = jnp.logical_and(win_ok, plk_ok)
        cld_b3 = None
        gen = lkp_cld is not None and cld_mask is None
        if lkp_cld is not None:
            from ..ops.cloud_optics import cloud_optics_bands

            tau_b, ssa_b, g_b = cloud_optics_bands(lkp_cld, as_.cloud_state)
            cld_b3 = tuple(jnp.swapaxes(x, 1, 2) for x in (tau_b, ssa_b))
        aero_b3 = aero_act = None
        if lkp_aero is not None:
            aero_b3, aero_act, _, _ = _aerosol_bands_masked(
                lkp_aero, as_, delta_scaling=False, collect_aod=False,
                active_species=aero_species,
            )
        out = lw_clear_mega(
            q_base, pack3, eta3, plk_lay, plk_lev, plk_sfc,
            bcs.sfc_emis.astype(jnp.float32),
            pallas_tables.fused_ilv,
            pallas_tables.minor_stack, pallas_tables.minor_proj,
            bcs.inc_flux, cld_b3, cld_mask, aero_b3, aero_act,
            as_.cloud_state.cld_frac if gen else None,
            cld_mask_seed if gen else None,
            cld_blk_off=col_offset // mega_block if gen else 0,
            nlay=as_.nlay, window=window, n_eta=lkp.n_eta, n_gpt=lkp.n_gpt,
            n_bnd=lkp.n_bnd, bnd_lims_gpt=lkp.bnd_lims_gpt,
            minor_groups=groups_static, scal_offs=scal_offs,
            minor_ntp=pallas_tables.minor_ntp,
            slab=rows_per_slab(lkp.n_temp),
            ds=float(Ds[0]), w_mu=float(wts[0]), block_cols=mega_block,
        )
        flux_up, flux_dn = out[0], out[1]
        flux = FluxLW(flux_up, flux_dn, flux_up - flux_dn)
        flux = _poison_unless(_apply_metric_scaling(flux, metric_scaling), win_ok)
        diag = SolveDiagnostics()
        if gen:
            diag = diag._replace(cld_cover=out[2].astype(dtype))
        elif cld_mask is not None:
            from ..ops.cloud_optics import cloud_cover_from_mask

            diag = diag._replace(
                cld_cover=cloud_cover_from_mask(cld_mask).astype(dtype)
            )
        return flux, diag

    if cld_mask is None and cld_mask_seed is not None and lkp_cld is not None:
        from ..ops.cloud_optics import build_cloud_mask_mcica

        cld_mask = build_cloud_mask_mcica(
            jax.random.key(cld_mask_seed), as_.cloud_state.cld_frac, lkp.n_gpt,
            col_offset=col_offset,
        )

    win_ok = None
    if pallas_tables is not None and pallas_windowed == "force":
        win_ok = _window_guard_ok(
            lkp, pallas_tables, as_,
            min(pallas_window, pallas_tables.fused_hi.shape[0]), mega=False,
        )

    raw = None
    if pallas_tables is not None:
        if pallas_rte and not two_stream:
            # source-fused sweep: Planck sources built in-kernel from banded
            # emission values — never materialized at (nlay, ncol, ngpt)
            from ..ops.gas_optics_pallas import gas_optics_lw_raw as _pallas_lw_raw

            # clear-sky + aligned columns: keep g-point pad lanes (exact
            # zeros) through to the sweep — skips slice+re-pad HBM round trips
            kp = lkp_cld is None and lkp_aero is None and as_.ncol % 256 == 0
            raw = _pallas_lw_raw(
                lkp, pallas_tables, as_, windowed=pallas_windowed,
                window_size=pallas_window, keep_padded=kp,
                eta_node_mode=eta_node_mode,
            )
            optics = None
            tau = raw.tau
        else:
            from ..ops.gas_optics_pallas import gas_optics_lw as _pallas_lw

            optics = _pallas_lw(
                lkp, pallas_tables, as_, windowed=pallas_windowed,
                window_size=pallas_window,
                # the Pallas 2-stream sweep uses only level sources
                need_lay_source=not (two_stream and pallas_rte),
                eta_node_mode=eta_node_mode,
            )
            tau = optics.tau
    else:
        optics = gas_optics_lw(lkp, as_, eta_node_mode=eta_node_mode)
        tau = optics.tau
    ssa = jnp.zeros_like(tau) if two_stream else None
    g_asym = jnp.zeros_like(tau) if two_stream else None

    if lkp_cld is not None:
        tau, ssa, g_asym = _add_cloud_all(
            lkp, lkp_cld, as_, tau, ssa, g_asym, cld_mask, delta_scaling=False
        )
    if lkp_aero is not None:
        tau, ssa, g_asym, _, _ = _add_aerosol_all(
            lkp, lkp_aero, as_, tau, ssa, g_asym, delta_scaling=False,
            collect_aod=False, active_species=aero_species,
        )

    inc = bcs.inc_flux

    def _noscat_angles(one_angle):
        """Sum the single-angle no-scat transport over quadrature angles.

        Gauss-Jacobi-5 weights sum to 1 (angular.py), so the optional TOA
        incident flux splits by weight: every angle then sees the same
        isotropic intensity inc/pi. The reference carries the quadrature in
        its solver container but runs angle 1 only
        (/root/reference/src/optics/AngularDiscretizations.jl:32-54,
         src/rte/longwave1scalar.jl:14-15); multi-angle summation is this
        framework's completion of that contract."""
        up = dn = None
        for k in range(n_gauss_angles):
            inc_k = None if inc is None else inc * dtype.type(wts[k])
            up_k, dn_k = one_angle(float(Ds[k]), float(wts[k]), inc_k)
            up = up_k if up is None else up + up_k
            dn = dn_k if dn is None else dn + dn_k
        return up, dn

    if raw is not None:
        from ..ops.pallas_rte import lw_noscat_banded_reduced

        flux_up, flux_dn = _noscat_angles(
            lambda ds, w, inc_k: lw_noscat_banded_reduced(
                tau, raw.pfrac, raw.plk_lay, raw.plk_lev, raw.plk_sfc,
                bcs.sfc_emis.T.astype(jnp.float32), ds, w,
                lkp.bnd_lims_gpt, inc_k, block_cols=pallas_sweep_cols,
            )
        )
        flux = FluxLW(flux_up, flux_dn, flux_up - flux_dn)
        flux = _poison_unless(_apply_metric_scaling(flux, metric_scaling), win_ok)
        diag = SolveDiagnostics()
        if cld_mask is not None:
            from ..ops.cloud_optics import cloud_cover_from_mask

            diag = diag._replace(
                cld_cover=cloud_cover_from_mask(cld_mask).astype(dtype)
            )
        return flux, diag

    sfc_emis = _bands_to_gpt(lkp, bcs.sfc_emis.T)  # (ncol, ngpt)
    if two_stream:
        if pallas_rte:
            from ..ops.pallas_rte import lw_2stream_pallas_reduced

            flux_up, flux_dn = lw_2stream_pallas_reduced(
                tau, ssa, g_asym, optics.sources.lev_source,
                optics.sources.sfc_source, sfc_emis, inc,
                block_cols=pallas_sweep_cols,
            )
        else:
            up, dn = rte.lw_2stream(
                tau, ssa, g_asym, optics.sources.lev_source,
                optics.sources.sfc_source, sfc_emis, inc,
            )
            flux_up = jnp.sum(up, axis=-1)
            flux_dn = jnp.sum(dn, axis=-1)
    elif pallas_rte:
        from ..ops.pallas_rte import lw_noscat_pallas_reduced

        flux_up, flux_dn = _noscat_angles(
            lambda ds, w, inc_k: lw_noscat_pallas_reduced(
                tau, optics.sources.lay_source, optics.sources.lev_source,
                optics.sources.sfc_source, sfc_emis, ds, w, inc_k,
                block_cols=min(pallas_sweep_cols, 64),
            )
        )
    else:
        def _one_angle_xla(ds, w, inc_k):
            up, dn = rte.lw_noscat(
                tau, optics.sources.lay_source, optics.sources.lev_source,
                optics.sources.sfc_source, sfc_emis, ds, w, inc_k,
            )
            return jnp.sum(up, axis=-1), jnp.sum(dn, axis=-1)

        flux_up, flux_dn = _noscat_angles(_one_angle_xla)

    flux = FluxLW(flux_up, flux_dn, flux_up - flux_dn)
    flux = _poison_unless(_apply_metric_scaling(flux, metric_scaling), win_ok)

    diag = SolveDiagnostics()
    if cld_mask is not None:
        from ..ops.cloud_optics import cloud_cover_from_mask

        diag = diag._replace(cld_cover=cloud_cover_from_mask(cld_mask).astype(dtype))
    return flux, diag


def differentiable_solve_lw(lkp: GasLookup, **kwargs):
    """``f(as_, bcs) -> FluxLW`` with a custom VJP: Pallas-kernel forward,
    XLA-path backward.

    The Pallas kernel tier (megakernels and the two-kernel path) has no
    native adjoints; instead of abandoning TPU kernels for gradient work,
    the forward pass runs whatever kernel path ``kwargs`` selects
    (pallas_tables / pallas_windowed / ...) while the backward pass
    differentiates the mathematically-identical pure-XLA solve evaluated at
    the same primals. Because the two paths agree to f32 tolerance, the
    returned cotangents are the exact gradients of the XLA solve and
    f32-accurate gradients of the kernel forward.

    Gradients flow to both ``as_`` (atmospheric state) and ``bcs``.
    McICA cloud solves are excluded (a sampled mask is not a differentiable
    input); differentiate the XLA path with an explicit ``cld_mask`` for
    cloudy adjoints. Cost: backward ≈ one XLA-path VJP (slower than the
    kernel forward — the standard price of an XLA-cotangent adjoint).
    """
    assert "cld_mask" not in kwargs and "cld_mask_seed" not in kwargs, (
        "McICA cloud solves are not differentiable via the kernel path; use "
        "the XLA path (pallas_tables=None) with an explicit cld_mask"
    )
    xla_kwargs = {
        k: v for k, v in kwargs.items() if not k.startswith("pallas_")
    }

    @jax.custom_vjp
    def f(as_, bcs):
        return solve_lw(lkp, as_, bcs, **kwargs)[0]

    def fwd(as_, bcs):
        return f(as_, bcs), (as_, bcs)

    def bwd(res, ct):
        as_, bcs = res
        _, vjp = jax.vjp(
            lambda a, b: solve_lw(lkp, a, b, **xla_kwargs)[0], as_, bcs
        )
        return vjp(ct)

    f.defvjp(fwd, bwd)
    return f


def differentiable_solve_sw(lkp: GasLookup, **kwargs):
    """``f(as_, bcs) -> FluxSW`` with a custom VJP: Pallas-kernel forward,
    XLA-path backward (see differentiable_solve_lw)."""
    assert "cld_mask" not in kwargs and "cld_mask_seed" not in kwargs, (
        "McICA cloud solves are not differentiable via the kernel path; use "
        "the XLA path (pallas_tables=None) with an explicit cld_mask"
    )
    xla_kwargs = {
        k: v for k, v in kwargs.items() if not k.startswith("pallas_")
    }

    @jax.custom_vjp
    def f(as_, bcs):
        return solve_sw(lkp, as_, bcs, **kwargs)[0]

    def fwd(as_, bcs):
        return f(as_, bcs), (as_, bcs)

    def bwd(res, ct):
        as_, bcs = res
        _, vjp = jax.vjp(
            lambda a, b: solve_sw(lkp, a, b, **xla_kwargs)[0], as_, bcs
        )
        return vjp(ct)

    f.defvjp(fwd, bwd)
    return f


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
    pallas_tables=None,                  # PallasGasTables -> TPU kernel path
    pallas_rte: bool | None = None,      # None: auto (on iff pallas_tables, f32)
    pallas_windowed: str = "auto",       # gas_optics_pallas windowed mode
    pallas_window: int = 96,             # static table-row window (see
                                         # gas_optics_pallas.compute_min_window)
    pallas_ray_window: int | None = None,  # static Rayleigh-table window
                                         # (gas_optics_pallas.compute_ray_window);
                                         # None = full table (always safe). Guarded
                                         # in-jit like pallas_window.
    pallas_sweep_cols: int = 16,         # RTE sweep column block; 128 on TPU
                                         # with utils.compile.tpu_compiler_options
    aero_species: tuple | None = None,   # STATIC active MERRA species indices
    cld_mask_seed: jax.Array | None = None,  # () int32 in-kernel McICA (see solve_lw)
    col_offset: jax.Array | int = 0,     # () int32 global column-0 index (see solve_lw)
    eta_node_mode: str = "continuous",   # STATIC eta node semantics (see solve_lw)
) -> tuple[FluxSW, SolveDiagnostics]:
    """Shortwave flux solve over all g-points.

    Mirrors rte_sw_noscat_solve!/rte_sw_2stream_solve!
    (/root/reference/src/rte/shortwave1scalar.jl:27-77,
     /root/reference/src/rte/shortwave2stream.jl:36-124). Night columns
    (cos_zenith <= 0) produce exactly zero fluxes.
    """
    dtype = as_.p_lay.dtype
    ncol = as_.ncol
    mu0 = bcs.cos_zenith

    if pallas_tables is not None and dtype != jnp.float32:
        import warnings

        warnings.warn(
            "pallas_tables ignored: the Pallas TPU kernel tier is f32-only; "
            "non-f32 inputs dispatch the exact-precision XLA path instead "
            "(slower, but true f64 — not an f32-faithful approximation)",
            stacklevel=2,
        )
        pallas_tables = None
    if pallas_rte is None:
        pallas_rte = pallas_tables is not None and dtype == jnp.float32

    # Megakernel path: whole SW solve (optics [+ cloud composition] + sweep)
    # in one kernel (see solve_lw)
    if (
        cld_mask is None and cld_mask_seed is not None and lkp_cld is not None
        and jax.default_backend() != "tpu"
    ):
        from ..ops.cloud_optics import build_cloud_mask_mcica

        cld_mask = build_cloud_mask_mcica(
            jax.random.key(cld_mask_seed), as_.cloud_state.cld_frac, lkp.n_gpt,
            col_offset=col_offset,
        )
        cld_mask_seed = None

    has_cld_input = cld_mask is not None or cld_mask_seed is not None
    if (
        pallas_tables is not None and pallas_rte and two_stream
        and dtype == jnp.float32
        and pallas_windowed == "force" and ncol % 128 == 0
        and (lkp_cld is None) == (not has_cld_input)
    ):
        from ..ops.cloud_optics import cloud_optics_bands, delta_scale
        from ..ops.gas_optics_pallas import mega_sw_inputs
        from ..ops.pallas_interp import rows_per_slab
        from ..ops.pallas_mega import sw_clear_mega

        window = min(pallas_window, pallas_tables.fused_ilv.shape[0])
        win_ok = _window_guard_ok(lkp, pallas_tables, as_, window, mega=True)
        ray_full = pallas_tables.ray_ilv.shape[0]
        ray_win = min(pallas_ray_window or ray_full, ray_full)
        if ray_win < ray_full:
            win_ok = jnp.logical_and(win_ok, _ray_guard_ok(lkp, as_, ray_win))
        # block 128: despite the round-3 scratch diet (phase-3/4 buffer
        # reuse, no (nlev, B, G) albedo/src — VMEM would now fit), the
        # remote compile service crashes (HTTP 500, tpu_compile_helper exit
        # 1, deterministic) on the SW kernel at block 256 in this
        # environment. Also note composed solves MUST stay at 128: in-kernel
        # McICA streams are keyed per 128-col block (mesh-invariance
        # contract). SW_MEGA_BLOCK (experiment; with SW_MEGA_DIR_BF16=1
        # halving the scratch) overrides for CLEAR solves only.
        sw_block = 128
        if lkp_cld is None and as_.ncol % 256 == 0:
            import os

            sw_block = int(os.environ.get("SW_MEGA_BLOCK", "128"))
        q_base, pack3, eta3, groups_static, scal_offs, ray_base = mega_sw_inputs(
            lkp, pallas_tables, as_, window, ray_window=ray_win,
            eta_node_mode=eta_node_mode,
        )
        cld_b3 = None
        if lkp_cld is not None:
            tau_b, ssa_b, g_b = cloud_optics_bands(lkp_cld, as_.cloud_state)
            # delta scaling commutes with the band->gpt broadcast, so it runs
            # at band granularity here (ref optics_utils.jl:169-177)
            tau_b, ssa_b, g_b = delta_scale(tau_b, ssa_b, g_b)
            cld_b3 = tuple(jnp.swapaxes(x, 1, 2) for x in (tau_b, ssa_b, g_b))
        aero_b3 = aero_act = aod_ext = aod_sca = None
        if lkp_aero is not None:
            aero_b3, aero_act, aod_ext, aod_sca = _aerosol_bands_masked(
                lkp_aero, as_, delta_scaling=True, collect_aod=True,
                active_species=aero_species,
            )
        toa_gpt = bcs.toa_flux[:, None] * lkp.solar_src_scaled[None, :]
        gen = lkp_cld is not None and cld_mask is None
        out = sw_clear_mega(
            q_base, ray_base, pack3, eta3, mu0, toa_gpt,
            bcs.sfc_alb_direct, bcs.sfc_alb_diffuse,
            pallas_tables.fused_ilv,
            pallas_tables.ray_ilv,
            pallas_tables.minor_stack, pallas_tables.minor_proj,
            bcs.inc_flux_diffuse, cld_b3, cld_mask, aero_b3, aero_act,
            as_.cloud_state.cld_frac if gen else None,
            cld_mask_seed if gen else None,
            cld_blk_off=col_offset // 128 if gen else 0,
            nlay=as_.nlay, window=window, n_eta=lkp.n_eta, n_gpt=lkp.n_gpt,
            n_bnd=lkp.n_bnd, bnd_lims_gpt=lkp.bnd_lims_gpt,
            minor_groups=groups_static, scal_offs=scal_offs,
            minor_ntp=pallas_tables.minor_ntp,
            slab=rows_per_slab(lkp.n_temp), block_cols=sw_block,
            ray_win=ray_win,
        )
        flux_up, flux_dn, flux_dn_dir = out[0], out[1], out[2]
        day = (mu0 > 0)[None, :]
        flux_up = jnp.where(day, flux_up, 0.0)
        flux_dn = jnp.where(day, flux_dn, 0.0)
        flux_dn_dir = jnp.where(day, flux_dn_dir, 0.0)
        flux = FluxSW(flux_up, flux_dn, flux_dn_dir, flux_up - flux_dn)
        flux = _poison_unless(_apply_metric_scaling(flux, metric_scaling), win_ok)
        diag = SolveDiagnostics(aod_sw_ext=aod_ext, aod_sw_sca=aod_sca)
        if gen:
            diag = diag._replace(cld_cover=out[3].astype(dtype))
        elif cld_mask is not None:
            from ..ops.cloud_optics import cloud_cover_from_mask

            diag = diag._replace(
                cld_cover=cloud_cover_from_mask(cld_mask).astype(dtype)
            )
        return flux, diag

    if cld_mask is None and cld_mask_seed is not None and lkp_cld is not None:
        from ..ops.cloud_optics import build_cloud_mask_mcica

        cld_mask = build_cloud_mask_mcica(
            jax.random.key(cld_mask_seed), as_.cloud_state.cld_frac, lkp.n_gpt,
            col_offset=col_offset,
        )

    win_ok = None
    if pallas_tables is not None and pallas_windowed == "force":
        win_ok = _window_guard_ok(
            lkp, pallas_tables, as_,
            min(pallas_window, pallas_tables.fused_hi.shape[0]), mega=False,
        )

    if pallas_tables is not None:
        from ..ops.gas_optics_pallas import gas_optics_sw as _pallas_sw

        kp = (
            lkp_cld is None and lkp_aero is None and two_stream
            and as_.ncol % 256 == 0
        )
        optics = _pallas_sw(
            lkp, pallas_tables, as_, windowed=pallas_windowed,
            window_size=pallas_window, keep_padded=kp,
            eta_node_mode=eta_node_mode,
        )
    else:
        optics = gas_optics_sw(lkp, as_, eta_node_mode=eta_node_mode)
    tau = optics.tau
    ssa = optics.ssa if two_stream else None
    # Clear-sky gas optics has zero asymmetry (Rayleigh g=0); keep it symbolic
    # (None) so the Pallas sweep skips a full (nlay, ncol, ngpt) HBM tensor.
    need_g = two_stream and (lkp_cld is not None or lkp_aero is not None)
    g_asym = jnp.zeros_like(tau) if need_g else None

    aod_ext = aod_sca = None
    if lkp_cld is not None:
        tau, ssa, g_asym = _add_cloud_all(
            lkp, lkp_cld, as_, tau, ssa, g_asym, cld_mask, delta_scaling=True
        )
    if lkp_aero is not None:
        tau, ssa, g_asym, aod_ext, aod_sca = _add_aerosol_all(
            lkp, lkp_aero, as_, tau, ssa, g_asym, delta_scaling=True,
            collect_aod=True, active_species=aero_species,
        )

    toa_gpt = bcs.toa_flux[:, None] * lkp.solar_src_scaled[None, :]  # (ncol, ngpt)
    mu0_b = jnp.broadcast_to(mu0[:, None], (ncol, lkp.n_gpt))

    if pallas_rte is None:
        pallas_rte = pallas_tables is not None and dtype == jnp.float32
    if two_stream:
        alb_dir = _bands_to_gpt(lkp, bcs.sfc_alb_direct.T)    # (ncol, ngpt)
        alb_dif = _bands_to_gpt(lkp, bcs.sfc_alb_diffuse.T)
        if pallas_rte:
            from ..ops.pallas_rte import sw_2stream_pallas_reduced

            flux_up, flux_dn, flux_dn_dir = sw_2stream_pallas_reduced(
                tau, ssa, g_asym, mu0_b, toa_gpt, alb_dir, alb_dif,
                bcs.inc_flux_diffuse, block_cols=pallas_sweep_cols,
            )
        else:
            g_arr = jnp.zeros_like(tau) if g_asym is None else g_asym
            up, dn, dn_dir = rte.sw_2stream(
                tau, ssa, g_arr, mu0_b, toa_gpt, alb_dir, alb_dif, bcs.inc_flux_diffuse
            )
            flux_up = jnp.sum(up, axis=-1)
            flux_dn = jnp.sum(dn, axis=-1)
            flux_dn_dir = jnp.sum(dn_dir, axis=-1)
    else:
        # direct-beam only: flux_up/flux_dn stay zero, like the reference's
        # OneScalar SW path (/root/reference/src/rte/shortwave1scalar.jl:92-113)
        dn_dir = rte.sw_noscat(tau, mu0_b, toa_gpt)
        flux_dn_dir = jnp.sum(dn_dir, axis=-1)
        flux_up = jnp.zeros_like(flux_dn_dir)
        flux_dn = jnp.zeros_like(flux_dn_dir)

    day = (mu0 > 0)[None, :]
    flux_up = jnp.where(day, flux_up, 0.0)
    flux_dn = jnp.where(day, flux_dn, 0.0)
    flux_dn_dir = jnp.where(day, flux_dn_dir, 0.0)
    flux = FluxSW(flux_up, flux_dn, flux_dn_dir, flux_up - flux_dn)
    flux = _poison_unless(_apply_metric_scaling(flux, metric_scaling), win_ok)

    diag = SolveDiagnostics(aod_sw_ext=aod_ext, aod_sw_sca=aod_sca)
    if cld_mask is not None:
        from ..ops.cloud_optics import cloud_cover_from_mask

        diag = diag._replace(cld_cover=cloud_cover_from_mask(cld_mask).astype(dtype))
    return flux, diag
