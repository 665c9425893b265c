"""Structural verification of the IN-KERNEL McICA sampler (VERDICT r4 #4).

tests_tpu/test_tpu_mcica.py gates the in-kernel PRNG path by aggregate
statistics for fractional cf; the max-random-overlap CORRELATION structure
(mask nestedness within a contiguous cloudy block, fresh rescaled draws
below clear gaps — ref /root/reference/src/optics/cloud_optics.jl:222-261)
was never observed because the masks exist only inside VMEM. The export
kernel (ops.pallas_mega.mcica_mask_export) replays the identical PRNG
stream and writes (uniforms, mask) to HBM; this module asserts:

1. the exported mask equals a HOST reimplementation of the reference
   recurrence applied to the exported uniforms, BITWISE — nestedness and
   the rescale-below-clear-gaps branch are thereby exact, not statistical;
2. per-layer marginal P(mask) == cf within CLT bounds;
3. explicit nestedness within each contiguous cloudy block (monotone cf
   profile: a masked g-point at smaller cf implies masked at larger cf in
   the same draw chain);
4. production-kernel equivalence: feeding the exported mask back through
   the solver in cld_mask mode reproduces the cld_mask_seed fluxes
   BITWISE for all three megakernels — the production kernels consumed
   exactly this mask.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrtmgp_tpu.data.synthetic import (
    synthetic_atmosphere,
    synthetic_cloud_lookup,
    synthetic_gas_lookup,
)
from rrtmgp_tpu.models.rrtmgp import solve_lw, solve_sw
from rrtmgp_tpu.ops.gas_optics_pallas import build_pallas_tables, compute_min_window
from rrtmgp_tpu.ops.pallas_mega import mcica_mask_export
from rrtmgp_tpu.states import LwBCs, SwBCs
from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

NCOL, NLAY = 256, 30
SEED = 7


def _multiblock_cf(nlay, ncol):
    """Two contiguous cloudy blocks separated by a clear gap, fractional cf
    varying by layer AND column — the profile class the r4 verdict flagged
    as unobserved (a rescale bug preserving mean cover would pass stats)."""
    cf = np.zeros((nlay, ncol), np.float32)
    cols = np.linspace(0.3, 0.95, ncol, dtype=np.float32)
    # upper block: layers 20..24 (top-down draw order hits these first)
    for l in range(20, 25):
        cf[l] = cols * (0.5 + 0.1 * (l - 20))
    # clear gap: 15..19
    # lower block: layers 8..14, increasing cf downward
    for l in range(8, 15):
        cf[l] = np.clip(cols * (1.2 - 0.05 * (l - 8)), 0.0, 0.97)
    return cf


def _host_recurrence(u, cf):
    """Reference max-random-overlap recurrence (top-down), numpy f32.

    Mirrors cloud_optics.jl:222-261 exactly as the kernels implement it:
    reuse u_eff below a MASKED layer; fresh draw rescaled by (1-cf_above)
    below an unmasked layer of a started block or below a clear layer
    (cf_above = 0 makes the rescale a no-op = fresh draw).
    """
    nlay, ncol, gp = u.shape
    mask = np.zeros((nlay, ncol, gp), np.float32)
    u_above = np.zeros((ncol, gp), np.float32)
    m_above = np.zeros((ncol, gp), np.float32)
    cf_above = np.zeros((ncol, 1), np.float32)
    started = np.zeros((ncol, 1), np.float32)
    for i in range(nlay):
        l = nlay - 1 - i
        u_i = u[l]
        cf_i = cf[l][:, None]
        u_eff = np.where(
            started > 0.0,
            np.where(m_above > 0.0, u_above,
                     (u_i * (np.float32(1.0) - cf_above)).astype(np.float32)),
            u_i,
        ).astype(np.float32)
        cloudy = cf_i > 0.0
        m = (cloudy & (u_eff >= (np.float32(1.0) - cf_i))).astype(np.float32)
        mask[l] = m
        u_above, m_above, cf_above = u_eff, m, cf_i
        started = np.maximum(started, cloudy.astype(np.float32))
    return mask


@pytest.fixture(scope="module")
def exported():
    cf = _multiblock_cf(NLAY, NCOL)
    u, m = jax.jit(
        lambda c, s: mcica_mask_export(c, s, 0, n_gpt=256),
        compiler_options=tpu_compiler_options(), static_argnums=(),
    )(jnp.asarray(cf), jnp.asarray(SEED, jnp.int32))
    return cf, np.asarray(u), np.asarray(m)


def test_recurrence_bitwise_vs_host(exported):
    """The in-kernel recurrence (nestedness + rescale-below-clear) is
    EXACTLY the reference recurrence, given the same uniforms."""
    cf, u, m = exported
    want = _host_recurrence(u, cf)
    np.testing.assert_array_equal(m, want)


def test_per_layer_marginals(exported):
    """P(mask) per (layer, column) == cf within CLT bounds over 256 gpts
    (the uniforms are fresh at the TOP cloudy layer of each block; deeper
    layers correlate, so marginals are checked, not independence)."""
    cf, u, m = exported
    gp_real = 256
    p = m[..., :gp_real].mean(axis=-1)
    cloudy = cf > 0.01
    err = np.abs(p - cf)[cloudy]
    # CLT: sd <= sqrt(.25/256) ~ 0.031; 6 sigma with margin for correlation
    assert err.mean() < 0.05, err.mean()
    assert np.all(p[~cloudy] == 0.0)


def test_nestedness_within_contiguous_block(exported):
    """Within a contiguous cloudy block, masks are NESTED wherever the draw
    chain is unbroken: below a MASKED layer the same u_eff is reused, so
    mask[l] >= mask[above] whenever cf[l] >= cf[above] (subset the other
    way when cf decreases)."""
    cf, u, m = exported
    for lo, hi in ((8, 15), (20, 25)):
        for l in range(lo, hi - 1):
            above, below = m[l + 1], m[l]  # level l+1 sits ABOVE l
            grow = cf[l] >= cf[l + 1]  # (ncol,)
            # wherever above is masked AND cf grows downward: below masked
            bad = (above > 0) & (below == 0) & grow[:, None]
            assert not bad.any(), (l, int(bad.sum()))
            shrink = cf[l] <= cf[l + 1]
            bad2 = (below > 0) & (above == 0) & shrink[:, None] & (cf[l + 1] > 0)[:, None]
            assert not bad2.any(), (l, int(bad2.sum()))


def test_clear_gap_decorrelates(exported):
    """Below the clear gap the draws are FRESH: the lower block's top-layer
    mask must not be a function of the upper block's (correlation ~ 0)."""
    cf, u, m = exported
    top_lower = m[14, :, :256]   # top of lower block
    bot_upper = m[20, :, :256]   # bottom of upper block
    both = (top_lower * bot_upper).mean()
    expect_indep = top_lower.mean() * bot_upper.mean()
    assert abs(both - expect_indep) < 0.02, (both, expect_indep)


@pytest.mark.parametrize("solver", ["sw", "lw_noscat", "lw_2stream"])
def test_production_kernels_consume_exported_mask(exported, solver):
    """cld_mask_seed-mode fluxes == cld_mask-mode fluxes with the exported
    mask, bitwise, for all three megakernels: the production kernels'
    internal stream IS the exported one."""
    cf, u, m = exported
    dtype = np.float32
    lkp_lw = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=dtype)
    cld_lw = synthetic_cloud_lookup(n_bnd=16, dtype=dtype)
    cld_sw = synthetic_cloud_lookup(n_bnd=14, seed=5, dtype=dtype)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype, with_clouds=True)
    atm = dataclasses.replace(
        atm, cloud_state=dataclasses.replace(
            atm.cloud_state, cld_frac=jnp.asarray(cf)
        )
    )
    copts = tpu_compiler_options()
    if solver == "sw":
        lkp, cld, ngpt = lkp_sw, cld_sw, 224
        bcs = SwBCs(
            cos_zenith=jnp.full((NCOL,), 0.6, jnp.float32),
            toa_flux=jnp.full((NCOL,), 1361.0, jnp.float32),
            sfc_alb_direct=jnp.full((14, NCOL), 0.2, jnp.float32),
            sfc_alb_diffuse=jnp.full((14, NCOL), 0.2, jnp.float32),
        )
        kw = dict(
            lkp_cld=cld, pallas_tables=build_pallas_tables(lkp),
            pallas_windowed="force",
            pallas_window=compute_min_window(lkp, atm, mega=True),
            pallas_sweep_cols=sweep_block_cols(),
        )
        f = lambda a, b, **k: solve_sw(lkp, a, b, **kw, **k)
    else:
        lkp, cld, ngpt = lkp_lw, cld_lw, 256
        bcs = LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jnp.float32))
        kw = dict(
            lkp_cld=cld, pallas_tables=build_pallas_tables(lkp),
            pallas_windowed="force",
            pallas_window=compute_min_window(lkp, atm, mega=True),
            pallas_sweep_cols=sweep_block_cols(),
        )
        two = solver == "lw_2stream"
        f = lambda a, b, **k: solve_lw(lkp, a, b, two_stream=two, **kw, **k)
    # the export ran with n_gpt=256 (gp=256); the SW kernels draw (B, 224->
    # padded 256) — SAME padded width, so the stream matches across solvers
    mask_bool = jnp.asarray(m[..., :ngpt] > 0)
    f_seed = jax.jit(lambda a, b, s: f(a, b, cld_mask_seed=s)[0],
                     compiler_options=copts)
    f_mask = jax.jit(lambda a, b, mm: f(a, b, cld_mask=mm)[0],
                     compiler_options=copts)
    r1 = f_seed(atm, bcs, jnp.asarray(SEED, jnp.int32))
    r2 = f_mask(atm, bcs, mask_bool)
    for x, y in zip(r1, r2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
