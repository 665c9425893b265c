"""In-kernel McICA PRNG tests on the real TPU (promoted from
benchmarks/check_mcica.py per VERDICT round 1: the TPU PRNG path must be
gated by pytest, not a manual script — the signed-int32 bug class
(CLAUDE.md) would otherwise go uncaught).

Covers all three megakernels' in-kernel samplers:
1. deterministic cf (0/1): bitwise equal to the external-threefry-mask path
   (the mask is then deterministic, so sampler differences cannot hide);
2. fractional cf: max-random-overlap cover statistics (mean cover ==
   max-cf for a contiguous cloud block) + seed decorrelation;
3. global-block seeding: chunked == unchunked bitwise.
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
from rrtmgp_tpu.models.rrtmgp import solve_chunked, solve_lw, solve_sw
from rrtmgp_tpu.ops.cloud_optics import build_cloud_mask_mcica
from rrtmgp_tpu.ops.gas_optics_pallas import build_pallas_tables, compute_min_window
from rrtmgp_tpu.states import LwBCs, SwBCs
from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

NCOL, NLAY = 512, 30


@pytest.fixture(scope="module")
def prob():
    dtype = np.float32
    lkp_lw = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=dtype)
    cld_lw = synthetic_cloud_lookup(n_bnd=16, dtype=dtype)
    cld_sw = synthetic_cloud_lookup(n_bnd=14, seed=5, dtype=dtype)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype, with_clouds=True)
    bcs_lw = LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jnp.float32))
    bcs_sw = SwBCs(
        cos_zenith=jnp.full((NCOL,), 0.6, jnp.float32),
        toa_flux=jnp.full((NCOL,), 1361.0, jnp.float32),
        sfc_alb_direct=jnp.full((14, NCOL), 0.2, jnp.float32),
        sfc_alb_diffuse=jnp.full((14, NCOL), 0.2, jnp.float32),
    )
    copts = tpu_compiler_options()
    kw_lw = dict(
        lkp_cld=cld_lw, pallas_tables=build_pallas_tables(lkp_lw),
        pallas_windowed="force",
        pallas_window=compute_min_window(lkp_lw, atm, mega=True),
        pallas_sweep_cols=sweep_block_cols(),
    )
    kw_sw = dict(
        lkp_cld=cld_sw, pallas_tables=build_pallas_tables(lkp_sw),
        pallas_windowed="force",
        pallas_window=compute_min_window(lkp_sw, atm, mega=True),
        pallas_sweep_cols=sweep_block_cols(),
    )
    return lkp_lw, lkp_sw, kw_lw, kw_sw, atm, bcs_lw, bcs_sw, copts


def _frac(atm, f=0.4):
    cs = dataclasses.replace(atm.cloud_state, cld_frac=atm.cloud_state.cld_frac * f)
    return dataclasses.replace(atm, cloud_state=cs)


@pytest.mark.parametrize("solver", ["sw", "lw_noscat", "lw_2stream"])
def test_inkernel_deterministic_cf_exact(prob, solver):
    """cf in {0,1}: the in-kernel sampler must reproduce the external-mask
    megakernel fluxes EXACTLY (the mask is deterministic)."""
    lkp_lw, lkp_sw, kw_lw, kw_sw, atm, bcs_lw, bcs_sw, copts = prob
    if solver == "sw":
        f = lambda a, b, **k: solve_sw(lkp_sw, a, b, **kw_sw, **k)
        bcs, ngpt = bcs_sw, 224
    else:
        two = solver == "lw_2stream"
        f = lambda a, b, **k: solve_lw(lkp_lw, a, b, two_stream=two, **kw_lw, **k)
        bcs, ngpt = bcs_lw, 256
    f_ext = jax.jit(lambda a, b, m: f(a, b, cld_mask=m)[0], compiler_options=copts)
    f_gen = jax.jit(lambda a, b, s: f(a, b, cld_mask_seed=s)[0], compiler_options=copts)
    mask = build_cloud_mask_mcica(jax.random.key(0), atm.cloud_state.cld_frac, ngpt)
    r1 = f_ext(atm, bcs, mask)
    r2 = f_gen(atm, bcs, jnp.asarray(5, jnp.int32))
    np.testing.assert_array_equal(np.asarray(r1.flux_dn), np.asarray(r2.flux_dn))
    np.testing.assert_array_equal(np.asarray(r1.flux_up), np.asarray(r2.flux_up))


def test_inkernel_fractional_cover_stats(prob):
    """Contiguous fractional-cf block: expected max-random-overlap cover is
    max cf; different seeds decorrelate; clear columns stay at zero."""
    lkp_lw, lkp_sw, kw_lw, kw_sw, atm, bcs_lw, bcs_sw, copts = prob
    atm2 = _frac(atm, 0.4)
    f_gen = jax.jit(
        lambda a, b, s: solve_sw(lkp_sw, a, b, cld_mask_seed=s, **kw_sw)[1],
        compiler_options=copts,
    )
    d3 = f_gen(atm2, bcs_sw, jnp.asarray(3, jnp.int32))
    d4 = f_gen(atm2, bcs_sw, jnp.asarray(4, jnp.int32))
    cf = np.asarray(atm2.cloud_state.cld_frac)
    cloudy = cf.max(axis=0) > 0
    cover = np.asarray(d3.cld_cover)
    assert abs(cover[cloudy].mean() - 0.4) < 0.03, cover[cloudy].mean()
    assert np.abs(cover[~cloudy]).max() == 0.0
    diff = np.abs(np.asarray(d4.cld_cover) - cover)[cloudy].mean()
    assert diff > 0.005, diff


def test_inkernel_chunked_bitwise(prob):
    """Global-block seeding: solve_chunked reproduces the unchunked solve
    bitwise with genuinely stochastic clouds."""
    lkp_lw, lkp_sw, kw_lw, kw_sw, atm, bcs_lw, bcs_sw, copts = prob
    atm2 = _frac(atm, 0.6)
    f = jax.jit(
        lambda a, b, s: solve_lw(
            lkp_lw, a, b, two_stream=True, cld_mask_seed=s, **kw_lw
        )[0],
        compiler_options=copts,
    )
    fc = jax.jit(
        lambda a, b, s: solve_chunked(
            lambda ac, bc, sc, off: solve_lw(
                lkp_lw, ac, bc, two_stream=True, cld_mask_seed=sc,
                col_offset=off, **kw_lw,
            )[0],
            a, b, NCOL // 2, cld_mask_seed=s,
        ),
        compiler_options=copts,
    )
    r = f(atm2, bcs_lw, jnp.asarray(7, jnp.int32))
    rc = fc(atm2, bcs_lw, jnp.asarray(7, jnp.int32))
    np.testing.assert_array_equal(np.asarray(r.flux_up), np.asarray(rc.flux_up))
    np.testing.assert_array_equal(np.asarray(r.flux_dn), np.asarray(rc.flux_dn))
