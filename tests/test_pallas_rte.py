"""Pallas RTE sweep kernels vs the XLA lax.scan transport cores.

Runs in interpret mode on CPU (ops.pallas_rte._interpret); on TPU the same
code lowers through Mosaic. Small shapes exercise both g-point and column
padding. Media are kept away from the Meador-Weaver pole (k*mu0 = 1), where
any pair of f32 implementations legitimately diverges before the energy
clamps (ref /root/reference/src/rte/shortwave2stream.jl:174-193).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrtmgp_tpu.ops import rte
from rrtmgp_tpu.ops.pallas_rte import (
    lw_noscat_pallas,
    lw_noscat_pallas_reduced,
    sw_2stream_pallas,
    sw_2stream_pallas_reduced,
)

NLAY, NCOL, NGPT = 5, 12, 100  # NCOL % block_cols != 0, NGPT < lane tile


def _sw_inputs(dtype=jnp.float32):
    rng = np.random.default_rng(7)
    shape = (NLAY, NCOL, NGPT)
    tau = jnp.asarray(np.abs(rng.normal(0.4, 0.2, shape)), dtype)
    ssa = jnp.asarray(rng.random(shape) * 0.6 + 0.2, dtype)  # away from ssa=0 pole
    g = jnp.asarray(rng.random(shape) * 0.4, dtype)
    mu0 = jnp.full((NCOL, NGPT), 0.86, dtype)
    toa = jnp.full((NCOL, NGPT), 6.0, dtype)
    adir = jnp.full((NCOL, NGPT), 0.2, dtype)
    adif = jnp.full((NCOL, NGPT), 0.25, dtype)
    return tau, ssa, g, mu0, toa, adir, adif


def _lw_inputs(dtype=jnp.float32):
    rng = np.random.default_rng(11)
    tau = jnp.asarray(np.abs(rng.normal(0.4, 0.2, (NLAY, NCOL, NGPT))), dtype)
    lay = jnp.asarray(rng.random((NLAY, NCOL, NGPT)) + 0.5, dtype)
    lev = jnp.asarray(rng.random((NLAY + 1, NCOL, NGPT)) + 0.5, dtype)
    sfc = jnp.asarray(rng.random((NCOL, NGPT)) + 0.5, dtype)
    emis = jnp.full((NCOL, NGPT), 0.98, dtype)
    return tau, lay, lev, sfc, emis


def test_sw_2stream_pallas_full_matches_xla():
    tau, ssa, g, mu0, toa, adir, adif = _sw_inputs()
    ref = rte.sw_2stream(tau, ssa, g, mu0, toa, adir, adif)
    # full kernel requires ncol % block_cols == 0
    pal = sw_2stream_pallas(
        tau[:, :8], ssa[:, :8], g[:, :8], mu0[:8], toa[:8], adir[:8], adif[:8],
        block_cols=8,
    )
    for a, b in zip(ref, pal):
        np.testing.assert_allclose(a[:, :8], b, rtol=2e-4, atol=2e-4)


def test_sw_2stream_pallas_reduced_matches_xla():
    tau, ssa, g, mu0, toa, adir, adif = _sw_inputs()
    ref = rte.sw_2stream(tau, ssa, g, mu0, toa, adir, adif)
    pal = sw_2stream_pallas_reduced(tau, ssa, g, mu0, toa, adir, adif, block_cols=8)
    for a, b in zip(ref, pal):
        np.testing.assert_allclose(jnp.sum(a, -1), b, rtol=2e-4, atol=1e-3)


def test_lw_noscat_pallas_full_matches_xla():
    tau, lay, lev, sfc, emis = _lw_inputs()
    ref = rte.lw_noscat(tau, lay, lev, sfc, emis, 1.66, 0.5)
    pal = lw_noscat_pallas(
        tau[:, :8], lay[:, :8], lev[:, :8], sfc[:8], emis[:8], 1.66, 0.5,
        block_cols=8,
    )
    for a, b in zip(ref, pal):
        np.testing.assert_allclose(a[:, :8], b, rtol=2e-5, atol=1e-5)


def test_lw_noscat_pallas_reduced_matches_xla():
    tau, lay, lev, sfc, emis = _lw_inputs()
    ref = rte.lw_noscat(tau, lay, lev, sfc, emis, 1.66, 0.5)
    pal = lw_noscat_pallas_reduced(tau, lay, lev, sfc, emis, 1.66, 0.5, block_cols=8)
    for a, b in zip(ref, pal):
        np.testing.assert_allclose(jnp.sum(a, -1), b, rtol=2e-5, atol=1e-3)


def test_inc_flux_paths():
    tau, lay, lev, sfc, emis = _lw_inputs()
    inc = jnp.full((NCOL, NGPT), 0.3, jnp.float32)
    ref = rte.lw_noscat(tau, lay, lev, sfc, emis, 1.66, 0.5, inc)
    pal = lw_noscat_pallas_reduced(tau, lay, lev, sfc, emis, 1.66, 0.5, inc, block_cols=8)
    for a, b in zip(ref, pal):
        np.testing.assert_allclose(jnp.sum(a, -1), b, rtol=2e-5, atol=1e-3)


@pytest.mark.parametrize("lw", [True, False])
def test_solver_pallas_rte_flag(lw):
    """solve_lw/solve_sw with pallas_rte=True reproduce the XLA path."""
    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
    from rrtmgp_tpu.models.rrtmgp import solve_lw, solve_sw
    from rrtmgp_tpu.states import LwBCs, SwBCs

    ncol, nlay = 8, 8
    atm = synthetic_atmosphere(ncol=ncol, nlay=nlay, dtype=np.float32)
    if lw:
        lkp = synthetic_gas_lookup(longwave=True, n_gpt=16, n_bnd=2, seed=3, dtype=np.float32)
        bcs = LwBCs(sfc_emis=jnp.full((lkp.n_bnd, ncol), 0.98, jnp.float32), inc_flux=None)
        ref, _ = solve_lw(lkp, atm, bcs, pallas_rte=False)
        pal, _ = solve_lw(lkp, atm, bcs, pallas_rte=True)
    else:
        lkp = synthetic_gas_lookup(longwave=False, n_gpt=16, n_bnd=2, seed=3, dtype=np.float32)
        bcs = SwBCs(
            cos_zenith=jnp.full((ncol,), 0.7, jnp.float32),
            toa_flux=jnp.full((ncol,), 1360.0, jnp.float32),
            sfc_alb_direct=jnp.full((lkp.n_bnd, ncol), 0.2, jnp.float32),
            sfc_alb_diffuse=jnp.full((lkp.n_bnd, ncol), 0.25, jnp.float32),
            inc_flux_diffuse=None,
        )
        ref, _ = solve_sw(lkp, atm, bcs, pallas_rte=False)
        pal, _ = solve_sw(lkp, atm, bcs, pallas_rte=True)
    for a, b in zip(ref, pal):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-3 * float(jnp.max(jnp.abs(a)) + 1e-9))


def test_sw_reduced_streamed_matches_blocked():
    """Streamed (block>=32) and auto-pipelined SW reduced sweeps agree."""
    import numpy as np
    from rrtmgp_tpu.ops import pallas_rte as prte

    rng = np.random.default_rng(0)
    nlay, ncol, ngpt = 7, 64, 40
    tau = jnp.asarray(rng.uniform(0.01, 2.0, (nlay, ncol, ngpt)), jnp.float32)
    ssa = jnp.asarray(rng.uniform(0.0, 0.9, (nlay, ncol, ngpt)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.0, 0.8, (nlay, ncol, ngpt)), jnp.float32)
    mu0 = jnp.asarray(
        rng.uniform(0.1, 1.0, (ncol, 1)) * np.ones((1, ngpt)), jnp.float32
    )
    toa = jnp.asarray(rng.uniform(100, 1400, (ncol, ngpt)), jnp.float32)
    ad = jnp.full((ncol, ngpt), 0.3, jnp.float32)
    af = jnp.full((ncol, ngpt), 0.2, jnp.float32)
    for gg in (None, g):
        a = jax.jit(lambda *x: prte.sw_2stream_pallas_reduced(*x, block_cols=16))(
            tau, ssa, gg, mu0, toa, ad, af
        )
        b = jax.jit(lambda *x: prte.sw_2stream_pallas_reduced(*x, block_cols=32))(
            tau, ssa, gg, mu0, toa, ad, af
        )
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-6, atol=1e-3)


def test_lw_2stream_reduced_matches_xla():
    """Streamed LW two-stream Pallas sweep vs ops.rte.lw_2stream."""
    import numpy as np
    from rrtmgp_tpu.ops import rte
    from rrtmgp_tpu.ops.pallas_rte import lw_2stream_pallas_reduced

    rng = np.random.default_rng(3)
    nlay, ncol, ngpt = 6, 64, 24
    tau = jnp.asarray(rng.uniform(0.01, 3.0, (nlay, ncol, ngpt)), jnp.float32)
    ssa = jnp.asarray(rng.uniform(0.0, 0.9, (nlay, ncol, ngpt)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.0, 0.8, (nlay, ncol, ngpt)), jnp.float32)
    lev = jnp.asarray(rng.uniform(5, 80, (nlay + 1, ncol, ngpt)), jnp.float32)
    sfc = jnp.asarray(rng.uniform(20, 120, (ncol, ngpt)), jnp.float32)
    emis = jnp.full((ncol, ngpt), 0.95, jnp.float32)

    up_x, dn_x = jax.jit(rte.lw_2stream)(tau, ssa, g, lev, sfc, emis)
    fu_x, fd_x = jnp.sum(up_x, -1), jnp.sum(dn_x, -1)
    fu_p, fd_p = jax.jit(
        lambda *a: lw_2stream_pallas_reduced(*a, block_cols=32)
    )(tau, ssa, g, lev, sfc, emis)
    np.testing.assert_allclose(np.asarray(fu_p), np.asarray(fu_x), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fd_p), np.asarray(fd_x), rtol=2e-5, atol=1e-3)
