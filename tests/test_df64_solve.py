"""CPU (interpret-mode) gates for the df64 LW tier.

The real gate runs on chip (tests_tpu/test_tpu_df64.py) because the XLA:CPU
backend contracts the error-free transforms (ops/df32.py header); in
interpret mode that costs ~2^-24-scale noise on some products but the flux
error still lands well inside the reference's 1e-4 W/m^2 f64 tolerance —
asserted here so the tier's plumbing (prologue pairs, table slicing, minor
stream, window guard, eta node modes) stays covered by the default suite.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
from rrtmgp_tpu.models.rrtmgp import solve_lw
from rrtmgp_tpu.ops.pallas_mega_df import (
    build_df64_tables,
    compute_df64_window,
    solve_lw_df64,
)
from rrtmgp_tpu.states import LwBCs

sys.setrecursionlimit(100000)

NCOL, NLAY = 128, 8


@pytest.fixture(scope="module")
def prob():
    lkp = synthetic_gas_lookup(
        longwave=True, n_gpt=16, n_bnd=2, n_eta=3, n_press=10, n_temp=5,
        dtype=np.float64,
    )
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=np.float64)
    bcs = LwBCs(sfc_emis=jnp.full((2, NCOL), 0.98, jnp.float64))
    tabs = build_df64_tables(lkp)
    win = compute_df64_window(lkp, atm)
    return lkp, atm, bcs, tabs, win


@pytest.mark.parametrize("eta_mode", ["continuous", "reference"])
def test_df64_vs_xla_f64(prob, eta_mode):
    lkp, atm, bcs, tabs, win = prob
    flux_ref, _ = jax.jit(
        lambda a, b: solve_lw(lkp, a, b, eta_node_mode=eta_mode)
    )(atm, bcs)
    up, dn = solve_lw_df64(
        lkp, tabs, atm, bcs, window=win, eta_node_mode=eta_mode
    )
    err_up = float(jnp.max(jnp.abs(up - flux_ref.flux_up)))
    err_dn = float(jnp.max(jnp.abs(dn - flux_ref.flux_dn)))
    # reference f64 tolerance (test/runtests.jl:21-23); interpret mode
    # carries the XLA:CPU contraction noise (~5e-6 measured) — still 20x in
    assert err_up <= 1e-4, err_up
    assert err_dn <= 1e-4, err_dn


def test_df64_window_guard(prob):
    lkp, atm, bcs, tabs, win = prob
    up, dn = solve_lw_df64(lkp, tabs, atm, bcs, window=16)
    assert bool(jnp.all(jnp.isnan(up))) and bool(jnp.all(jnp.isnan(dn)))


def test_df64_table_slices_reconstruct(prob):
    lkp, atm, bcs, tabs, win = prob
    f4 = np.asarray(tabs.fused4, np.float32).reshape(-1, 4, tabs.fused4.shape[1])
    hi = f4[:, 0].astype(np.float64) + f4[:, 1].astype(np.float64)
    lo = f4[:, 2].astype(np.float64) + f4[:, 3].astype(np.float64)
    got = hi + lo
    km = np.asarray(lkp.kmajor, np.float64) * 2.0 ** tabs.km_scale_pow
    ngpt, npp, nt, neta = km.shape
    import rrtmgp_tpu.ops.pallas_interp as pk

    npad = pk.gpt_pad(ngpt)
    rps = pk.rows_per_slab(nt)
    k4 = np.transpose(km, (1, 2, 3, 0))
    k4 = np.pad(k4, ((0, 0), (0, rps - nt), (0, 0), (0, npad - ngpt)))
    want = k4.reshape(npp * rps, neta, npad)
    got_km = got.reshape(npp * rps, neta, -1)[:, :, :npad]
    nz = want != 0
    rel = np.abs(got_km - want)[nz] / np.abs(want)[nz]
    # 4 bf16 slices cover ~32 bits wherever all slices stay bf16-normal;
    # tiny entries whose deep slices go subnormal degrade gracefully
    assert np.median(rel) < 2**-30
    assert rel.max() < 2**-22


def test_tau_minor_mxu_matches_gather_form(prob):
    """The df prologue's one-hot-extraction minor tau equals the gather
    formulation (compute_tau_minor) to f64 roundoff."""
    from rrtmgp_tpu.ops.gas_optics import (
        compute_eta_interp_bl,
        compute_pt_interp,
        compute_tau_minor,
    )
    from rrtmgp_tpu.ops.pallas_mega_df import _bl_to_bt, _tau_minor_f64_mxu

    lkp, atm, bcs, tabs, win = prob
    pt = compute_pt_interp(lkp, atm.p_lay, atm.t_lay)
    eta = _bl_to_bt(compute_eta_interp_bl(lkp, atm.vmr, pt, nbnd_out=8))
    a = compute_tau_minor(lkp, atm.vmr, atm.col_dry, atm.p_lay, atm.t_lay, pt, eta)
    b = _tau_minor_f64_mxu(lkp, atm.vmr, atm.col_dry, atm.p_lay, atm.t_lay, pt, eta)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-13, atol=0)


def test_df64_multi_angle(prob):
    """n_gauss_angles > 1: the df64 tier sums the kernel over the quadrature
    like the XLA path (angular.py weights)."""
    lkp, atm, bcs, tabs, win = prob
    flux_ref, _ = jax.jit(
        lambda a, b: solve_lw(lkp, a, b, n_gauss_angles=2)
    )(atm, bcs)
    up, dn = solve_lw_df64(lkp, tabs, atm, bcs, window=win, n_gauss_angles=2)
    assert float(jnp.max(jnp.abs(up - flux_ref.flux_up))) <= 1e-4
    assert float(jnp.max(jnp.abs(dn - flux_ref.flux_dn))) <= 1e-4
