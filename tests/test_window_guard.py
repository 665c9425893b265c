"""Force-mode window-safety tests.

``pallas_windowed="force"`` trusts a static table window computed at solver
init. Round-1 hole (VERDICT): if the host drifts p/t beyond the window, the
kernels read wrong table rows — silently wrong fluxes. The solves now carry
an in-jit guard (models.rrtmgp._window_guard_ok) that NaN-poisons the
outputs when the invariant is violated; these tests show detection.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rrtmgp_tpu as rt
from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
from rrtmgp_tpu.models.rrtmgp import solve_lw, solve_sw
from rrtmgp_tpu.ops.gas_optics_pallas import build_pallas_tables, compute_min_window
from rrtmgp_tpu.states import LwBCs, SwBCs

NCOL, NLAY, NGPT, NBND = 128, 6, 16, 2


@pytest.fixture(scope="module")
def setup():
    dtype = np.float32
    lkp = synthetic_gas_lookup(longwave=True, n_gpt=NGPT, n_bnd=NBND, dtype=dtype)
    lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=NGPT, n_bnd=NBND, seed=1, dtype=dtype)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype)
    bcs_lw = LwBCs(sfc_emis=jnp.full((NBND, NCOL), 0.98, jnp.float32))
    bcs_sw = SwBCs(
        cos_zenith=jnp.full((NCOL,), 0.6, jnp.float32),
        toa_flux=jnp.full((NCOL,), 1361.0, jnp.float32),
        sfc_alb_direct=jnp.full((NBND, NCOL), 0.2, jnp.float32),
        sfc_alb_diffuse=jnp.full((NBND, NCOL), 0.2, jnp.float32),
    )
    return lkp, lkp_sw, atm, bcs_lw, bcs_sw


def _drift(atm):
    """Blow up the per-layer (press, temp) row SPAN across columns — the
    quantity the window invariant bounds. Temperature spread alone stays
    within one pressure slab (absorbed by the margin); pressure spread moves
    whole 16-row slabs, so scale alternate columns' pressures x4 and drift
    temperatures +/- 120 K."""
    sign = jnp.where(jnp.arange(NCOL) % 2 == 0, 1.0, -1.0)
    t = jnp.clip(atm.t_lay + 120.0 * sign[None, :], 165.0, 350.0)
    p = atm.p_lay * jnp.where(sign[None, :] > 0, 4.0, 1.0)
    return dataclasses.replace(atm, t_lay=t, p_lay=p)


def test_mega_window_violation_is_loud(setup):
    """LW megakernel, force mode: a violated window gives all-NaN fluxes
    (detection), never silently wrong numbers; the valid window stays finite."""
    lkp, _, atm, bcs_lw, _ = setup
    tabs = build_pallas_tables(lkp)
    win = compute_min_window(lkp, atm, mega=True)
    f = jax.jit(
        lambda a, b: solve_lw(
            lkp, a, b, two_stream=True, pallas_tables=tabs,
            pallas_windowed="force", pallas_window=win,
        )[0]
    )
    flux = f(atm, bcs_lw)
    assert bool(jnp.all(jnp.isfinite(flux.flux_up)))

    bad = _drift(atm)
    assert compute_min_window(lkp, bad, mega=True) > win  # drift does violate
    flux_bad = f(bad, bcs_lw)
    assert bool(jnp.all(jnp.isnan(flux_bad.flux_up)))
    assert bool(jnp.all(jnp.isnan(flux_bad.flux_net)))


def test_sw_mega_window_violation_is_loud(setup):
    lkp, lkp_sw, atm, _, bcs_sw = setup
    tabs = build_pallas_tables(lkp_sw)
    win = compute_min_window(lkp_sw, atm, mega=True)
    f = jax.jit(
        lambda a, b: solve_sw(
            lkp_sw, a, b, pallas_tables=tabs,
            pallas_windowed="force", pallas_window=win,
        )[0]
    )
    assert bool(jnp.all(jnp.isfinite(f(atm, bcs_sw).flux_up)))
    flux_bad = f(_drift(atm), bcs_sw)
    assert bool(jnp.all(jnp.isnan(flux_bad.flux_up)))


def test_solver_level_detection(setup):
    """RRTMGPSolver end to end: host mutates the state beyond the init
    window (+margin); update_lw_fluxes returns NaN instead of wrong fluxes,
    and check_window() reports the violation."""
    lkp, lkp_sw, atm, bcs_lw, bcs_sw = setup
    lookups = rt.LookupBundle(lookup_lw=lkp, lookup_sw=lkp_sw)
    gp = rt.RRTMGPGridParams(nlay=NLAY, ncol=NCOL, dtype=jnp.float32)
    s = rt.RRTMGPSolver(
        gp, rt.ClearSkyRadiation(False), rt.RRTMGPParameters(),
        bcs_lw, bcs_sw, atm, lookups=lookups, use_pallas=True,
    )
    assert bool(jnp.all(jnp.isfinite(s.update_lw_fluxes().flux_up)))
    assert s.check_window() is True

    s.as_ = _drift(atm)
    assert s.check_window() is False
    flux = s.update_lw_fluxes()
    assert bool(jnp.all(jnp.isnan(flux.flux_up)))


def test_sw_ray_window_bitwise_and_guard(setup):
    """The windowed Rayleigh contraction (pallas_ray_window, interleaved
    hi/lo rows) selects the SAME table rows as the full-table dot — fluxes
    must match BITWISE — and a too-small window NaN-poisons like the
    q-window guard."""
    from rrtmgp_tpu.ops.gas_optics_pallas import compute_ray_window

    lkp, lkp_sw, atm, _, bcs_sw = setup
    tabs = build_pallas_tables(lkp_sw)
    win = compute_min_window(lkp_sw, atm, mega=True)
    rw = compute_ray_window(lkp_sw, atm)
    full = tabs.ray_ilv.shape[0]
    assert rw < full  # the synthetic atmosphere's per-layer spread is narrow

    def solve(ray_window):
        return solve_sw(
            lkp_sw, atm, bcs_sw, pallas_tables=tabs, pallas_windowed="force",
            pallas_window=win, pallas_ray_window=ray_window,
        )[0]

    f_win = jax.jit(solve, static_argnums=0)(rw)
    f_full = jax.jit(solve, static_argnums=0)(None)
    for a, b in zip(f_win, f_full):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # deliberately insufficient window: loud failure, not wrong numbers
    f_bad = jax.jit(solve, static_argnums=0)(8)
    assert bool(jnp.all(jnp.isnan(f_bad.flux_up)))
