"""On-chip gate for the split-precision (double-f32) f64 LW tier.

The df64 megakernel (ops/pallas_mega_df.py) must reproduce the exact XLA
f64 path within the reference's f64 clear-sky tolerance — 1e-4 W/m^2 L-inf
(/root/reference/test/runtests.jl:21-23) — ON THE REAL CHIP: Mosaic's
compilation of the compensated (Dekker) arithmetic is the thing under test
(the XLA:CPU backend contracts the error-free transforms away — see
ops/df32.py; Mosaic measured exact at 2^-48 per op).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrtmgp_tpu.utils.compile import tpu_compiler_options

NCOL, NLAY = 512, 40


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_df64_lw_vs_xla_f64(x64):
    import sys

    sys.setrecursionlimit(100000)
    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
    from rrtmgp_tpu.models.rrtmgp import solve_lw
    from rrtmgp_tpu.ops.pallas_mega_df import (
        build_df64_tables,
        compute_df64_window,
        solve_lw_df64,
    )
    from rrtmgp_tpu.states import LwBCs

    lkp = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=np.float64)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=np.float64)
    bcs = LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jnp.float64))

    flux_ref, _ = jax.jit(lambda a, b: solve_lw(lkp, a, b))(atm, bcs)
    tabs = build_df64_tables(lkp)
    win = compute_df64_window(lkp, atm)
    up, dn = solve_lw_df64(lkp, tabs, atm, bcs, window=win)

    err_up = float(jnp.max(jnp.abs(up - flux_ref.flux_up)))
    err_dn = float(jnp.max(jnp.abs(dn - flux_ref.flux_dn)))
    print(f"df64-vs-f64 L-inf: up {err_up:.3e}, dn {err_dn:.3e} W/m^2")
    # the reference's f64 gate, with an order of margin: measured 1.8e-6 at
    # real spectral size (the tier's design floor is ~2^-30 relative)
    assert err_up <= 1e-4
    assert err_dn <= 1e-4
    assert err_up <= 1e-5  # regression guard at the measured level
    assert err_dn <= 1e-5


def test_df64_window_guard_poisons(x64):
    import sys

    sys.setrecursionlimit(100000)
    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
    from rrtmgp_tpu.ops.pallas_mega_df import (
        build_df64_tables,
        compute_df64_window,
        solve_lw_df64,
    )
    from rrtmgp_tpu.states import LwBCs

    lkp = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=np.float64)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=np.float64)
    bcs = LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jnp.float64))
    tabs = build_df64_tables(lkp)
    # a too-small window must NaN-poison, not silently misread table rows
    up, dn = solve_lw_df64(lkp, tabs, atm, bcs, window=32)
    assert bool(jnp.all(jnp.isnan(up)))


def test_solver_api_routes_f64_clear_lw_through_df64(x64):
    """RRTMGPSolver with f64 clear-sky + LW no-scat activates the df64 tier
    by default on TPU and reproduces the exact XLA f64 path (f64_kernel=
    False) within the reference tolerance, incl. non-128-aligned ncol."""
    import sys

    sys.setrecursionlimit(100000)
    import rrtmgp_tpu as rt
    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
    from rrtmgp_tpu.api import LookupBundle
    from rrtmgp_tpu.parameters import RRTMGPParameters

    NC = 200  # deliberately not 128-aligned
    lkp_lw = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=np.float64)
    lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=np.float64)
    atm = synthetic_atmosphere(ncol=NC, nlay=30, dtype=np.float64)
    lk = LookupBundle(lookup_lw=lkp_lw, lookup_sw=lkp_sw)
    gp = rt.RRTMGPGridParams(nlay=30, ncol=NC, dtype=jnp.float64)
    bl = rt.LwBCs(sfc_emis=jnp.full((16, NC), 0.98, jnp.float64))
    bs = rt.SwBCs(
        cos_zenith=jnp.full((NC,), 0.6, jnp.float64),
        toa_flux=jnp.full((NC,), 1361.0, jnp.float64),
        sfc_alb_direct=jnp.full((14, NC), 0.2, jnp.float64),
        sfc_alb_diffuse=jnp.full((14, NC), 0.2, jnp.float64),
    )
    P = RRTMGPParameters()
    kw = dict(two_stream_lw=False, use_pallas=False)
    s_df = rt.RRTMGPSolver(gp, rt.ClearSkyRadiation(False), P, bl, bs, atm,
                           lookups=lk, **kw)
    assert s_df._df64 is not None
    s_xla = rt.RRTMGPSolver(gp, rt.ClearSkyRadiation(False), P, bl, bs, atm,
                            lookups=lk, f64_kernel=False, **kw)
    assert s_xla._df64 is None
    f_df = s_df.update_lw_fluxes()
    f_x = s_xla.update_lw_fluxes()
    err = float(jnp.max(jnp.abs(f_df.flux_up - f_x.flux_up)))
    errd = float(jnp.max(jnp.abs(f_df.flux_dn - f_x.flux_dn)))
    print(f"solver-level df64 L-inf: up {err:.3e} dn {errd:.3e}")
    assert err <= 1e-5 and errd <= 1e-5
