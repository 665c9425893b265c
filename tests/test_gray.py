"""Gray-atmosphere correctness tests.

Mirrors the reference test strategy (/root/reference/test/gray_atm_utils.jl):
- LW radiative equilibrium converges to the analytic temperature profile
  within 0.1 K (lines 47, 113)
- SW direct beam matches the exact Beer-Lambert solution to rel 1e-3
  (lines 182-195)
These oracles need no data files.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrtmgp_tpu import (
    GrayOpticalThicknessOGorman2008,
    GrayOpticalThicknessSchneider2004,
    RRTMGPParameters,
    gray_lw_equilibrium,
    setup_gray_as_pr_grid,
    solve_gray_lw,
    solve_gray_sw,
)

PARAMS = RRTMGPParameters()
NLAY = 60
P0 = 100000.0
PE = 9000.0


def _gray_state(dtype, ncol=9, otp=None):
    lat = jnp.linspace(-90.0, 90.0, ncol) if ncol > 1 else jnp.zeros((1,))
    otp = otp or GrayOpticalThicknessSchneider2004()
    return setup_gray_as_pr_grid(NLAY, lat, P0, PE, otp, PARAMS, dtype=dtype)


@pytest.mark.parametrize(
    "dtype,two_stream",
    [
        (jnp.float64, False),
        (jnp.float64, True),
        (jnp.float32, False),  # f32 smoke; reference gates only f64 (test/gray_atm.jl)
    ],
)
def test_gray_lw_equilibrium(dtype, two_stream):
    ncol = 9
    as_ = _gray_state(dtype, ncol)
    sfc_emis = jnp.ones((ncol,), dtype)

    eq = jax.jit(
        lambda a: gray_lw_equilibrium(
            a, sfc_emis, PARAMS, two_stream=two_stream,
            flux_grad_tol=1e-5 if dtype == jnp.float64 else 1e-4,
        )
    )
    atm, T_ex_lev, err, steps = eq(as_)
    t_error = float(jnp.max(jnp.abs(T_ex_lev - atm.t_lev)))
    assert np.isfinite(t_error)
    # Reference gates 0.1 K at f64 only (/root/reference/test/gray_atm_utils.jl:47;
    # test/gray_atm.jl runs FT=Float64 in CI). f32 cannot converge the 1e-5 W/m^2
    # flux gradient (below f32 flux resolution) so it runs with a 1e-4 gradient
    # tolerance; measured converged error is 0.060 K — gate at 2.5x margin.
    tol = 0.1 if dtype == jnp.float64 else 0.15
    assert t_error < tol, f"t_error={t_error}, steps={int(steps)}, err={float(err)}"


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.float32])
@pytest.mark.parametrize("two_stream", [False, True])
def test_gray_sw_exact(dtype, two_stream):
    ncol = 8
    otp = GrayOpticalThicknessOGorman2008()
    as_ = _gray_state(dtype, ncol, otp)
    mu0 = jnp.full((ncol,), np.cos(np.deg2rad(52.95)), dtype)
    toa_flux = jnp.full((ncol,), 1407.679, dtype)
    alb = jnp.full((ncol,), 0.1, dtype)

    flux_up, flux_dn, flux_dn_dir, flux_net = jax.jit(
        lambda a: solve_gray_sw(a, mu0, toa_flux, alb, alb, two_stream=two_stream)
    )(as_)

    from rrtmgp_tpu.models.gray import gray_optics_sw

    tau = gray_optics_sw(as_)
    ot_tot = jnp.sum(tau[:, 0]) / mu0[0]
    exact = toa_flux[0] * mu0[0] * jnp.exp(-ot_tot)
    rel_err = float(jnp.abs(flux_dn_dir[0, 0] - exact) / exact)
    # reference tolerance: 1e-3 (/root/reference/test/gray_atm_utils.jl:185)
    assert rel_err < 1e-3, rel_err


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.float32])
def test_gray_sw_night_columns_zero(dtype):
    """mu0 <= 0 columns must yield exactly zero fluxes (no NaN/Inf).

    Ref edge cases: /root/reference/test/cos_zenith_edge_cases.jl.
    """
    ncol = 4
    otp = GrayOpticalThicknessOGorman2008()
    as_ = _gray_state(dtype, ncol, otp)
    mu0 = jnp.asarray([0.5, 0.0, -0.3, 1e-30], dtype)
    toa_flux = jnp.full((ncol,), 1361.0, dtype)
    alb = jnp.full((ncol,), 0.1, dtype)

    for two_stream in (False, True):
        flux_up, flux_dn, flux_dn_dir, flux_net = solve_gray_sw(
            as_, mu0, toa_flux, alb, alb, two_stream=two_stream
        )
        for f in (flux_up, flux_dn, flux_dn_dir, flux_net):
            assert bool(jnp.all(jnp.isfinite(f)))
            # night columns exactly zero
            assert bool(jnp.all(f[:, 1:3] == 0.0))


def test_gray_lw_flux_balance_f64():
    """At equilibrium-free single solve: TOA flux_dn == 0, surface up = sigma*T^4."""
    as_ = _gray_state(jnp.float64, 5)
    sfc_emis = jnp.ones((5,), jnp.float64)
    flux_up, flux_dn, flux_net = solve_gray_lw(as_, sfc_emis, PARAMS)
    assert float(jnp.max(jnp.abs(flux_dn[-1]))) == 0.0
    sigma_t4 = PARAMS.Stefan * as_.t_sfc**4
    np.testing.assert_allclose(np.asarray(flux_up[0]), np.asarray(sigma_t4), rtol=1e-12)


def test_lw_noscat_vs_2stream_consistency():
    """For a pure-absorption atmosphere the two LW solvers should agree closely."""
    as_ = _gray_state(jnp.float64, 9)
    sfc_emis = jnp.ones((9,), jnp.float64)
    up1, dn1, _ = solve_gray_lw(as_, sfc_emis, PARAMS, two_stream=False)
    up2, dn2, _ = solve_gray_lw(as_, sfc_emis, PARAMS, two_stream=True)
    # Consistency check, not an exactness oracle: the two solvers use
    # different angular closures (Gauss-Jacobi secant D=1.66 vs the
    # two-stream diffusivity), so they agree only to O(tau^2) differences.
    # Measured gap on this profile: up 0.62 / dn 0.77 W/m^2; gate at ~2x.
    assert float(jnp.max(jnp.abs(up1 - up2))) < 1.5
    assert float(jnp.max(jnp.abs(dn1 - dn2))) < 1.5
