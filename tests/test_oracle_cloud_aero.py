"""Independent scalar oracle for cloud and aerosol optics.

Companion to tests/test_oracle.py (gas optics + transport): per
(layer, column, band) pure-Python/NumPy f64 implementations of

- the cloud LUT interpolation in effective radius (liquid + ice x
  roughness) and the liquid/ice combination
  (spec: /root/reference/src/optics/cloud_optics.jl:145-213), and
- the MERRA aerosol species accumulation: size-bin search (first bin whose
  [lo, hi] contains the size, else the last), non-uniform RH interpolation
  with endpoint clamping, the 7 species families, masked by mass > 0
  (spec: /root/reference/src/optics/aerosol_optics.jl:121-326),

written as explicit loops sharing no vectorization structure with
rrtmgp_tpu.ops.cloud_optics / ops.aerosol_optics (whose one-hot-matmul
formulations these tests pin to ~1e-13).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrtmgp_tpu.data.synthetic import (
    synthetic_aerosol_lookup,
    synthetic_atmosphere,
    synthetic_cloud_lookup,
)
from rrtmgp_tpu.ops.aerosol_optics import aerosol_optics_bands
from rrtmgp_tpu.ops.cloud_optics import cloud_optics_bands

_EPS = float(np.finfo(np.float64).eps)
NCOL, NLAY, NBND = 6, 10, 3


def _interp_radius(table, re, path, lwr, upr, nsize):
    """Scalar liquid/ice LUT interpolation -> (tau, tau*ssa, tau*ssa*g)."""
    if path <= _EPS:
        return 0.0, 0.0, 0.0
    dr = (upr - lwr) / (nsize - 1)
    re_c = min(max(re, lwr), upr)
    loc = int(min(max(math.floor((re_c - lwr) / dr), 0), nsize - 2))
    fac = (re_c - lwr - loc * dr) / dr
    ext = (1.0 - fac) * table[0, loc] + fac * table[0, loc + 1]
    ssa = (1.0 - fac) * table[1, loc] + fac * table[1, loc + 1]
    asy = (1.0 - fac) * table[2, loc] + fac * table[2, loc + 1]
    tau = max(ext * path, 0.0)
    return tau, ssa * tau, asy * ssa * tau


def oracle_cloud_optics(lkp, cs):
    """(tau, ssa, g) per (nlay, ncol, nbnd), scalar loops."""
    liq = np.asarray(lkp.liq, np.float64)      # (3, nsize_liq, nbnd)
    ice = np.asarray(lkp.ice, np.float64)[:, :, :, cs.ice_rgh - 1]
    rel = np.asarray(cs.cld_r_eff_liq, np.float64)
    rei = np.asarray(cs.cld_r_eff_ice, np.float64)
    pl_ = np.asarray(cs.cld_path_liq, np.float64)
    pi_ = np.asarray(cs.cld_path_ice, np.float64)
    llwr, lupr = float(lkp.radliq_lwr), float(lkp.radliq_upr)
    ilwr, iupr = float(lkp.radice_lwr), float(lkp.radice_upr)
    nbnd = liq.shape[2]
    nlay, ncol = rel.shape
    tau = np.zeros((nlay, ncol, nbnd))
    ssa = np.zeros_like(tau)
    g = np.zeros_like(tau)
    for l in range(nlay):
        for c in range(ncol):
            for b in range(nbnd):
                tl, tls, tlsg = _interp_radius(
                    liq[:, :, b], rel[l, c], pl_[l, c], llwr, lupr, lkp.nsize_liq
                )
                ti, tis, tisg = _interp_radius(
                    ice[:, :, b], rei[l, c], pi_[l, c], ilwr, iupr, lkp.nsize_ice
                )
                t = tl + ti
                s = tls + tis
                g[l, c, b] = (tlsg + tisg) / max(_EPS, s)
                ssa[l, c, b] = s / max(_EPS, t)
                tau[l, c, b] = t
    return tau, ssa, g


def _size_bin(limits, size):
    """First bin whose [lo, hi] contains the size; else the last bin."""
    lo, hi = limits
    for i in range(lo.shape[0]):
        if lo[i] <= size <= hi[i]:
            return i
    return lo.shape[0] - 1


def _rh_weights(levels, rh):
    """Non-uniform 1-D interpolation with endpoint clamping."""
    n = levels.shape[0]
    idx = int(np.searchsorted(levels, rh, side="right"))
    loc = int(min(max(idx - 1, 0), n - 2))
    f = (rh - levels[loc]) / (levels[loc + 1] - levels[loc])
    return loc, min(max(f, 0.0), 1.0)


def oracle_aerosol_optics(lkp, aero, rel_hum):
    """(tau, tau*ssa, tau*ssa*g) per (nlay, ncol, nbnd), scalar loops over
    every MERRA species at every cell."""
    from rrtmgp_tpu.ops.aerosol_optics import (
        BC_IDX, BC_RH_IDX, DUST_IDXS, OC_IDX, OC_RH_IDX, SALT_IDXS, SULFATE_IDX,
    )

    g64 = lambda x: np.asarray(x, np.float64)
    mass, size, rh = g64(aero.aero_mass), g64(aero.aero_size), g64(rel_hum)
    limits = g64(lkp.size_bin_limits)
    levels = g64(lkp.rh_levels)
    dust, salt = g64(lkp.dust), g64(lkp.sea_salt)
    sulf, bcr, bc = g64(lkp.sulfate), g64(lkp.black_carbon_rh), g64(lkp.black_carbon)
    ocr, oc = g64(lkp.organic_carbon_rh), g64(lkp.organic_carbon)
    nbnd = dust.shape[-1]
    nlay, ncol = rh.shape
    out = np.zeros((3, nlay, ncol, nbnd))

    for l in range(nlay):
        for c in range(ncol):
            loc, f = _rh_weights(levels, rh[l, c])
            for b in range(nbnd):
                acc = [0.0, 0.0, 0.0]

                def add(ext, ssa, asy, m):
                    if m > 0.0:
                        t = m * ext
                        acc[0] += t
                        acc[1] += t * ssa
                        acc[2] += t * ssa * asy

                for i in DUST_IDXS:
                    k = _size_bin(limits, size[i, l, c])
                    add(dust[0, k, b], dust[1, k, b], dust[2, k, b], mass[i, l, c])
                for i in SALT_IDXS:
                    k = _size_bin(limits, size[i, l, c])
                    v = [
                        salt[v_, loc, k, b] * (1 - f) + salt[v_, loc + 1, k, b] * f
                        for v_ in range(3)
                    ]
                    add(v[0], v[1], v[2], mass[i, l, c])
                for tbl, i in ((sulf, SULFATE_IDX), (bcr, BC_RH_IDX), (ocr, OC_RH_IDX)):
                    v = [
                        tbl[v_, loc, b] * (1 - f) + tbl[v_, loc + 1, b] * f
                        for v_ in range(3)
                    ]
                    add(v[0], v[1], v[2], mass[i, l, c])
                for tbl, i in ((bc, BC_IDX), (oc, OC_IDX)):
                    add(tbl[0, b], tbl[1, b], tbl[2, b], mass[i, l, c])
                out[:, l, c, b] = acc
    return out[0], out[1], out[2]


@pytest.fixture(scope="module")
def atm():
    a = synthetic_atmosphere(
        ncol=NCOL, nlay=NLAY, with_clouds=True, with_aerosols=True
    )
    # randomize effective radii/paths off their constants so the radius
    # interpolation fractions are non-trivial (incl. out-of-range clamps)
    rng = np.random.default_rng(5)
    import dataclasses

    cs = a.cloud_state
    shape = np.asarray(cs.cld_r_eff_liq).shape
    mask_l = np.asarray(cs.cld_path_liq) > 0
    mask_i = np.asarray(cs.cld_path_ice) > 0
    cs = dataclasses.replace(
        cs,
        cld_r_eff_liq=jnp.asarray(np.where(mask_l, rng.uniform(1.0, 25.0, shape), 0.0)),
        cld_r_eff_ice=jnp.asarray(np.where(mask_i, rng.uniform(5.0, 100.0, shape), 0.0)),
        cld_path_liq=jnp.asarray(np.where(mask_l, rng.uniform(5.0, 80.0, shape), 0.0)),
        cld_path_ice=jnp.asarray(np.where(mask_i, rng.uniform(5.0, 100.0, shape), 0.0)),
    )
    ae = a.aerosol_state
    n_aero = np.asarray(ae.aero_mass).shape[0]
    mass = rng.uniform(0.0, 2e-5, (n_aero, NLAY, NCOL))
    mass[rng.random(mass.shape) < 0.3] = 0.0  # exercise the mass>0 masking
    sz = rng.uniform(0.05, 12.0, (n_aero, NLAY, NCOL))  # incl. out-of-bin sizes
    ae = dataclasses.replace(ae, aero_mass=jnp.asarray(mass), aero_size=jnp.asarray(sz))
    return dataclasses.replace(a, cloud_state=cs, aerosol_state=ae)


def test_oracle_cloud_optics_bands(atm):
    lkp = synthetic_cloud_lookup(n_bnd=NBND)
    tau, ssa, g = jax.jit(lambda c: cloud_optics_bands(lkp, c))(atm.cloud_state)
    tau_o, ssa_o, g_o = oracle_cloud_optics(lkp, atm.cloud_state)
    np.testing.assert_allclose(np.asarray(tau), tau_o, rtol=1e-13, atol=1e-300)
    np.testing.assert_allclose(np.asarray(ssa), ssa_o, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(g), g_o, rtol=1e-13)


def test_oracle_aerosol_optics_bands(atm):
    lkp = synthetic_aerosol_lookup(n_bnd=NBND)
    t, ts, tsg = jax.jit(
        lambda a, r: aerosol_optics_bands(lkp, a, r)
    )(atm.aerosol_state, atm.rel_hum)
    t_o, ts_o, tsg_o = oracle_aerosol_optics(lkp, atm.aerosol_state, atm.rel_hum)
    np.testing.assert_allclose(np.asarray(t), t_o, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(ts), ts_o, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(tsg), tsg_o, rtol=1e-13)


def test_oracle_aerosol_active_species_static_skip(atm):
    """active_species must be a pure trace-time skip: restricting to the
    species that actually carry mass leaves results identical; zeroing a
    species' mass equals excluding it."""
    lkp = synthetic_aerosol_lookup(n_bnd=NBND)
    full = aerosol_optics_bands(lkp, atm.aerosol_state, atm.rel_hum)
    subset = aerosol_optics_bands(
        lkp, atm.aerosol_state, atm.rel_hum, active_species=tuple(range(15))
    )
    for a, b in zip(full, subset):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # exclude dust1 (index 0) == zero its mass
    import dataclasses

    mass0 = np.asarray(atm.aerosol_state.aero_mass).copy()
    mass0[0] = 0.0
    ae0 = dataclasses.replace(atm.aerosol_state, aero_mass=jnp.asarray(mass0))
    a_zero = aerosol_optics_bands(lkp, ae0, atm.rel_hum)
    a_skip = aerosol_optics_bands(
        lkp, atm.aerosol_state, atm.rel_hum,
        active_species=tuple(range(1, 15)),
    )
    for a, b in zip(a_zero, a_skip):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-14)
