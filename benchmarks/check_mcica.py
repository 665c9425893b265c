"""TPU check: in-kernel McICA sampler statistics (run on real TPU).

1) cf in {0,1} must reproduce the external-mask megakernel fluxes exactly.
2) contiguous fractional cf block: expected max-random-overlap cover = max cf.
3) different seeds decorrelate.

(The CPU test suite covers the seed plumbing via the threefry fallback; this
script validates the TPU PRNG path itself.)
"""

import dataclasses
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from rrtmgp_tpu.utils.compile import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.data.synthetic import (
        synthetic_atmosphere, synthetic_cloud_lookup, synthetic_gas_lookup,
    )
    from rrtmgp_tpu.models.rrtmgp import solve_sw
    from rrtmgp_tpu.ops.cloud_optics import build_cloud_mask_mcica
    from rrtmgp_tpu.ops.gas_optics_pallas import build_pallas_tables, compute_min_window
    from rrtmgp_tpu.states import SwBCs
    from rrtmgp_tpu.utils.compile import tpu_compiler_options

    assert jax.default_backend() == "tpu", "run on TPU"
    ncol = 1024
    lkp = synthetic_gas_lookup(longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=np.float32)
    atm = synthetic_atmosphere(ncol=ncol, nlay=60, dtype=np.float32, with_clouds=True)
    lkp_cld = synthetic_cloud_lookup(n_bnd=14, seed=5, dtype=np.float32)
    bcs = SwBCs(
        cos_zenith=jnp.full((ncol,), 0.6, jnp.float32),
        toa_flux=jnp.full((ncol,), 1361.0, jnp.float32),
        sfc_alb_direct=jnp.full((14, ncol), 0.2, jnp.float32),
        sfc_alb_diffuse=jnp.full((14, ncol), 0.2, jnp.float32),
    )
    tabs = build_pallas_tables(lkp)
    win = compute_min_window(lkp, atm, mega=True)
    copts = tpu_compiler_options()
    com = dict(lkp_cld=lkp_cld, pallas_tables=tabs, pallas_windowed="force",
               pallas_window=win)
    f_ext = jax.jit(lambda a, b, m: solve_sw(lkp, a, b, cld_mask=m, **com),
                    compiler_options=copts)
    f_gen = jax.jit(lambda a, b, s: solve_sw(lkp, a, b, cld_mask_seed=s, **com),
                    compiler_options=copts)

    # (1) deterministic cf: exact equivalence
    mask = build_cloud_mask_mcica(jax.random.key(0), atm.cloud_state.cld_frac, 224)
    r1, _ = f_ext(atm, bcs, mask)
    r2, _ = f_gen(atm, bcs, jnp.asarray(5, jnp.int32))
    err = float(jnp.max(jnp.abs(r1.flux_dn - r2.flux_dn)))
    assert err == 0.0, err
    print("deterministic-cf equivalence: exact")

    # (2) fractional cf statistics
    cf = np.asarray(atm.cloud_state.cld_frac) * 0.4
    cs = dataclasses.replace(atm.cloud_state, cld_frac=jnp.asarray(cf, jnp.float32))
    atm2 = dataclasses.replace(atm, cloud_state=cs)
    _, d3 = f_gen(atm2, bcs, jnp.asarray(3, jnp.int32))
    _, d4 = f_gen(atm2, bcs, jnp.asarray(4, jnp.int32))
    cloudy = cf.max(axis=0) > 0
    cover = np.asarray(d3.cld_cover)
    assert abs(cover[cloudy].mean() - 0.4) < 0.02, cover[cloudy].mean()
    assert np.abs(cover[~cloudy]).max() == 0.0
    diff = np.abs(np.asarray(d4.cld_cover) - cover)[cloudy].mean()
    assert diff > 0.005, diff
    print(f"fractional-cf: mean cover {cover[cloudy].mean():.5f} (expect 0.4), "
          f"seed decorrelation {diff:.4f}")

    # (4) LW no-scat megakernel: same deterministic-cf exactness for its
    # in-kernel sampler (cloud composition added to lw_clear_mega)
    from rrtmgp_tpu.models.rrtmgp import solve_lw
    from rrtmgp_tpu.states import LwBCs

    lkp_lw = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=np.float32)
    lkp_cld_lw = synthetic_cloud_lookup(n_bnd=16, dtype=np.float32)
    tabs_lw = build_pallas_tables(lkp_lw)
    win_lw = compute_min_window(lkp_lw, atm, mega=True)
    bcs_lw = LwBCs(sfc_emis=jnp.full((16, ncol), 0.98, jnp.float32))
    com_lw = dict(lkp_cld=lkp_cld_lw, pallas_tables=tabs_lw,
                  pallas_windowed="force", pallas_window=win_lw)
    g_ext = jax.jit(lambda a, b, m: solve_lw(lkp_lw, a, b, cld_mask=m, **com_lw),
                    compiler_options=copts)
    g_gen = jax.jit(lambda a, b, s: solve_lw(lkp_lw, a, b, cld_mask_seed=s, **com_lw),
                    compiler_options=copts)
    mask_lw = build_cloud_mask_mcica(jax.random.key(0), atm.cloud_state.cld_frac, 256)
    l1, _ = g_ext(atm, bcs_lw, mask_lw)
    l2, _ = g_gen(atm, bcs_lw, jnp.asarray(5, jnp.int32))
    err = float(jnp.max(jnp.abs(l1.flux_dn - l2.flux_dn)))
    assert err == 0.0, err
    print("LW no-scat deterministic-cf equivalence: exact")
    print("OK")


if __name__ == "__main__":
    main()
