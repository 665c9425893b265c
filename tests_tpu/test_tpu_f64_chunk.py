"""f64 at DYAMOND-order ncol on the real chip: auto-chunking must make it run.

VERDICT round 3 #5: the f64 XLA path materializes the (nlay, ncol, ngpt)
spectral tensors — at 8,192 columns x 60 layers x 256 g-points that is ~33 GB
of requested HBM (PARITY.md), an OOM on a 16 GB v5e. RRTMGPSolver now
auto-chunks f64 solves over columns (api.py), so the same construction the
reference runs first-class (/root/reference/test/runtests.jl:27-30) works
unmodified. This test would OOM without the auto-chunk.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

NLAY = 60
NCOL = 8192


def test_f64_8k_cols_auto_chunked_solve():
    jax.config.update("jax_enable_x64", True)
    try:
        _body()
    finally:
        jax.config.update("jax_enable_x64", False)


def _body():
    import rrtmgp_tpu as rt
    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup

    lookups = rt.LookupBundle(
        lookup_lw=synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16),
        lookup_sw=synthetic_gas_lookup(longwave=False, n_gpt=224, n_bnd=14, seed=1),
    )
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=np.float64)
    bcs_lw = rt.LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jnp.float64))
    bcs_sw = rt.SwBCs(
        cos_zenith=jnp.full((NCOL,), 0.6, jnp.float64),
        toa_flux=jnp.full((NCOL,), 1361.0, jnp.float64),
        sfc_alb_direct=jnp.full((14, NCOL), 0.2, jnp.float64),
        sfc_alb_diffuse=jnp.full((14, NCOL), 0.2, jnp.float64),
    )
    gp = rt.RRTMGPGridParams(nlay=NLAY, ncol=NCOL, dtype=jnp.float64)
    with pytest.warns(UserWarning, match="auto-chunking"):
        s = rt.RRTMGPSolver(
            gp, rt.ClearSkyRadiation(False), rt.RRTMGPParameters(),
            bcs_lw, bcs_sw, atm, lookups=lookups,
        )
    # 8 GB default budget, ~4.2 MB/col at this spectral size -> cmax ~1914
    # -> chunk = largest power of two <= cmax = 1024 (divides 8192)
    assert s.auto_chunk == 1024

    flw = s.update_lw_fluxes()
    fsw = s.update_sw_fluxes()
    assert flw.flux_up.dtype == jnp.float64
    assert bool(jnp.all(jnp.isfinite(flw.flux_up)))
    assert bool(jnp.all(jnp.isfinite(fsw.flux_up)))

    # chunked result equals a direct solve of the first chunk's columns
    # (clear-sky columns are independent)
    c = s.auto_chunk
    sl = lambda t: jax.tree_util.tree_map(
        lambda x: x[..., :c]
        if hasattr(x, "ndim") and x.ndim > 0 and x.shape[-1] == NCOL
        else x,
        t,
    )
    gp1 = rt.RRTMGPGridParams(nlay=NLAY, ncol=c, dtype=jnp.float64)
    s1 = rt.RRTMGPSolver(
        gp1, rt.ClearSkyRadiation(False), rt.RRTMGPParameters(),
        sl(bcs_lw), sl(bcs_sw), sl(atm), lookups=lookups,
    )
    assert s1.auto_chunk is None
    f1 = s1.update_lw_fluxes()
    np.testing.assert_allclose(
        np.asarray(flw.flux_up[:, :c]), np.asarray(f1.flux_up), rtol=1e-12
    )
