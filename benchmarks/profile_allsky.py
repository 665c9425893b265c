"""Profile one all-sky (McICA clouds) LW+SW solve on TPU; per-kernel times."""

from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

_args = [a for a in sys.argv[1:] if a != "--aero"]
WITH_AERO = "--aero" in sys.argv[1:]
NCOL = int(_args[0]) if _args else 8192
NLAY = 60


def main():
    from rrtmgp_tpu.utils.compile import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.data.synthetic import (
        synthetic_atmosphere,
        synthetic_cloud_lookup,
        synthetic_gas_lookup,
    )
    from rrtmgp_tpu.models.rrtmgp import solve_lw, solve_sw
    from rrtmgp_tpu.ops.cloud_optics import build_cloud_mask_mcica
    from rrtmgp_tpu.states import LwBCs, SwBCs
    from rrtmgp_tpu.ops.gas_optics_pallas import build_pallas_tables, compute_min_window
    from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

    dtype = np.float32
    lkp_lw = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=dtype)
    lkp_cld_lw = synthetic_cloud_lookup(n_bnd=16, dtype=dtype)
    lkp_cld_sw = synthetic_cloud_lookup(n_bnd=14, seed=5, dtype=dtype)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype, with_clouds=True,
                               with_aerosols=WITH_AERO)
    lkp_aero_lw = lkp_aero_sw = None
    aero_species = None
    if WITH_AERO:
        from rrtmgp_tpu.data.synthetic import synthetic_aerosol_lookup

        lkp_aero_lw = synthetic_aerosol_lookup(n_bnd=16, dtype=dtype)
        lkp_aero_sw = synthetic_aerosol_lookup(n_bnd=14, seed=9, dtype=dtype)
        m = np.asarray(atm.aerosol_state.aero_mass)
        aero_species = tuple(int(i) for i in np.nonzero(m.any(axis=(1, 2)))[0])
        print(f"# active aerosol species: {aero_species}")
    bcs_lw = LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jnp.float32))
    bcs_sw = SwBCs(
        cos_zenith=jnp.full((NCOL,), 0.6, jnp.float32),
        toa_flux=jnp.full((NCOL,), 1361.0, jnp.float32),
        sfc_alb_direct=jnp.full((14, NCOL), 0.2, jnp.float32),
        sfc_alb_diffuse=jnp.full((14, NCOL), 0.2, jnp.float32),
    )
    tabs_lw = build_pallas_tables(lkp_lw)
    tabs_sw = build_pallas_tables(lkp_sw)
    win_lw = compute_min_window(lkp_lw, atm, mega=True)
    win_sw = compute_min_window(lkp_sw, atm, mega=True)
    copts = tpu_compiler_options()
    scols = sweep_block_cols()
    seed = jnp.asarray(0, jnp.int32)

    f_lw = jax.jit(
        lambda a, b, m: solve_lw(
            lkp_lw, a, b, two_stream=True, lkp_cld=lkp_cld_lw, cld_mask_seed=m,
            lkp_aero=lkp_aero_lw, aero_species=aero_species,
            pallas_tables=tabs_lw, pallas_windowed="force",
            pallas_window=win_lw, pallas_sweep_cols=scols,
        )[0],
        compiler_options=copts,
    )
    f_sw = jax.jit(
        lambda a, b, m: solve_sw(
            lkp_sw, a, b, lkp_cld=lkp_cld_sw, cld_mask_seed=m,
            lkp_aero=lkp_aero_sw, aero_species=aero_species,
            pallas_tables=tabs_sw, pallas_windowed="force",
            pallas_window=win_sw, pallas_sweep_cols=scols,
        )[0],
        compiler_options=copts,
    )
    jax.block_until_ready(f_lw(atm, bcs_lw, seed))
    jax.block_until_ready(f_sw(atm, bcs_sw, seed))

    import time
    t0 = time.perf_counter()
    for _ in range(5):
        r1 = f_lw(atm, bcs_lw, seed)
        r2 = f_sw(atm, bcs_sw, seed)
    jax.block_until_ready((r1, r2))
    print(f"# allsky LW+SW wall: {(time.perf_counter()-t0)/5*1e3:.2f} ms/iter")

    logdir = "/tmp/rrtmgp_prof_allsky"
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        r1 = f_lw(atm, bcs_lw, seed)
        r2 = f_sw(atm, bcs_sw, seed)
    jax.block_until_ready((r1, r2))
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    per_kernel = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            per_kernel[e.get("name", "?")] += e.get("dur", 0) / 1e6
    for name, t in sorted(per_kernel.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t/3*1e3:9.3f} ms/iter  {name}")


if __name__ == "__main__":
    main()
