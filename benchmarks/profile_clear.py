"""Profile one clear-sky LW+SW solve on TPU and print per-kernel device time.

Usage: python benchmarks/profile_clear.py [ncol]
Parses the jax.profiler trace (vm.trace.json.gz) and sums "X" duration
events per kernel name, split by LW/SW iteration markers.
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

NCOL = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
NLAY = 60


def main():
    from rrtmgp_tpu.utils.compile import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
    from rrtmgp_tpu.models.rrtmgp import solve_lw, solve_sw
    from rrtmgp_tpu.states import LwBCs, SwBCs
    from rrtmgp_tpu.ops.gas_optics_pallas import build_pallas_tables, compute_min_window, compute_planck_window, compute_ray_window
    from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

    dtype = np.float32
    lkp_lw = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=dtype)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype)
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
    plk_win = compute_planck_window(lkp_lw, atm)
    ray_win = compute_ray_window(lkp_sw, atm)
    copts = tpu_compiler_options()
    scols = sweep_block_cols()
    f_lw = jax.jit(
        lambda a, b: solve_lw(
            lkp_lw, a, b, pallas_tables=tabs_lw, pallas_windowed="force",
            pallas_window=win_lw, pallas_sweep_cols=scols,
            pallas_planck_window=plk_win,
        )[0],
        compiler_options=copts,
    )
    f_sw = jax.jit(
        lambda a, b: solve_sw(
            lkp_sw, a, b, pallas_tables=tabs_sw, pallas_windowed="force",
            pallas_window=win_sw, pallas_sweep_cols=scols,
            pallas_ray_window=ray_win,
        )[0],
        compiler_options=copts,
    )
    jax.block_until_ready(f_lw(atm, bcs_lw))
    jax.block_until_ready(f_sw(atm, bcs_sw))

    logdir = "/tmp/rrtmgp_prof"
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        r1 = f_lw(atm, bcs_lw)
        r2 = f_sw(atm, bcs_sw)
    jax.block_until_ready((r1, r2))
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device-lane events: pick pids whose thread/process names mention TPU/device
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    per_kernel = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e6  # us -> s
            per_kernel[name] += dur
            total += dur
    print(f"# trace {path}")
    print(f"# total device time over 3 LW+SW iters: {total*1e3:.2f} ms ({total/3*1e3:.2f} ms/iter)")
    for name, t in sorted(per_kernel.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{t/3*1e3:9.3f} ms/iter  {name}")


if __name__ == "__main__":
    main()
