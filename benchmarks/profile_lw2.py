"""Itemize the LW 2-stream clear-solve residual (VERDICT r4 weak #1).

The r4 ablation closed every in-kernel phase of the LW2 megakernel but left
a 24.0 ms "residual (XLA prologue + band-Planck kernels + per-block/grid
overhead)" — double LW noscat's 12.5 ms for near-identical prologue work.
This script profiles BOTH LW solves (clear, 32k cols) in one process and
prints every device event with its time, so the residual decomposes into:
  - megakernel self-time (in-kernel cost the trace sees directly)
  - band-Planck prologue kernels
  - XLA prologue fusions (pack concat, eta build, swapaxes/pads)
  - inter-kernel gaps (grid/launch overhead)

Usage: python benchmarks/profile_lw2.py [ncol]
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

NCOL = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
NLAY = 60
REPS = 5


def main():
    from rrtmgp_tpu.utils.compile import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
    from rrtmgp_tpu.models.rrtmgp import solve_lw
    from rrtmgp_tpu.states import LwBCs
    from rrtmgp_tpu.ops.gas_optics_pallas import (
        build_pallas_tables,
        compute_min_window,
        compute_planck_window,
    )
    from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

    dtype = np.float32
    lkp_lw = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype)
    bcs_lw = LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jnp.float32))
    tabs_lw = build_pallas_tables(lkp_lw)
    win_lw = compute_min_window(lkp_lw, atm, mega=True)
    plk_win = compute_planck_window(lkp_lw, atm)
    copts = tpu_compiler_options()
    scols = sweep_block_cols()

    def build(two_stream):
        return jax.jit(
            lambda a, b: solve_lw(
                lkp_lw, a, b, two_stream=two_stream,
                pallas_tables=tabs_lw, pallas_windowed="force",
                pallas_window=win_lw, pallas_sweep_cols=scols,
                pallas_planck_window=plk_win,
            )[0],
            compiler_options=copts,
        )

    f_ns = build(False)
    f_2s = build(True)
    jax.block_until_ready(f_ns(atm, bcs_lw))
    jax.block_until_ready(f_2s(atm, bcs_lw))

    # timed (readback-pinned) walls for context
    import time

    def wall(f):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            r = f(atm, bcs_lw)
            np.asarray(r.flux_up[0, :8])  # forced host readback
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    w_ns = wall(f_ns)
    w_2s = wall(f_2s)
    print(f"# wall (readback-pinned, median of {REPS}): "
          f"LW-noscat {w_ns*1e3:.2f} ms  LW-2stream {w_2s*1e3:.2f} ms")

    logdir = "/tmp/rrtmgp_prof_lw2"
    for tag, f in (("LW-noscat", f_ns), ("LW-2stream", f_2s)):
        jax.profiler.start_trace(logdir)
        for _ in range(3):
            r = f(atm, bcs_lw)
        jax.block_until_ready(r)
        jax.profiler.stop_trace()
        paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
        path = paths[-1]
        with gzip.open(path, "rt") as fh:
            trace = json.load(fh)
        events = trace["traceEvents"]
        pid_names = {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
        dev_pids = {
            p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()
        }
        per_kernel = defaultdict(float)
        spans = []
        total = 0.0
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in dev_pids:
                name = e.get("name", "?")
                dur = e.get("dur", 0) / 1e6
                per_kernel[name] += dur
                spans.append((e.get("ts", 0), e.get("ts", 0) + e.get("dur", 0)))
                total += dur
        # device-busy span vs sum-of-events: the difference is launch gaps
        spans.sort()
        busy = 0.0
        if spans:
            cur_s, cur_e = spans[0]
            for s, e2 in spans[1:]:
                if s > cur_e:
                    busy += cur_e - cur_s
                    cur_s, cur_e = s, e2
                else:
                    cur_e = max(cur_e, e2)
            busy += cur_e - cur_s
            busy /= 1e6
        print(f"\n## {tag}: sum(device events) {total/3*1e3:.2f} ms/iter, "
              f"device busy-span {busy/3*1e3:.2f} ms/iter, wall "
              f"{(w_ns if tag == 'LW-noscat' else w_2s)*1e3:.2f} ms")
        for name, t in sorted(per_kernel.items(), key=lambda kv: -kv[1])[:25]:
            print(f"{t/3*1e3:9.3f} ms/iter  {name}")


if __name__ == "__main__":
    main()
