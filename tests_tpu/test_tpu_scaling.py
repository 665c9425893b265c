"""shard_map wrapper cost guard on the real chip (SURVEY §7 step 6 proxy).

Real multi-chip hardware is unavailable here (one v5e behind a tunnel), so
the measurable piece of the >=90% scaling-efficiency target is the
shard_map(mesh=1) wrapper overhead: the solve has ZERO inter-device
communication (columns independent, tables replicated), so per-chip
efficiency at N chips = wrapper overhead + per-chip-batch throughput (both
local). This gates the wrapper at <2% of the unwrapped solve; the batch
curve is published by benchmarks/scaling_proxy.py in PARITY.md.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
from rrtmgp_tpu.models.rrtmgp import solve_lw
from rrtmgp_tpu.ops.gas_optics_pallas import build_pallas_tables, compute_min_window
from rrtmgp_tpu.parallel.sharding import make_column_mesh, shard_solve
from rrtmgp_tpu.states import LwBCs
from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

NCOL, NLAY = 8192, 60


def _timeit(fn, *args, n=10, reps=3):
    out = fn(*args)
    float(np.asarray(out.flux_up[0, 0]))  # forced host readback (CLAUDE.md)
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(np.asarray(out.flux_up[0, 0]))
        best.append((time.perf_counter() - t0) / n)
    return min(best)


def test_shard_map_mesh1_overhead_under_2pct():
    dtype = np.float32
    lkp = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype)
    bcs = LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jnp.float32))
    tabs = build_pallas_tables(lkp)
    win = compute_min_window(lkp, atm, mega=True)
    copts = tpu_compiler_options()
    scols = sweep_block_cols()

    def lw(a, b):
        return solve_lw(
            lkp, a, b, pallas_tables=tabs, pallas_windowed="force",
            pallas_window=win, pallas_sweep_cols=scols,
        )[0]

    f_plain = jax.jit(lw, compiler_options=copts)
    mesh = make_column_mesh(jax.devices()[:1])
    f_mesh = jax.jit(shard_solve(lw, mesh, NCOL), compiler_options=copts)

    t_plain = _timeit(f_plain, atm, bcs)
    t_mesh = _timeit(f_mesh, atm, bcs)
    ovh = (t_mesh - t_plain) / t_plain
    assert ovh < 0.02, (
        f"shard_map(mesh=1) overhead {100 * ovh:.2f}% >= 2% "
        f"(plain {t_plain * 1e3:.2f} ms, mesh {t_mesh * 1e3:.2f} ms)"
    )
