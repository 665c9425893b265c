"""Complete megakernel ablation: EVERY phase of all three solvers (TPU).

VERDICT round 3 #1: the round-3 ablation named and measured every optics
piece but left "transport + sweeps + stores + rest ~18 ms" as one line.
This driver stubs each kernel phase (MEGA_ABLATE trace-time hooks in
ops/pallas_mega.py) and reports the time delta vs the unablated solve:

  optics:      wbuild, major, ray (SW), minors, eta
  post-optics: planck, transport (LW noscat), coeffs (2-stream),
               beam (SW), adding, stores, upsweep/downsweep, reduce

Deltas are NOT exactly additive (Mosaic reschedules each variant and a
skipped store lets dead code vanish upstream), but they bound each phase's
marginal cost. Results + the counted ops->cycles floor go in PARITY.md.

Usage: python benchmarks/ablate_mega.py [lw|lw2|sw ...]  (default: all)

Modes (round 5):
  --cumulative   ablate pieces CUMULATIVELY (p1, p1+p2, ...) so the stair
                 deltas form an ADDITIVE decomposition of the kernel time.
                 Single-piece deltas under-count overlapped phases: the r5
                 trace showed lw2_mega self-time 67.7 ms vs a 52.5 ms sum of
                 single-piece deltas — the missing 15 ms is cost that only
                 moves when several phases leave together.
  --probe-eta    VERDICT r4 weak #2: measure the eta phase's marginal cost
                 inside the FULL kernel vs inside a reduced kernel
                 (coeffs/adding/transport ablated). If eta returns to its
                 8.2 ms issue floor in the reduced kernel, the 1.3-1.5x
                 ratios in LW2/SW are register/scheduling pressure from the
                 bigger live set, not the eta code path.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

NCOL = int(os.environ.get("ABLATE_NCOL", "32768"))
NLAY = 60
ITERS = 10
REPS = 3

PIECES = {
    "lw": ["wbuild", "major", "minors", "eta", "planck", "transport",
           "stores", "upsweep", "reduce"],
    "lw2": ["wbuild", "major", "minors", "eta", "planck", "coeffs",
            "adding", "stores", "downsweep", "reduce"],
    "sw": ["wbuild", "major", "ray", "minors", "eta", "coeffs", "beam",
           "stores", "adding", "downsweep", "reduce"],
}


def _clear_mega_caches():
    """The megakernel drivers are module-level jitted callables; MEGA_ABLATE
    is read at TRACE time, so their traces must be dropped between settings."""
    from rrtmgp_tpu.ops import pallas_mega as pm

    for fn in (pm.lw_clear_mega, pm.lw2_mega, pm.sw_clear_mega):
        fn.clear_cache()


def timeit(fn, *args):
    import jax

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf.reshape(-1)[0]))  # readback pins the clock
    best = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf.reshape(-1)[0]))
        best.append((time.perf_counter() - t0) / ITERS)
    return min(best)


def main() -> None:
    from rrtmgp_tpu.utils.compile import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
    from rrtmgp_tpu.models.rrtmgp import solve_lw, solve_sw
    from rrtmgp_tpu.ops.gas_optics_pallas import (
        build_pallas_tables,
        compute_min_window,
        compute_planck_window,
        compute_ray_window,
    )
    from rrtmgp_tpu.states import LwBCs, SwBCs
    from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

    assert jax.default_backend() == "tpu", "run on TPU"
    solvers = [a for a in sys.argv[1:] if a in PIECES] or list(PIECES)

    dtype = np.float32
    lkp = synthetic_gas_lookup(longwave=True, n_gpt=256, n_bnd=16, dtype=dtype)
    lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=224, n_bnd=14, seed=1, dtype=dtype)
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype)
    tabs = build_pallas_tables(lkp)
    tabs_sw = build_pallas_tables(lkp_sw)
    win = compute_min_window(lkp, atm, mega=True)
    win_sw = compute_min_window(lkp_sw, atm, mega=True)
    plk_win = compute_planck_window(lkp, atm)
    ray_win = compute_ray_window(lkp_sw, atm)
    bcs = LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jnp.float32))
    bcs_sw = SwBCs(
        cos_zenith=jnp.full((NCOL,), 0.6, jnp.float32),
        toa_flux=jnp.full((NCOL,), 1361.0, jnp.float32),
        sfc_alb_direct=jnp.full((14, NCOL), 0.2, jnp.float32),
        sfc_alb_diffuse=jnp.full((14, NCOL), 0.2, jnp.float32),
    )
    copts = tpu_compiler_options()
    scols = sweep_block_cols()

    def make(solver):
        if solver == "lw":
            return lambda a, b: solve_lw(
                lkp, a, b, pallas_tables=tabs, pallas_windowed="force",
                pallas_window=win, pallas_sweep_cols=scols,
                pallas_planck_window=plk_win,
            )[0]
        if solver == "lw2":
            return lambda a, b: solve_lw(
                lkp, a, b, two_stream=True, pallas_tables=tabs,
                pallas_windowed="force", pallas_window=win,
                pallas_sweep_cols=scols, pallas_planck_window=plk_win,
            )[0]
        return lambda a, b: solve_sw(
            lkp_sw, a, b, pallas_tables=tabs_sw, pallas_windowed="force",
            pallas_window=win_sw, pallas_sweep_cols=scols,
            pallas_ray_window=ray_win,
        )[0]

    cumulative = "--cumulative" in sys.argv[1:]
    probe_eta = "--probe-eta" in sys.argv[1:]

    def run(solver, b, ablate: str) -> float:
        os.environ["MEGA_ABLATE"] = ablate
        _clear_mega_caches()
        return timeit(jax.jit(make(solver), compiler_options=copts), atm, b)

    for solver in solvers:
        b = bcs_sw if solver == "sw" else bcs
        t_base = run(solver, b, "")
        print(f"\n== {solver}: baseline {t_base*1e3:7.2f} ms "
              f"({NCOL/t_base/1e3:.1f}k cols/s) ==", flush=True)
        if probe_eta:
            # reduced kernels: serial-carry phases gone but the optics
            # OUTPUTS stay consumed (ablating the stores/beam would let
            # Mosaic dead-code the whole optics pipeline — measured: SW
            # with stores+beam ablated collapses to 8.5 ms, optics gone).
            # CRITICAL DCE subtlety: ablating "planck" in the LW kernels
            # dead-codes the p_acc (planck-fraction) half of the eta hat
            # loop — an eta marginal measured with planck ablated covers
            # only the t_acc chain. Probe BOTH ways to separate per-chain
            # cost from kernel-specific scheduling.
            ctxs = {
                "lw": [("planck live", "transport,upsweep,reduce"),
                       ("planck dead", "transport,planck,upsweep,reduce")],
                "lw2": [("planck live", "coeffs,adding,downsweep,reduce"),
                        ("planck dead", "coeffs,adding,downsweep,reduce,planck")],
                "sw": [("both chains", "coeffs,adding,downsweep,reduce")],
            }[solver]
            t_full = run(solver, b, "eta")
            print(f"   eta marginal in FULL kernel:    "
                  f"{1e3*(t_base-t_full):+6.2f} ms", flush=True)
            for tag, ctx in ctxs:
                t_red = run(solver, b, ctx)
                t_red_noeta = run(solver, b, ctx + ",eta")
                print(f"   eta marginal, reduced [{tag}] "
                      f"(-{ctx}): {1e3*(t_red-t_red_noeta):+6.2f} ms "
                      f"({t_red*1e3:.2f} -> {t_red_noeta*1e3:.2f})",
                      flush=True)
            continue
        if cumulative:
            prev = t_base
            acc: list[str] = []
            for piece in PIECES[solver]:
                acc.append(piece)
                t = run(solver, b, ",".join(acc))
                print(f"   -{'+'.join(acc):55s}: {t*1e3:7.2f} ms  "
                      f"stair {1e3*(prev-t):+6.2f} ms", flush=True)
                prev = t
            print(f"   cumulative total removed: {1e3*(t_base-prev):+6.2f} ms "
                  f"(floor left: {prev*1e3:.2f} ms)", flush=True)
            continue
        for piece in PIECES[solver]:
            t = run(solver, b, piece)
            print(f"   -{piece:10s}: {t*1e3:7.2f} ms   delta {1e3*(t_base-t):+6.2f} ms"
                  f"  ({100*(t_base-t)/t_base:5.1f}%)", flush=True)
    os.environ["MEGA_ABLATE"] = ""


if __name__ == "__main__":
    main()
