"""Machine-utilization accounting for the megakernel solves.

Two rooflines locate a solve on the hardware:

- **HBM roofline**: bytes that MUST cross HBM in the jitted program (inputs
  read once, outputs written once, resident tables DMAed once per launch,
  XLA-prologue intermediates written+read = 2x) divided by the chip's HBM
  bandwidth gives the bandwidth-bound minimum time.
- **MXU dot FLOPs**: the matmul work the kernel actually issues to the MXU,
  computed analytically from the same static shapes the kernel contracts
  (ops/pallas_mega._optics_phase): the per-layer windowed major dot, the m5
  band->g-point expand, the Rayleigh dot (SW), and the per-group minor-gas
  stacked + projection dots. VPU elementwise work is excluded, so the MFU
  derived from this count is a LOWER bound on MXU occupancy.

The reference ships no utilization accounting (its perf tier prints
BenchmarkTools medians only, /root/reference/perf/benchmark.jl:17-138);
this module exists so bench.py can headline honest machine-utilization
numbers instead of a throughput ratio against an assumed baseline.
"""

from __future__ import annotations

# TPU v5e (1 chip): HBM bandwidth and dense bf16 peak.
V5E_HBM_GBS = 819.0
V5E_BF16_TFLOPS = 197.0


def tree_bytes(tree) -> int:
    """Total array bytes in a pytree (shape/dtype structs count too)."""
    import jax

    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "size") and hasattr(x, "dtype")
    )


def solve_hbm_bytes(inputs, outputs, tables, intermediates) -> int:
    """HBM traffic of one jitted solve: inputs + outputs + resident tables
    (read once) + 2x the XLA-prologue intermediates (written then read)."""
    return (
        tree_bytes(inputs)
        + tree_bytes(outputs)
        + tree_bytes(tables)
        + 2 * tree_bytes(intermediates)
    )


def mega_mxu_flops(
    lkp, tabs, window: int, ncol: int, nlay: int, with_rayleigh: bool
) -> int:
    """MXU dot FLOPs of one megakernel solve's phase-1 optics loop.

    Mirrors ops/pallas_mega._optics_phase: every dot is M x K @ K x N with
    M = 2*ncol rows (the two temperature halves stacked), counted 2*M*K*N.
    Table K/N sizes come from the actual prepared-table shapes so padding is
    accounted exactly.
    """
    m = 2 * ncol

    # per-layer windowed major dot: w_maj (2B, window) @ k_win (window, W)
    flops = 2 * m * window * tabs.fused_ilv.shape[1]

    # m5 expand: cat5 (2B, 5*nbp) @ m5 (5*nbp, 2*npad)
    nbp = -(-lkp.n_bnd // 8) * 8
    npad = -(-lkp.n_gpt // 128) * 128
    flops += 2 * m * (5 * nbp) * (2 * npad)

    if with_rayleigh and tabs.ray_stack is not None:
        # w_ray (2B, Kr) @ ray_stack (Kr, Wr)
        flops += 2 * m * tabs.ray_stack.shape[0] * tabs.ray_stack.shape[1]

    for stk, proj in zip(tabs.minor_stack, tabs.minor_proj):
        # stacked interval dot: _stack_w(wm) (2B, Km) @ mk_stack (Km, wp)
        flops += 2 * m * stk.shape[0] * stk.shape[1]
        # eta-sum projection: [a_hi|a_lo] (2B, 2*wp) @ mk_proj (2*wp, P)
        flops += 2 * m * (2 * stk.shape[1]) * proj.shape[1]

    return flops * nlay
