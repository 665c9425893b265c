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


def algorithmic_flops(lkp, ncol: int, nlay: int, longwave: bool,
                      two_stream: bool) -> int:
    """PHYSICS-REQUIRED FLOPs of one whole solve — the numerator of
    ``mfu_algorithmic``.

    Counts only the arithmetic the RRTMGP algorithm itself demands per
    (layer, column, g-point), read off the reference's scalar kernels
    (/root/reference/src/optics/gas_optics.jl:166-335, src/rte/*.jl): the
    8-point trilinear major interpolation, minor-gas 2x2 interpolations and
    scaling laws, Rayleigh, Planck sources, transport recurrences, and the
    spectral flux reduction. One-hot gather lanes, band->g-point expand dots,
    and every form of padding are EXCLUDED — this is what a hypothetical
    perfectly-lean implementation would execute. Conventions (documented so
    the number is reproducible): mul/add/sub/div/select = 1 FLOP each,
    exp/sqrt = 1; per-(layer, column, band) weight precomputation is
    amortized to 0 against the ~16 g-points per band; minor-gas coverage
    uses min(lower-side, upper-side) interval-g-point counts — each layer
    runs exactly one side, so this is a strict lower bound regardless of
    where the tropopause falls. Result: a LOWER bound on required FLOPs,
    hence mfu_algorithmic is a lower bound on how well ANY implementation
    of this physics could use the chip at the measured time.
    """
    ngpt = lkp.n_gpt
    e = ncol * nlay * ngpt  # elements per spectral tensor

    # tau_major trilinear (interp3d, optics_utils.jl:123-149): 4 (press,temp)
    # corners x (eta lerp 3 + x combined weight 1 + accumulate 1) + col_dry
    f = 21 * e
    # minor gases (gas_optics.jl:255-306): per covered (gpt, interval):
    # eta lerp at 2 temp nodes (6) + temp combine (3) + x scaling + add (2);
    # coverage = min over tropo sides (each layer runs one side)
    cov_lower = sum(iv.gpt1 - iv.gpt0 for iv in lkp.minor_lower if iv.gas != 0)
    cov_upper = sum(iv.gpt1 - iv.gpt0 for iv in lkp.minor_upper if iv.gas != 0)
    f += 11 * ncol * nlay * min(cov_lower, cov_upper)

    if longwave:
        # planck fraction: trilinear without col_mix (4 x (3+1+1))
        f += 20 * e
        # sources (Optics.jl:228-248): lay = pfrac x band-Planck (1);
        # lev interior = sqrt + 2 mul (3); band 1-D interp amortized per band
        f += 4 * e
        if two_stream:
            # lw_2stream_coeffs (longwave2stream.jl:110-161): gammas 6,
            # k=sqrt 3, exp 2, rt 5, Rdif 3, Tdif 3, Toon sources ~14 => 36
            # + adding sweep (Shonk-Hogan, :182-254) ~18 + reduce 2
            f += (36 + 18 + 2) * e
        else:
            # Clough transport (longwave1scalar.jl:149-212): trans 2, fact 3,
            # src_dn/up 2x6, recurrences 2x2 + reduce 2
            f += (2 + 3 + 12 + 4 + 2) * e
    else:
        # Rayleigh (gas_optics.jl:324-335): 2 eta lerps 6 + temp combine 3 +
        # x (1+h2o)*col_dry 1; ssa = div + select
        f += (10 + 2) * e
        if two_stream:
            # sw_2stream_coeffs (shortwave2stream.jl:135-195): gammas 10,
            # a1/a2 6, k 4, exponentials 5, rt 5, Rdif/Tdif 6, Rdir/Tdir ~26,
            # clamps 4, direct sources 2 => ~68; direct beam cumulative-tau 4;
            # adding sweep ~18; reduce 3
            f += (68 + 4 + 18 + 3) * e
        else:
            f += (4 + 1) * e  # direct beam + reduce
    return f


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
