"""Compiler-option helpers for the TPU kernel path.

The fused RTE sweep kernels hold (nlay, block, ngpt) f32 operand blocks in
VMEM; at the fast block sizes (128 columns) these exceed XLA's default 16 MiB
scoped-VMEM budget. v5e has 128 MiB of VMEM per core — raising the scoped
limit for the radiation jit lets the sweeps run at 8x larger blocks
(measured ~2.5x faster; the 60-step serial vertical recurrence amortizes its
latency over more vector registers per step).
"""

from __future__ import annotations

SCOPED_VMEM_KIB = 98304  # 96 MiB of the 128 MiB v5e VMEM


def tpu_compiler_options() -> dict | None:
    """compiler_options for jax.jit wrapping a TPU radiation solve.

    Returns None off-TPU (the CPU/interpret path must not receive
    TPU-specific XLA flags).
    """
    import jax

    if jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": SCOPED_VMEM_KIB}
    return None


def sweep_block_cols() -> int:
    """Recommended RTE-sweep column block: 128 on TPU when the enclosing jit
    uses tpu_compiler_options(); the conservative 16 fits the default scoped
    budget everywhere else."""
    import jax

    return 128 if jax.default_backend() == "tpu" else 16
