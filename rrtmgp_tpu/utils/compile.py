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


def enable_compile_cache(path: str = "/tmp/jax_compile_cache") -> None:
    """Point JAX's persistent compilation cache at `path` (idempotent).

    The benchmark/driver scripts call this so repeat runs skip the 1-5 min
    first-compile of the big fused programs (tests/conftest.py does the same
    for the test suite)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


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
