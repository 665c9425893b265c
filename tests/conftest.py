"""Test configuration.

Tests run on the LOCAL CPU backend (see the root conftest.py for the axon
plugin escape). Float64 is enabled because the reference's correctness
oracles are defined for both f32 and f64
(/root/reference/test/runtests.jl:21-30).
"""

import os

if os.environ.get("JAX_PLATFORMS", "") in ("", "axon"):
    os.environ["JAX_PLATFORMS"] = "cpu"
# NOTE: do NOT force a multi-device CPU here — 8 virtual devices makes XLA-CPU
# compiles ~10x slower. Sharding tests spawn subprocesses with
# --xla_force_host_platform_device_count=8 themselves.

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: caching across pytest runs cuts suite time.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
