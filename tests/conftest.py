"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the TPU analogue of the reference's
CPU-device test path, per SURVEY.md section 4): sharding semantics are
validated without pod hardware. Float64 is enabled because the reference's
correctness oracles are defined for both f32 and f64
(/root/reference/test/runtests.jl:21-30).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_enable_x64", True)
