"""TPU-only test suite configuration.

Run with ``RRTMGP_TPU_TESTS=1 python -m pytest tests_tpu/ -q`` — the env var
stops the root conftest from stripping the axon PJRT plugin, so the real TPU
chip stays reachable. Every test here skips unless the default backend is
TPU (the gated CI job provides one; see .github/workflows/ci.yml).

The TPU is a single exclusive chip behind a tunnel: never run two TPU
processes concurrently (CLAUDE.md).
"""

import pytest


def pytest_collection_modifyitems(config, items):
    import jax

    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="requires a real TPU backend")
    for item in items:
        item.add_marker(skip)


def pytest_configure(config):
    import jax

    # NOTE: x64 is NOT enabled globally — tracing the (deeply nested) f32
    # megakernels under enable_x64 exceeds Python's recursion limit. The f64
    # dispatch test scopes it with jax.experimental.enable_x64().
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
