"""Profiling and benchmarking utilities.

The TPU counterpart of the reference's perf harness
(/root/reference/perf/benchmark.jl BenchmarkTools trials + perf/flame.jl
ProfileCanvas flame graphs + nsys traces on the A100 CI): ``trace`` captures
a jax.profiler trace viewable in Perfetto/TensorBoard; ``benchmark`` runs a
block-until-ready timing loop and reports median/min like BenchmarkTools.
"""

from __future__ import annotations

import contextlib
import statistics
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rrtmgp_tpu_trace"):
    """Capture a profiler trace of the enclosed block (Perfetto-compatible)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def benchmark(fn, *args, n_iters: int = 10, warmup: int = 1, label: str = ""):
    """Median/min wall-time of ``fn(*args)`` with full device sync.

    Returns dict(label, median_s, min_s, n_iters). The analogue of the
    reference's BenchmarkTools @benchmark with CUDA.@sync
    (/root/reference/perf/benchmark.jl:26-31).
    """
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "label": label,
        "median_s": statistics.median(times),
        "min_s": min(times),
        "n_iters": n_iters,
    }


def device_memory_stats():
    """Per-device HBM stats when the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
