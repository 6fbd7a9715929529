"""Tracing / profiling utilities (SURVEY.md 5.1).

The reference's only instrumentation is one cudaEvent timer around the JBU
kernel (reference ACMMP.cu:1631-1648).  Here:

* :func:`trace` wraps a scope in a ``jax.profiler`` trace (viewable in
  TensorBoard / Perfetto),
* :func:`compiled_stats` reports XLA's own FLOP / byte estimates for a jitted
  function, the basis for speed-of-light accounting,
* :func:`time_jitted` measures steady-state wall clock with proper
  ``block_until_ready`` fencing and compile-time separation.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the scope (TensorBoard-compatible)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_stats(fn: Callable, *args, **kwargs) -> dict[str, Any]:
    """Lower+compile ``fn`` and return XLA's cost analysis (flops, bytes)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
    except Exception:
        cost = {}
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0] if cost else {}
    mem = {}
    try:
        analysis = compiled.memory_analysis()
        mem = {
            "output_bytes": getattr(analysis, "output_size_in_bytes", None),
            "temp_bytes": getattr(analysis, "temp_size_in_bytes", None),
            "argument_bytes": getattr(analysis, "argument_size_in_bytes", None),
        }
    except Exception:
        pass
    return {
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
        "transcendentals": cost.get("transcendentals"),
        **mem,
    }


def time_jitted(fn: Callable, args: tuple, *, reps: int = 3,
                warmup: int = 1) -> dict[str, float]:
    """Steady-state wall-clock of a jitted callable."""
    t0 = time.perf_counter()
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    compile_and_first = time.perf_counter() - t0

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return {
        "first_s": compile_and_first,
        "best_s": min(times),
        "mean_s": sum(times) / len(times),
    }
