"""Tracing / observability — the analog of the reference's aux tooling.

The reference offers compile-time line tracing per module
(PE_LINE_TRACING pe.h:9-11, VAU_LINE_TRACING vecbuf_access_unit.h:8-10,
result-drain/sk0/cluster tracing) plus INFO phase logs in the hosts
(sw/host.cpp:146,232,300,358) and OpenCL queue profiling (:589).

Here:
  * phase logging with timestamps (``log_phase`` / ``phase`` context),
    toggled by HISPARSE_LOG;
  * kernel "line tracing" = running the Pallas kernel in interpreter mode
    with per-tile debug summaries, toggled by HISPARSE_TRACE (the interpret
    path is the csim analog, so tracing instruments it the same way the
    reference traces its csim builds);
  * the JAX profiler hooks for real-chip traces.
"""
from __future__ import annotations

import contextlib
import os
import sys
import time


def log_enabled() -> bool:
    return bool(int(os.environ.get("HISPARSE_LOG", "0")))


def trace_enabled() -> bool:
    return bool(int(os.environ.get("HISPARSE_TRACE", "0")))


def log_phase(msg: str) -> None:
    if log_enabled():
        print(f"[INFO {time.strftime('%H:%M:%S')}] {msg}",
              file=sys.stderr, flush=True)


@contextlib.contextmanager
def phase(name: str):
    log_phase(f"{name} ...")
    t0 = time.perf_counter()
    yield
    log_phase(f"{name} done in {time.perf_counter()-t0:.3f}s")


@contextlib.contextmanager
def device_profile(logdir: str):
    """JAX profiler capture (the CL_QUEUE_PROFILING_ENABLE analog)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
