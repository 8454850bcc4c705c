"""Performance tracing (reference: wall-clock timing only,
bpm_analysis.py:1727,1767-1768).  TPU equivalents: wall-clock stage timers
plus ``jax.profiler`` trace capture for kernel-level inspection."""
from __future__ import annotations

import contextlib
import logging
import time


@contextlib.contextmanager
def timed(name: str, results: dict | None = None):
    """Wall-clock stage timer (logs like the reference's per-run duration
    line)."""
    t0 = time.time()
    yield
    dt = time.time() - t0
    if results is not None:
        results[name] = dt
    logging.info(f"--- {name} finished in {dt:.2f} seconds. ---")


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
