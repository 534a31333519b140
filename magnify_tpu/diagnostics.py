"""Observability: stage timing, structured logging, and device profiling.

The reference has no tracing beyond tqdm progress bars (SURVEY.md section 5).
This framework ships:

* :func:`stage_timer` — wall-time + invocation counters per pipeline stage,
  printed (or returned) as structured records; enable globally with
  MAGNIFY_TPU_TRACE=1.
* :func:`profile` — context manager around ``jax.profiler`` trace capture
  for TensorBoard/Perfetto inspection of the device timeline.
* :func:`log` — a single stdlib-logging channel ("magnify_tpu") so hosts can
  route framework messages.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict

__all__ = ["log", "profile", "stage_timer", "stage_report", "reset_stages"]

log = logging.getLogger("magnify_tpu")

_stage_totals: dict[str, float] = defaultdict(float)
_stage_counts: dict[str, int] = defaultdict(int)


def _tracing() -> bool:
    return bool(os.environ.get("MAGNIFY_TPU_TRACE"))


@contextlib.contextmanager
def stage_timer(name: str):
    """Accumulate wall time for a named stage; logs when tracing is on."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _stage_totals[name] += dt
        _stage_counts[name] += 1
        if _tracing():
            log.info("stage %s: %.1f ms", name, dt * 1000)
            print(f"[magnify_tpu] {name}: {dt * 1000:.1f} ms", flush=True)


def stage_report() -> dict:
    """Accumulated per-stage totals: {name: {seconds, calls}}."""
    return {
        name: {"seconds": round(_stage_totals[name], 4),
               "calls": _stage_counts[name]}
        for name in _stage_totals
    }


def reset_stages() -> None:
    _stage_totals.clear()
    _stage_counts.clear()


@contextlib.contextmanager
def profile(log_dir: str = "/tmp/magnify_tpu_profile"):
    """Capture a jax.profiler device trace around a block of work."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)
