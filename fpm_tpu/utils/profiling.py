"""Phase timers + jax.profiler trace annotations.

The reference was profiled externally (gprof2dot → output.svg) and only had
manual ``clock()`` prints around load/iterate/total (fpmMain.cpp:44-46,
260-263, 477-480, 487-489; SURVEY.md §5). Here every pipeline phase is both
wall-clock timed and wrapped in a ``jax.profiler.TraceAnnotation`` so device
traces (xprof) attribute time to ingest/solve/output phases.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def phase(name: str, logger=None, echo: bool = True):
    """Time a pipeline phase; annotate it in device traces."""
    import jax.profiler

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    if logger is not None:
        logger.log("phase", name=name, seconds=round(dt, 6))
    if echo:
        # Mirrors the reference's per-phase prints, e.g.
        # "FP Processing Completed (Time: ... sec)" (fpmMain.cpp:489).
        print(f"[fpm-tpu] {name} completed (time: {dt:.3f} s)")


_TRACE_ACTIVE = False


def start_trace(log_dir: str) -> None:
    global _TRACE_ACTIVE
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    _TRACE_ACTIVE = True


def stop_trace() -> None:
    global _TRACE_ACTIVE
    import jax.profiler

    jax.profiler.stop_trace()
    _TRACE_ACTIVE = False


def stop_trace_if_active() -> None:
    """Flush an in-flight profiler trace, if any (idempotent).

    Called from the CLI's unwind paths so a --trace-dir run that exits
    through an error or a non-main code path still writes its profile
    instead of silently losing it."""
    if _TRACE_ACTIVE:
        stop_trace()
