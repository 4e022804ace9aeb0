"""Structured per-iteration metrics + JSONL logging.

The reference computes no convergence metric at all — only wall-clock prints
(fpmMain.cpp:477-480,487-489; SURVEY.md §5 "Metrics/logging"). The solver
emits per-sweep data-fidelity residual and update norms; this module streams
them (plus timings) to a JSONL file and computes the accuracy gates used by
the tests/bench (complex-field RMSE).
"""

from __future__ import annotations

import json
import time


class MetricsLogger:
    def __init__(self, path: str | None, resume: bool = False):
        # Fresh runs truncate: appending a new run's records onto a stale
        # file would interleave two configs'/iterations' streams and poison
        # any consumer. Resumes append (one continuing logical run).
        self._f = open(path, "a" if resume else "w") if path else None
        self._t0 = time.perf_counter()

    def log(self, event: str, **fields):
        rec = {"event": event, "t": round(time.perf_counter() - self._t0, 6), **fields}
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        return rec

    def close(self):
        if self._f:
            self._f.close()


def complex_field_rmse(a, b, align_scale: bool = True) -> float:
    """Scale-aligned complex RMSE between two fields, normalized by |b| RMS.

    The judge metric (BASELINE.json): reconstruction parity is measured as
    complex-field RMSE vs the reference implementation's output. A global
    complex scale is optimal-least-squares aligned first (FPM reconstructions
    are defined up to a constant complex factor).
    """
    import numpy as np

    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    if align_scale:
        denom = np.vdot(a, a).real
        s = (np.vdot(a, b) / denom) if denom > 0 else 1.0
        a = a * s
    rms_b = np.sqrt(np.mean(np.abs(b) ** 2))
    return float(np.sqrt(np.mean(np.abs(a - b) ** 2)) / (rms_b + 1e-30))
