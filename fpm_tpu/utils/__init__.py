"""Auxiliary subsystems the reference lacks (SURVEY.md §5).

* :mod:`fpm_tpu.utils.outputs` — serialized results + the cvComplex
  ``showComplexImg`` display modes as PNG writers (the reference only opened
  GUI windows, fpmMain.cpp:495-497 — quirk 12: results were never written).
* :mod:`fpm_tpu.utils.metrics` — structured per-iteration JSONL metrics.
* :mod:`fpm_tpu.utils.checkpoint` — deterministic checkpoint/resume.
* :mod:`fpm_tpu.utils.profiling` — jax.profiler phase annotations + timers.
"""
