"""Structured stage logging + optional device profiling.

The reference logs with bare prints (SURVEY.md §6 metrics row); here every
stage reports timing through a logger, and ``--profile`` wraps the run in
``jax.profiler.trace`` dumping an xplane trace for tensorboard.
"""
from __future__ import annotations

import contextlib
import logging
import sys
import time

log = logging.getLogger("nucleoatac")
if not log.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter("[%(name)s %(asctime)s] %(message)s", "%H:%M:%S"))
    log.addHandler(_h)
    log.setLevel(logging.INFO)


@contextlib.contextmanager
def stage_timer(name: str):
    t0 = time.perf_counter()
    log.info("%s: start", name)
    try:
        yield
    finally:
        log.info("%s: done in %.2fs", name, time.perf_counter() - t0)


@contextlib.contextmanager
def maybe_profile(trace_dir: str | None):
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    log.info("profile trace written to %s", trace_dir)
