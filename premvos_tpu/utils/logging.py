"""Structured logging + profiling hooks (SURVEY.md §5).

Reference observability is `Log.py` text files, tensorpack logging and bare
prints. Here: one stdlib logger plus a `block_until_ready` stage timer and
`jax.profiler` trace annotations for the frames/sec/chip north-star metric.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time

import jax

_logger = None


def get_logger(name: str = "premvos", logfile=None) -> logging.Logger:
    global _logger
    if _logger is not None:
        return _logger
    log = logging.getLogger(name)
    log.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    log.addHandler(sh)
    if logfile:
        fh = logging.FileHandler(logfile)
        fh.setFormatter(fmt)
        log.addHandler(fh)
    _logger = log
    return log


@contextlib.contextmanager
def stage_timer(name: str, results: dict | None = None):
    """Wall-clock a device computation (caller must return jax arrays which
    get block_until_ready'd on exit)."""
    holder = {}
    t0 = time.perf_counter()
    try:
        yield holder
    finally:
        if "out" in holder:
            jax.block_until_ready(holder["out"])
        dt = time.perf_counter() - t0
        if results is not None:
            results[name] = results.get(name, 0.0) + dt
        get_logger().info("stage %s: %.1f ms", name, dt * 1000)


@contextlib.contextmanager
def trace_annotation(name: str):
    """jax.profiler named scope (shows up in TensorBoard/XProf traces)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def log_json(**kv):
    get_logger().info(json.dumps(kv))
