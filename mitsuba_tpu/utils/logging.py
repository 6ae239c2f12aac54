"""Logging + progress reporting + profiling scopes.

Reference aux subsystems (SURVEY §5):
- Logger/Appender/Formatter with severities (src/core/logger.cpp,
  appender.cpp, formatter.cpp) -> a thin layer over Python logging with
  the reference's severity names;
- ProgressReporter (src/core/progress.cpp, used by the optimization loop
  design_problem.py:553) -> terminal progress bar;
- ProfilerPhase/ScopedPhase ITT annotations (include/mitsuba/core/
  profiler.h:20,87) -> jax.named_scope + optional jax.profiler traces.
"""
from __future__ import annotations

import contextlib
import logging
import sys
import time

Trace = logging.DEBUG - 5
Debug = logging.DEBUG
Info = logging.INFO
Warn = logging.WARNING
Error = logging.ERROR

logging.addLevelName(Trace, "TRACE")
_logger = logging.getLogger("mitsuba_tpu")
if not _logger.handlers:
    h = logging.StreamHandler()
    h.setFormatter(logging.Formatter(
        "%(asctime)s %(levelname)s  [%(name)s] %(message)s", "%H:%M:%S"))
    _logger.addHandler(h)
    _logger.setLevel(Info)


def set_log_level(level):
    """mitsuba.set_log_level analogue."""
    _logger.setLevel(level)


def log(level, msg, *args):
    """Log(level, ...) analogue (logger.h Log macro)."""
    _logger.log(level, msg, *args)


class ProgressReporter:
    """Terminal progress bar (src/core/progress.cpp:62)."""

    def __init__(self, label: str = "Rendering", stream=None):
        self.label = label
        self.stream = stream or sys.stderr
        self.t0 = time.time()
        self.last = -1.0

    def update(self, fraction: float):
        fraction = min(max(float(fraction), 0.0), 1.0)
        if fraction - self.last < 0.01 and fraction < 1.0:
            return
        self.last = fraction
        width = 40
        filled = int(width * fraction)
        bar = "=" * filled + " " * (width - filled)
        elapsed = time.time() - self.t0
        eta = elapsed / max(fraction, 1e-6) * (1.0 - fraction)
        self.stream.write(
            f"\r{self.label}: [{bar}] {100 * fraction:5.1f}% "
            f"(elapsed {elapsed:5.1f}s, eta {eta:5.1f}s)")
        if fraction >= 1.0:
            self.stream.write("\n")
        self.stream.flush()


# ------------------------------------------------------------- profiling

@contextlib.contextmanager
def scoped_phase(name: str):
    """ScopedPhase analogue: annotates the XLA/HLO graph with a named
    scope (shows up in xprof traces) and logs wall time at Trace level."""
    import jax

    t0 = time.time()
    with jax.named_scope(name):
        yield
    log(Trace, "%s: %.3fs", name, time.time() - t0)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (the kernel-history / IR-dump
    analogue of dr.kernel_history + mitsuba -S)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
