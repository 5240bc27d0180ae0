"""Tracing / profiling helpers (SURVEY.md section 5.1): wrap a region with
``trace(...)`` to capture an XProf/TensorBoard trace; the hot paths carry
``jax.named_scope`` annotations ("vecchia_bf", "pallas_suffstats",
"nuts_step", "chromatic_w", ...) so device time attributes to the kernels.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "Timer"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock section timer emitting (name, seconds) pairs."""

    def __init__(self):
        self.sections = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.sections[name] = self.sections.get(name, 0.0) + time.time() - t0

    def report(self) -> str:
        return " ".join(f"{k}={v:.2f}s" for k, v in self.sections.items())
