"""Structured logging, counters and profiling hooks (SURVEY §5.1/§5.5).

The reference's observability was printf-under-_DEBUG plus an fps info string
(intel_dec/intel_dec.h:22-26, intel_dec.cpp:951-972). Here: a logger with a
single env-controlled level, named counters, per-stage timers, and an optional
jax.profiler trace context for TPU timelines.
"""

from __future__ import annotations

import contextlib
import logging
import os
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

_level = os.environ.get("JMX_LOG", "WARNING").upper()
logger = logging.getLogger("jmcodec_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s %(message)s"))
    logger.addHandler(_h)
logger.setLevel(getattr(logging, _level, logging.WARNING))


class Counters:
    """Process-wide named counters (frames, bytes, collective bytes, ...)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._c: Dict[str, float] = defaultdict(float)

    def add(self, name: str, value: float = 1) -> None:
        with self._lock:
            self._c[name] += value

    def get(self, name: str) -> float:
        return self._c.get(name, 0)

    def snapshot(self) -> Dict[str, float]:
        with self._lock:
            return dict(self._c)

    def report(self) -> str:
        return " ".join(f"{k}={v:g}" for k, v in sorted(self.snapshot().items()))


counters = Counters()


class StageTimers:
    """Accumulating per-stage wall timers (parse / transfer / recon / deblock
    / repack), the per-stage breakdown the reference never had."""

    def __init__(self):
        self._t: Dict[str, float] = defaultdict(float)
        self._n: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._t[name] += dt
            self._n[name] += 1

    def report(self) -> str:
        parts = []
        for k in sorted(self._t):
            n = max(1, self._n[k])
            parts.append(f"{k}: {self._t[k]*1000:.1f}ms/{self._n[k]}x "
                         f"({self._t[k]/n*1000:.2f}ms avg)")
        return " | ".join(parts)

    def snapshot(self) -> Dict[str, float]:
        """Accumulated seconds per stage (for before/after diffs in
        benches: the session fps numbers become attributable)."""
        return dict(self._t)


timers = StageTimers()


@contextlib.contextmanager
def device_trace(out_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace context (xprof-compatible); no-op if unavailable
    or JMX_TRACE unset and no out_dir given."""
    out = out_dir or os.environ.get("JMX_TRACE")
    if not out:
        yield
        return
    import jax

    with jax.profiler.trace(out):
        yield
