"""Profiling hooks — the TPU-native replacement for the reference's ad-hoc
performance measurement (google-benchmark harnesses + GetClock wall-clock
timing, SURVEY.md §5.1).

Three tools:

- :func:`trace` — context manager around ``jax.profiler.trace`` producing
  an xprof/TensorBoard trace directory of everything executed inside.
- :func:`annotate` — decorator adding a named ``TraceAnnotation`` so solver
  stages (convexify / QP / merit) are attributable inside device traces.
- :class:`WallTimer` — cheap nestable wall-clock section timer for host-side
  orchestration (the ``GetClock`` analog), with a printable report.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from functools import wraps
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/trajopt_tpu_trace",
          create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device profile of the enclosed block (xprof format)."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: Optional[str] = None):
    """Decorator: wrap fn in a named TraceAnnotation (shows up in xprof)."""
    def deco(fn):
        label = name or fn.__qualname__

        @wraps(fn)
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(label):
                return fn(*args, **kwargs)
        return wrapped
    return deco


class WallTimer:
    """Nestable host-side section timer.

    >>> t = WallTimer()
    >>> with t.section("solve"):
    ...     ...
    >>> print(t.report())
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        rows = [f"{'section':<24}{'calls':>8}{'total_s':>12}{'mean_ms':>12}"]
        for k in sorted(self.totals, key=self.totals.get, reverse=True):
            tot, n = self.totals[k], self.counts[k]
            rows.append(f"{k:<24}{n:>8}{tot:>12.4f}{1e3 * tot / n:>12.3f}")
        return "\n".join(rows)
