"""Profiling hooks: jax.profiler traces + blocking phase timers.

TPU-native replacement for the reference's unused profiler dev-deps
(SURVEY.md §5.1): Perfetto-compatible device traces via ``jax.profiler``,
and simple host-side phase timers that ``block_until_ready`` so device work
is actually attributed to the phase being measured.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a Perfetto/XPlane device trace under ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates blocking wall-time per named phase.

    Usage::

        timer = PhaseTimer()
        with timer.phase("forward"):
            out = step(...)   # timer blocks on `out` at phase exit
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        result = {}
        try:
            yield result
        finally:
            block_target = result.get("out", block_on)
            if block_target is not None:
                jax.block_until_ready(block_target)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} {total * 1e3:10.2f} ms total  {n:5d} calls")
        return "\n".join(lines)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in device traces (shows up in Perfetto)."""
    with jax.profiler.TraceAnnotation(name):
        yield
