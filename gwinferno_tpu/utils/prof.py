"""Tracing and per-phase timing utilities.

The reference has no instrumentation at all (SURVEY.md S5: 'Tracing /
profiling: ABSENT').  This module provides the two tools a production
deployment needs: wall-clock phase timers with a report, and XLA/TPU profiler
trace capture around arbitrary code regions (viewable in TensorBoard /
Perfetto).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["Timer", "timed", "trace_capture"]


class Timer:
    """Accumulating named phase timer.

    >>> timer = Timer()
    >>> with timer("warmup"): ...
    >>> with timer("sampling"): ...
    >>> timer.report()
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name, block_until_ready_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_until_ready_on is not None:
                jax.block_until_ready(block_until_ready_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self, print_fn=print):
        total = sum(self.totals.values())
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            print_fn(f"{name:>24}: {t:9.3f}s  ({n}x, {t / max(n, 1):8.4f}s each, {100 * t / max(total, 1e-12):5.1f}%)")
        print_fn(f"{'total':>24}: {total:9.3f}s")


@contextlib.contextmanager
def timed(name, print_fn=print):
    """One-shot timer: ``with timed("compile"): ...``"""
    t0 = time.perf_counter()
    yield
    print_fn(f"[{name}] {time.perf_counter() - t0:.3f}s")


@contextlib.contextmanager
def trace_capture(logdir, enabled=True):
    """Capture an XLA profiler trace around a code region.

    View with ``tensorboard --logdir <logdir>`` (or load the Perfetto trace).
    No-op when ``enabled=False`` so call sites can leave it in place.
    """
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
