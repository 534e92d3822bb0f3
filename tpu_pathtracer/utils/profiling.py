"""Profiling hooks (the reference's only telemetry was a ``\\r`` span counter,
src/raytracer.h:647; SURVEY §5 asks for per-phase tracing here).

Wraps ``jax.profiler`` so a render can emit a perfetto-compatible trace, and
provides a lightweight phase timer that works on any backend.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA device trace (open with perfetto / tensorboard).

    Usage:  with device_trace("/tmp/rt-trace"):  render(...)
    """
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock per-phase accumulator (raygen / trace / shade / readback).

    XLA fuses the phases inside one jitted wavefront, so fine-grained device
    timing comes from ``device_trace``; this timer covers the host-visible
    structure (compile, per-pass device time, IO).
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def annotate(self, name: str):
        """Named trace region visible in the device profile."""
        import jax

        return jax.profiler.TraceAnnotation(name)

    def report(self, stream=sys.stderr) -> Dict[str, float]:
        out = {k: round(v, 4) for k, v in sorted(self.totals.items())}
        print(json.dumps({"phases_seconds": out}), file=stream)
        return out
