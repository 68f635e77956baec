"""Profiling and tracing utilities.

The reference's observability is metric-shaped only — per-query wall-clock ms
and token usage (SURVEY.md §5). This framework adds real device profiling as
a first-class improvement:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  Perfetto/XPlane trace directory viewable in TensorBoard/xprof;
- :func:`annotate` — named TraceAnnotation for host-side spans;
- :class:`KernelTimer` — sustained-throughput timing of a jitted callable
  (loop inside jit, honest host readback — the pattern the TPU tunnel
  requires, see .claude/skills/verify);
- :class:`SpanRecorder` — lightweight in-process span log (start/stop named
  sections with wall-clock durations) exported as JSON.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a JAX profiler trace: ``with trace('/tmp/trace'): step()``."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named span visible in profiler traces."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class KernelTimer:
    """Honest sustained timing of a jitted fn over the remote-TPU tunnel:
    run REPS iterations inside one jit (lax.map over stacked inputs), force a
    scalar readback, report per-iteration time."""

    def __init__(self, reps: int = 20):
        self.reps = reps

    def measure(self, fn, stacked_inputs, *static_args) -> float:
        import jax

        @jax.jit
        def run(xs, *rest):
            outs = jax.lax.map(lambda x: fn(x, *rest), xs)
            first = jax.tree.leaves(outs)[0]
            return first.sum(), outs

        total, _ = run(stacked_inputs, *static_args)
        float(total)  # warm + compile
        t0 = time.perf_counter()
        total, _ = run(stacked_inputs, *static_args)
        float(total)
        return (time.perf_counter() - t0) / self.reps


@dataclass
class Span:
    name: str
    start: float
    duration_ms: float


@dataclass
class SpanRecorder:
    spans: list[Span] = field(default_factory=list)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans.append(
                Span(name, t0, (time.perf_counter() - t0) * 1000.0)
            )

    def summary(self) -> dict[str, float]:
        out: dict[str, float] = {}
        for s in self.spans:
            out[s.name] = out.get(s.name, 0.0) + s.duration_ms
        return out

    def dump(self, path: str | Path) -> None:
        Path(path).write_text(
            json.dumps([s.__dict__ for s in self.spans], indent=2)
        )
