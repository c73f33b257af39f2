"""Tracing / profiling utilities.

The reference ships only a GetTime() helper (cpp/src/Timing.h:25-45).  The
TPU engine does better: per-op wall-time + bytes-moved counters and a
jax.profiler bridge, so roofline % is measurable per op.

Usage:
    from custrings_tpu.utils import tracing
    with tracing.enabled():
        ... run ops ...
    print(tracing.report())

    with tracing.device_trace("/tmp/jaxtrace"):   # XLA-level trace
        ... run ops ...
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_records: dict = defaultdict(lambda: [0, 0.0, 0])  # name -> [calls, secs, bytes]
_active = False

# measured HBM bandwidth ceiling used for roofline %, settable by the user
HBM_BYTES_PER_SEC = 8.0e11  # v5e ~819 GB/s


@contextlib.contextmanager
def enabled():
    global _active
    _active, prev = True, _active
    try:
        yield
    finally:
        _active = prev


@contextlib.contextmanager
def op(name: str, nbytes: int = 0):
    """Record one op invocation (wall time incl. dispatch + sync)."""
    if not _active:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        rec = _records[name]
        rec[0] += 1
        rec[1] += dt
        rec[2] += nbytes


def report() -> str:
    lines = ["op                         calls     total_s   GB/s    roofline%"]
    for name, (calls, secs, nbytes) in sorted(_records.items()):
        bw = (nbytes / secs / 1e9) if secs else 0.0
        roof = 100.0 * (nbytes / secs) / HBM_BYTES_PER_SEC if secs else 0.0
        lines.append(
            f"{name:<26} {calls:>5}  {secs:>10.4f}  {bw:>6.2f}  {roof:>8.2f}"
        )
    return "\n".join(lines)


def reset():
    _records.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """XLA-level profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
