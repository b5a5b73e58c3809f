"""Tracing / profiling utilities (SURVEY §5).

The reference instruments with ad-hoc wall-clock accumulators: ``times[]``
(feature/f0/vocoder seconds) threaded through the RVC pipeline
(pipeline.py:236,188,231-234), ``EpochRecorder`` (train.py:241-252), and an
elapsed-time report in the chain executor (layouts/process.py:484-487).

TPU equivalents here:
  - ``StageTimer``        — the times[] pattern, device-sync aware
  - ``trace``             — jax.profiler trace context (TensorBoard-viewable)
  - ``EpochRecorder``     — per-epoch timing string
  - ``timed``             — decorator accumulating per-function seconds
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from functools import wraps

import jax

log = logging.getLogger(__name__)


class StageTimer:
    """Accumulates per-stage seconds; syncs device work when asked so the
    numbers mean compute, not dispatch."""

    def __init__(self):
        self.seconds: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync: object | None = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.seconds[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        total = sum(self.seconds.values())
        parts = [
            f"{k}: {v:.3f}s ({self.counts[k]}x)"
            for k, v in sorted(self.seconds.items(), key=lambda kv: -kv[1])
        ]
        return f"total {total:.3f}s | " + ", ".join(parts)

    def as_dict(self) -> dict:
        return {k: round(v, 4) for k, v in self.seconds.items()}


@contextlib.contextmanager
def trace(logdir: str = "/tmp/audiolab_trace"):
    """jax.profiler trace — open the dir in TensorBoard/XProf to see the
    HLO timeline (replaces the reference's absent profiler integration)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class EpochRecorder:
    """train.py:241-252 equivalent: 'elapsed 12.3s | epoch time 1.2s'."""

    def __init__(self):
        self.t_start = time.perf_counter()
        self.t_last = self.t_start

    def record(self) -> str:
        now = time.perf_counter()
        msg = (f"elapsed {now - self.t_start:.1f}s | "
               f"epoch time {now - self.t_last:.2f}s")
        self.t_last = now
        return msg


_GLOBAL = StageTimer()


def timed(name: str | None = None, sync: bool = True):
    """Decorator: accumulate wall seconds into the module-global timer."""

    def deco(fn):
        label = name or fn.__qualname__

        @wraps(fn)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            if sync:
                try:
                    jax.block_until_ready(out)
                except Exception:
                    pass
            _GLOBAL.seconds[label] += time.perf_counter() - t0
            _GLOBAL.counts[label] += 1
            return out

        return wrapper

    return deco


def global_report() -> str:
    return _GLOBAL.report()
