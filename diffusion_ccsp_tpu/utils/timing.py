"""Tracing, profiling, and metrics logging.

Capability parity (and upgrade) over the reference's observability
(SURVEY.md §5): the reference keeps a rolling 10-deep list of sample()
wall-clocks (``ddpm.py:342-351``) and wandb scalars (``ddpm.py:837-843``).
Here: a rolling timer with steps/sec, a JSONL metrics logger (wandb-format
compatible records), and a ``jax.profiler`` trace context for real TPU
profiles (XPlane; viewable in TensorBoard / Perfetto).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import deque


class RollingTimer:
    """Rolling window of wall-clock durations (reference ``ddpm.py:342-351``
    keeps the last 10 sample times)."""

    def __init__(self, window: int = 10):
        self.times: deque = deque(maxlen=window)
        self._t0 = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.times.append(time.time() - self._t0)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def rate(self, units_per_call: float = 1.0) -> float:
        m = self.mean
        return units_per_call / m if m > 0 else 0.0


class MetricsLogger:
    """Append-only JSONL metrics stream (one record per step)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._fh = open(path, "a")

    def log(self, step: int, **metrics):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self):
        self._fh.close()


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler device trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
