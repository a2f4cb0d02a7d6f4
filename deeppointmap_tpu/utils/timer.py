"""Wall-clock section timing + device profiling helpers.

Covers the reference's hand-rolled Timer (reference: utils/timer.py:4-23)
and adds the TPU-native equivalent of its missing profiler story:
`jax.profiler` trace capture around any code section (SURVEY.md section 5
tracing notes)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class Timer:
    """Named section timer: `with timer.record("encode"): ...`."""

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def record(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def mean(self, name: str) -> float:
        ts = self.times.get(name, [])
        return sum(ts) / len(ts) if ts else 0.0

    def summary(self) -> Dict[str, float]:
        return {k: self.mean(k) for k in self.times}

    def reset(self) -> None:
        self.times.clear()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)
    around a code section; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
