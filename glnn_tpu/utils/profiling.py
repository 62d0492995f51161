"""Profiling hooks (absent in the reference — SURVEY.md §5 calls for
baking them in from day one).

* `trace(dir)` — context manager around jax.profiler for on-device
  traces viewable in TensorBoard/Perfetto.
* `StepTimer` — cheap host-side wall-clock accounting for epoch loops;
  the runners report mean epoch time (feeds the edges/s metrics).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1
        return False

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)
