"""Per-stage wall-clock timers for the decode pipeline (the tracing
analog SURVEY.md §5 calls for; pairs with jax.profiler for on-device
traces)."""

from __future__ import annotations

import contextlib
import time


class StageTimers:
    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = (self.times.get(name, 0.0)
                                + time.perf_counter() - t0)

    def as_dict(self) -> dict[str, float]:
        return dict(self.times)

    def __repr__(self) -> str:
        parts = ", ".join(f"{k}={v * 1e3:.1f}ms"
                          for k, v in self.times.items())
        return f"StageTimers({parts})"
