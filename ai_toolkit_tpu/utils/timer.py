"""Named-section timer (reference ``toolkit/timer.py``): rolling averages,
printed every ``performance_log_every`` steps."""

from __future__ import annotations

import time
from collections import defaultdict, deque
from contextlib import contextmanager


class Timer:
    def __init__(self, name: str = "timer", maxlen: int = 60):
        self.name = name
        self.buffers: dict[str, deque] = defaultdict(lambda: deque(maxlen=maxlen))

    @contextmanager
    def __call__(self, section: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.buffers[section].append(time.perf_counter() - t0)

    def averages(self) -> dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self.buffers.items() if v}

    def summary(self) -> str:
        lines = [f"[{self.name}] section timings (rolling avg):"]
        for k, v in sorted(self.averages().items(), key=lambda kv: -kv[1]):
            lines.append(f"  {k:>30}: {v * 1000:8.2f} ms")
        return "\n".join(lines)
