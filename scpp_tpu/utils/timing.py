"""Wall-clock phase timing, same taxonomy as the reference printouts.

Reference: scpp_core/utils/src/timing.cpp:5-15 (tic/toc in ms) and the phase
labels in SCAlgorithm.cpp (dynamics/discretization/solver/defects/iteration/
total). We keep identical phase names so CPU-vs-TPU numbers line up.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

__all__ = ["tic", "toc", "PhaseTimer"]


def tic() -> float:
    return time.perf_counter()


def toc(start: float) -> float:
    """Milliseconds since ``start``."""
    return (time.perf_counter() - start) * 1e3


class PhaseTimer:
    """Accumulates per-phase wall-clock ms across a run."""

    def __init__(self):
        self.totals_ms = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def phase(self, name: str):
        t0 = tic()
        try:
            yield
        finally:
            self.totals_ms[name] += toc(t0)
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals_ms.items()):
            n = self.counts[name]
            lines.append(f"{name + ':':<50}{total:.2f}ms ({n}x, {total / max(n, 1):.2f}ms avg)")
        return "\n".join(lines)
