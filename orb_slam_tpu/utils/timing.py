"""Per-stage wall-clock instrumentation.

Keeps the worxli fork's stage taxonomy (`[time] <thread> run <stage>` lines,
SURVEY.md §5.1: src/Tracking.cc:208,323; src/LocalMapping.cc:65-99;
src/LoopClosing.cc:77-559) so numbers are comparable, and adds aggregate
statistics.  Enable printing with ORB_SLAM_TPU_TIME=1 or `StageTimer(echo=True)`.
"""
from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


class StageTimer:
    def __init__(self, echo: bool | None = None):
        self.echo = (os.environ.get("ORB_SLAM_TPU_TIME") == "1"
                     if echo is None else echo)
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextmanager
    def stage(self, group: str, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            key = f"{group}/{name}"
            self.totals[key] += dt
            self.counts[key] += 1
            if self.echo:
                print(f"[time] {group} run {name} {time.time():.6f} {dt:.6f}")

    def summary(self) -> Dict[str, dict]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_ms": round(1e3 * self.totals[k] / max(self.counts[k], 1), 3),
            }
            for k in sorted(self.totals)
        }


GLOBAL_TIMER = StageTimer()
