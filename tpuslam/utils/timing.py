"""Step timing + throughput instrumentation.

The reference brackets every stage with ad-hoc ``std::chrono`` prints
(SURVEY.md §5: scan_match_icp.cc:53-83, hector_slam.cc:188-250,
spa2d.cpp:472-602).  Here timing is a reusable context manager with
aggregate statistics plus an optional ``jax.profiler`` trace hook, and
engines report scan-matches/sec — the BASELINE headline metric."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    max_s: float = 0.0

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.count, 1)

    @property
    def rate_hz(self) -> float:
        return self.count / self.total_s if self.total_s > 0 else 0.0


@dataclass
class StepTimer:
    """Named-stage wall timer; ``with timer.stage("match"): ...``."""

    stats: dict[str, StageStats] = field(
        default_factory=lambda: defaultdict(StageStats)
    )

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self.stats[name]
            s.count += 1
            s.total_s += dt
            s.max_s = max(s.max_s, dt)

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.stats.items()):
            lines.append(
                f"{name:24s} n={s.count:6d} mean={s.mean_s * 1e3:8.2f} ms "
                f"max={s.max_s * 1e3:8.2f} ms rate={s.rate_hz:9.1f}/s"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """Optional jax.profiler trace around a region (no-op when dir=None)."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
