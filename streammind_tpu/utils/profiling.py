"""Profiling + latency observability.

The reference has only commented time.time() probes (SURVEY.md §5 —
videollama2_mistral.py:233-245, builder.py:741-745).  Here latency tracking
is first-class: per-stage percentile trackers (the BASELINE.json metrics are
fps and p50 event→first-token), a jax.profiler trace context, and a JSONL
metrics sink usable from training, serving and bench.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional

import numpy as np


class LatencyTracker:
    """Percentile tracker for one stage (e.g. 'perceive', 'prefill',
    'first_token')."""

    def __init__(self, capacity: int = 10000):
        # deque(maxlen): O(1) eviction — list.pop(0) shifted all 10k
        # entries on every sample once full, on the per-frame hot path
        from collections import deque

        self.samples = deque(maxlen=capacity)
        self.capacity = capacity

    def add(self, seconds: float) -> None:
        self.samples.append(seconds)

    @contextlib.contextmanager
    def timed(self) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        self.add(time.perf_counter() - t0)

    def percentile(self, q: float) -> float:
        return float(np.percentile(self.samples, q)) if self.samples else 0.0

    @property
    def p50(self) -> float:
        return self.percentile(50)

    @property
    def p99(self) -> float:
        return self.percentile(99)

    @property
    def mean(self) -> float:
        return float(np.mean(self.samples)) if self.samples else 0.0

    def fps(self) -> float:
        return 1.0 / self.mean if self.mean > 0 else 0.0

    def summary(self) -> Dict[str, float]:
        return {
            "n": len(self.samples),
            "mean_ms": self.mean * 1000,
            "p50_ms": self.p50 * 1000,
            "p90_ms": self.percentile(90) * 1000,
            "p99_ms": self.p99 * 1000,
        }


class StageProfiler:
    """Named latency trackers + JSONL sink."""

    def __init__(self, sink_path: Optional[str] = None):
        self.stages: Dict[str, LatencyTracker] = defaultdict(LatencyTracker)
        self.sink_path = sink_path

    def timed(self, stage: str):
        return self.stages[stage].timed()

    def add(self, stage: str, seconds: float):
        self.stages[stage].add(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: v.summary() for k, v in self.stages.items()}

    def flush(self, extra: Optional[Dict] = None) -> None:
        if not self.sink_path:
            return
        os.makedirs(os.path.dirname(self.sink_path) or ".", exist_ok=True)
        record = {"ts": time.time(), "stages": self.summary()}
        if extra:
            record.update(extra)
        with open(self.sink_path, "a") as f:
            f.write(json.dumps(record) + "\n")


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace window → TensorBoard-compatible artifacts."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_execute(x) -> None:
    """Force device execution + host sync.  On the tunneled TPU platform
    block_until_ready alone does not wait for execution (see
    .claude/skills/verify/SKILL.md) — a tiny fetch does."""
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


import jax  # noqa: E402  (used by force_execute)


class ThroughputMeter:
    """Sliding-window items/sec, for stream fps accounting."""

    def __init__(self, window: int = 200):
        self.times: List[float] = []
        self.window = window

    def tick(self, n: int = 1) -> None:
        now = time.perf_counter()
        for _ in range(n):
            self.times.append(now)
        if len(self.times) > self.window:
            self.times = self.times[-self.window:]

    def rate(self) -> float:
        if len(self.times) < 2:
            return 0.0
        span = self.times[-1] - self.times[0]
        return (len(self.times) - 1) / span if span > 0 else 0.0
