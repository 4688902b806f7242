"""Structured metrics: JSONL per-iteration records + profiling helpers
(SURVEY.md §5.1/§5.5).

The reference logged convergence numbers via prints and matplotlib inside
the hot path; here the solvers return diagnostics and the host shell
appends one JSON object per iteration to a .jsonl stream — plots are
regenerated from the stream afterwards, never from inside the loop.
"""
from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager


class MetricsWriter:
    """Append-only JSONL metrics stream."""

    def __init__(self, path):
        self.path = path
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)

    def write(self, record: dict):
        record = dict(record)
        record.setdefault("t_wall", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")

    def read_all(self):
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


@contextmanager
def trace(name: str):
    """jax.profiler annotation around a kernel group (SURVEY.md §5.1):
    shows up as a named span in TensorBoard/perfetto traces."""
    import jax.profiler
    with jax.profiler.TraceAnnotation(name):
        yield


@contextmanager
def profile_to(logdir: str):
    """Capture a device trace for the enclosed block:
    ``with profile_to("/tmp/trace"): run()`` then inspect with
    tensorboard/xprof."""
    import jax.profiler
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def timed(records: dict, key: str):
    """Context timer: records wall seconds under ``key``."""
    t0 = time.perf_counter()
    yield
    records[key] = records.get(key, 0.0) + time.perf_counter() - t0


def rates(n_rays: int, n_steps: int, seconds: float) -> dict:
    """Derived throughput counters (the BASELINE.json metric family)."""
    return {
        "rays_per_sec": n_rays / seconds if seconds > 0 else float("inf"),
        "ray_steps_per_sec": n_rays * n_steps / seconds
        if seconds > 0 else float("inf"),
        "seconds": seconds,
    }
