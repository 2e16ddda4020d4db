"""jax.profiler integration (SURVEY.md §5 tracing story).

The reference's only instrumentation is a CUDA-event latency Timer
(predictions_runner.py:125-151). Here a context manager wraps any region in
a jax.profiler trace viewable in TensorBoard/Perfetto, plus a helper that
aggregates per-op durations from the written trace — the tool used to find
the decode-cache copy pathologies during this port.
"""
from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
from collections import Counter
from typing import Dict


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/capdec_trace"):
    import jax
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield log_dir


def summarize_trace(log_dir: str, top: int = 25) -> Dict[str, float]:
    """Aggregate op durations (ms) from the newest trace.json.gz."""
    paths = sorted(glob.glob(
        os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        return {}
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    by_name: Counter = Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X":
            by_name[e.get("name", "?")] += e.get("dur", 0)
    out = {}
    for name, dur in by_name.most_common(top):
        out[name] = dur / 1000.0
    return out


def print_trace_summary(log_dir: str, top: int = 25) -> None:
    for name, ms in summarize_trace(log_dir, top).items():
        print(f"{ms:10.2f} ms  {name[:80]}", flush=True)
