"""XLA device-trace capture (SURVEY.md §5.1's profiler half).

StageTimer gives host wall-clock per stage; this wraps jax.profiler to get
per-op DEVICE time, which is the only honest number on latency-bound
runtimes (a tunneled/multi-tenant accelerator charges a fixed per-call cost
that host timers conflate with compute — measured 25-35 ms/call vs 2.5 ms
of device work for the tracking megastep).

Usage:
    from orb_slam_tpu.utils.profiling import device_trace, top_ops
    with device_trace("/tmp/slamtrace"):
        for img in frames:
            system.process_image(img, ts)
    for dur_ms, name in top_ops("/tmp/slamtrace")[:15]:
        print(f"{dur_ms:8.2f} ms  {name}")
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
from contextlib import contextmanager
from typing import List, Tuple

import jax


@contextmanager
def device_trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def top_ops(log_dir: str) -> List[Tuple[float, str]]:
    """Summed duration (ms) per trace event name, descending.  Reads the
    most recent trace under log_dir."""
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    tot: collections.Counter = collections.Counter()
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            tot[e.get("name", "")] += e["dur"]
    return sorted(((d / 1e3, n) for n, d in tot.items()), reverse=True)
