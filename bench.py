"""Benchmark: steady-state tracked frames/s of the fused per-frame tracking
step (local-map matching + pose optimization) on the available accelerator.

Prints ONE JSON line:
  {"metric": "tracking_fps", "value": N, "unit": "frames/s", "vs_baseline": R}

Baseline: the reference system's real-time operating point is its camera
rate — 30 fps on a 2014 desktop CPU (README.md:3,46; Camera.fps default,
src/main.cc:146-148).  BASELINE.json's target is >=3x that per chip.
"""
import json
import time

import numpy as np


def main():
    import jax
    import __graft_entry__ as ge

    fn, args = ge.entry()
    step = jax.jit(fn)

    # compile
    out = step(*args)
    jax.block_until_ready(out)

    # steady state
    n_iters = 50
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = step(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = n_iters / dt
    baseline_fps = 30.0
    print(json.dumps({
        "metric": "tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
    }))


if __name__ == "__main__":
    main()
