"""Benchmark: steady-state tracked frames/s of the full per-frame hot path —
ORB extraction (640x480, 8 levels, 1000 features) + frame-to-frame projection
matching + pose optimization + local-map matching + pose optimization —
on the available accelerator.

Prints ONE JSON line:
  {"metric": "tracking_fps", "value": N, "unit": "frames/s", "vs_baseline": R}

Baseline: the reference's real-time operating point is its camera rate —
30 fps on a 2014 desktop CPU (README.md:3,46; src/main.cc:146-148).
BASELINE.json targets >=3x that per chip.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from orb_slam_tpu.config import ExtractorConfig
    from orb_slam_tpu.frontend.extractor import extract_default

    # tracking core (match + optimize) on realistic shapes
    fn, args = ge.entry()
    step = jax.jit(fn)

    # synthetic textured frame for the extractor
    rng = np.random.default_rng(3)
    img = np.full((480, 640), 60, np.float32)
    for _ in range(80):
        y, x, s = rng.integers(30, 430), rng.integers(30, 590), rng.integers(8, 25)
        img[y:y + s, x:x + s] += rng.uniform(40, 150)
    img += rng.normal(0, 3, img.shape)
    img = jnp.asarray(img)
    ecfg = ExtractorConfig()

    def frame_step():
        feats = extract_default(img, ecfg)
        # one fused megastep = TrackWithMotionModel + fallbacks +
        # TrackLocalMap + pose LM (the per-frame device program)
        out = step(*args)
        return feats, out

    # compile + adaptive iteration count (the tunneled-TPU environment has
    # high variance; keep total bench time bounded)
    t0 = time.perf_counter()
    jax.block_until_ready(frame_step())
    first = time.perf_counter() - t0
    n_iters = max(10, min(50, int(20.0 / max(first, 1e-3))))

    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = frame_step()
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
