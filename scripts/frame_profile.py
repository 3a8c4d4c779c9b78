"""Per-op device profile of the fused tracked-frame program (frame_step_scan).

The round-3 dispatch audit proved the batch path is device-compute-bound
(~8 ms/frame on the chip, ~125 fps ceiling); this script answers WHERE the
8 ms goes: it bootstraps the live system on rendered frames exactly like
bench.py, warms every compile bucket, then captures an XLA device trace of
steady-state batches and prints the top ops.

Usage:  python scripts/frame_profile.py [--batches 3] [--out FRAME_PROFILE.json]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SceneRenderer, pose_at  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--out", default="")
    ap.add_argument("--trace-dir", default="/tmp/frame_trace")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from orb_slam_tpu.config import (
        CameraConfig, ExtractorConfig, MatcherConfig, SystemConfig,
        TrackerConfig,
    )
    from orb_slam_tpu.pipeline.system import System
    from orb_slam_tpu.pipeline.tracker import TrackState
    from orb_slam_tpu.utils.profiling import device_trace, top_ops

    rng = np.random.default_rng(11)
    fb = int(os.environ.get("ORB_SLAM_TPU_FRAME_BATCH", 16))
    cfg = SystemConfig(
        camera=CameraConfig(fx=500, fy=500, cx=320, cy=240,
                            k1=0, k2=0, p1=0, p2=0, k3=0,
                            width=640, height=480),
        extractor=ExtractorConfig(n_features=1000, max_keypoints=1024,
                                  n_levels=8),
        matcher=MatcherConfig(window_init=120),
        tracker=TrackerConfig(async_mapping=True, frame_batch=fb),
    )
    system = System.create(cfg)
    scene = SceneRenderer(rng, cfg.camera.K)

    i = 0
    while i < 40 and not (system.tracker.state == TrackState.WORKING
                          and system.tracker.slam_map.n_kf >= 3):
        R, t = pose_at(i)
        system.process_image(scene.render(R, t), timestamp=i / 30.0)
        i += 1
    assert system.tracker.state == TrackState.WORKING, "bootstrap failed"
    for _ in range(3 * fb):   # warm the steady-state scan program
        R, t = pose_at(i)
        system.process_image(scene.render(R, t), timestamp=i / 30.0)
        i += 1

    n = args.batches * fb
    frames = []
    for j in range(n):
        R, t = pose_at(i + j)
        frames.append(scene.render(R, t))
    t0 = time.perf_counter()
    with device_trace(args.trace_dir):
        for j, img in enumerate(frames):
            system.process_image(img, timestamp=(i + j) / 30.0)
        system.tracker._drain_pipe()
    wall = time.perf_counter() - t0
    system.tracker.shutdown()

    ops = top_ops(args.trace_dir)
    res = {
        "frame_batch": fb,
        "frames_traced": n,
        "wall_s": round(wall, 3),
        "wall_ms_per_frame": round(wall / n * 1e3, 3),
        "backend": jax.default_backend(),
        "top_ops_ms": [[round(d, 3), name] for d, name in ops[:40]],
    }
    for d, name in ops[:40]:
        print(f"{d:9.3f} ms  {name}")
    print(json.dumps({k: v for k, v in res.items() if k != "top_ops_ms"}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
