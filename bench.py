"""Benchmark: steady-state frames/s of the LIVE tracker on rendered images.

This drives the real system loop — `System.process_image` — not an isolated
kernel: level-batched ORB extraction (640x480, 8 levels, 1000 features),
fused frame program (undistort + frame-to-frame matching + pose LM +
local-map matching + pose LM + landmark stats), keyframe policy, and the
async keyframe-rate mapping worker (local mapping + BA + place recognition)
with its commit protocol.  Every frame is a fresh rendered image (the relay
dedupes identical uploads — see axon notes), and keyframe frames are counted
inside the measured window, so the number includes the mapping tax.

Prints detail lines, then ONE JSON line:
  {"metric": "tracking_fps", "value": N, "unit": "frames/s", "vs_baseline": R}

Baseline: the reference's real-time operating point is its camera rate —
30 fps on a 2014 desktop CPU (README.md:3,46; src/main.cc:146-148).
BASELINE.json targets >=3x that per chip.
"""
import json
import time

import numpy as np


def render_image(X, patches, R, t, K, width=640, height=480, patch=9):
    """Stamp each landmark's fixed random patch at its projection (the same
    renderer as tests/test_image_e2e.py: the real FAST/BRIEF front end must
    re-detect and re-match)."""
    img = np.full((height, width), 90.0, np.float32)
    xc = X @ R.T + t
    z = xc[:, 2]
    uv = np.stack([K[0, 0] * xc[:, 0] / np.maximum(z, 1e-6) + K[0, 2],
                   K[1, 1] * xc[:, 1] / np.maximum(z, 1e-6) + K[1, 2]], 1)
    r = patch // 2
    order = np.argsort(-z)
    for i in order:
        if z[i] < 0.5:
            continue
        u, v = int(round(uv[i, 0])), int(round(uv[i, 1]))
        if r <= u < width - r and r <= v < height - r:
            img[v - r:v + r + 1, u - r:u + r + 1] = patches[i]
    return img


def rotmat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.cos(angle / 2)
    b, c, d = -axis * np.sin(angle / 2)
    return np.array([
        [a*a+b*b-c*c-d*d, 2*(b*c+a*d), 2*(b*d-a*c)],
        [2*(b*c-a*d), a*a+c*c-b*b-d*d, 2*(c*d+a*b)],
        [2*(b*d+a*c), 2*(c*d-a*b), a*a+d*d-b*b-c*c]], np.float32)


def pose_at(i):
    """Slow lateral orbit with a gentle yaw — keeps most of the world in
    view while steadily changing the image."""
    R = rotmat([0, 1, 0], np.radians(0.25 * i))
    t = np.array([-0.05 * i, 0.005 * i, 0.002 * i], np.float32)
    return R, t


def main():
    import jax
    from orb_slam_tpu.config import (
        CameraConfig, ExtractorConfig, MapConfig, MatcherConfig, SystemConfig,
        TrackerConfig,
    )
    from orb_slam_tpu.pipeline.system import System
    from orb_slam_tpu.pipeline.tracker import TrackState

    rng = np.random.default_rng(11)
    n_pts = 1400
    X = np.stack([
        rng.uniform(-14, 14, n_pts),
        rng.uniform(-5, 5, n_pts),
        rng.uniform(4, 14, n_pts),
    ], 1).astype(np.float32)
    patches = rng.uniform(0, 255, (n_pts, 9, 9)).astype(np.float32)

    # the reference's headline mono config: 1000 features, 8 levels
    cfg = SystemConfig(
        camera=CameraConfig(fx=500, fy=500, cx=320, cy=240,
                            k1=0, k2=0, p1=0, p2=0, k3=0,
                            width=640, height=480),
        extractor=ExtractorConfig(n_features=1000, max_keypoints=1024,
                                  n_levels=8),
        matcher=MatcherConfig(window_init=120),
        tracker=TrackerConfig(async_mapping=True),
    )
    system = System.create(cfg)
    K = cfg.camera.K

    # bootstrap: init + first keyframes (not measured)
    i = 0
    while i < 40 and not (
            system.tracker.state == TrackState.WORKING
            and system.tracker.slam_map.n_kf >= 3):
        R, t = pose_at(i)
        system.process_image(render_image(X, patches, R, t, K),
                             timestamp=i / 30.0)
        i += 1
    assert system.tracker.state == TrackState.WORKING, "bootstrap failed"

    # warm the steady-state program (first fused compile is slow)
    for _ in range(3):
        R, t = pose_at(i)
        system.process_image(render_image(X, patches, R, t, K),
                             timestamp=i / 30.0)
        i += 1

    # measured window: every frame is a new image; keyframe frames included.
    # Render cost is host-side scene simulation, not SLAM work — pre-render.
    n_frames = 60
    frames = []
    for j in range(n_frames):
        R, t = pose_at(i + j)
        frames.append(render_image(X, patches, R, t, K))

    n_kf0 = system.tracker.slam_map.n_kf
    per_frame = []
    t_all0 = time.perf_counter()
    for j, img in enumerate(frames):
        t0 = time.perf_counter()
        system.process_image(img, timestamp=(i + j) / 30.0)
        per_frame.append(time.perf_counter() - t0)
    dt = time.perf_counter() - t_all0
    system.tracker.finish()

    tracked = sum(1 for r in system.tracker.trajectory[-n_frames:] if r.tracked)
    n_kf = system.tracker.slam_map.n_kf - n_kf0
    fps = n_frames / dt
    per_frame = np.array(per_frame) * 1e3
    print(f"# {n_frames} frames in {dt:.2f}s ({fps:.1f} fps), "
          f"{tracked} tracked, {n_kf} new keyframes, "
          f"{system.tracker.slam_map.n_mp} map points")
    print(f"# per-frame ms: p50={np.percentile(per_frame, 50):.1f} "
          f"p90={np.percentile(per_frame, 90):.1f} "
          f"max={per_frame.max():.1f}")
    assert tracked >= int(0.9 * n_frames), "tracking degraded during bench"

    print(json.dumps({
        "metric": "tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),
    }))


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
