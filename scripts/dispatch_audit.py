"""Device-dispatch audit for the tracking hot path.

On the tunneled TPU every device interaction (program launch, upload,
fetch) costs a fixed 25-35 ms round trip once the relay demotes (see
bench.py header), so wall-clock fps is ~1 / (calls_per_frame * latency).
This audit runs the EXACT bench configuration on the CPU backend under a
profiler trace and counts per-function dispatches per frame — the honest
denominator for the latency model, measurable without the tunnel.

Usage:
    python scripts/dispatch_audit.py --frames 48
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

import numpy as np

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def count_dispatches(log_dir):
    """Per-name PjitFunction call counts + total executable launches from
    the most recent trace under log_dir (CPU backend event names)."""
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    tr = json.load(gzip.open(paths[-1]))
    per_fn = collections.Counter()
    totals = collections.Counter()
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        m = re.match(r"PjitFunction\((.*)\)", name)
        if m:
            per_fn[m.group(1)] += 1
        elif name in ("PjRtCpuExecutable::Execute",
                      "CommonPjRtBuffer::Await",
                      "CopyToHost", "TransferToDevice"):
            totals[name] += 1
    # PjitFunction events appear twice per call on the CPU trace (span +
    # self); normalize by the executable-launch total
    calls = sum(per_fn.values())
    execs = totals.get("PjRtCpuExecutable::Execute", 0)
    scale = calls / execs if execs else 2.0
    per_fn = {k: round(v / scale, 1) for k, v in per_fn.items()}
    return per_fn, totals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--latency-ms", type=float, default=28.0,
                    help="assumed per-call relay latency for the model")
    args = ap.parse_args()
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from orb_slam_tpu.pipeline.system import System
    from orb_slam_tpu.pipeline.tracker import TrackState
    from orb_slam_tpu.config import (
        CameraConfig, ExtractorConfig, MapConfig, MatcherConfig,
        SystemConfig, TrackerConfig)
    from orb_slam_tpu.utils.profiling import device_trace

    rng = np.random.default_rng(11)
    cfg = SystemConfig(
        camera=CameraConfig(fx=500, fy=500, cx=320, cy=240, k1=0, k2=0,
                            p1=0, p2=0, k3=0, width=640, height=480),
        extractor=ExtractorConfig(n_features=1000, max_keypoints=1024,
                                  n_levels=8),
        matcher=MatcherConfig(window_init=120),
        tracker=TrackerConfig(async_mapping=True, frame_batch=12),
    )
    system = System.create(cfg)
    K = cfg.camera.K
    scene = bench.SceneRenderer(rng, K)

    i = 0
    while i < 40 and not (system.tracker.state == TrackState.WORKING
                          and system.tracker.slam_map.n_kf >= 3):
        R, t = bench.pose_at(i)
        system.process_image(scene.render(R, t), timestamp=i / 30.0)
        i += 1
    assert system.tracker.state == TrackState.WORKING
    for _ in range(38):   # warm every steady-state program incl. KF rate
        R, t = bench.pose_at(i)
        system.process_image(scene.render(R, t), timestamp=i / 30.0)
        i += 1

    frames = []
    for j in range(args.frames):
        R, t = bench.pose_at(i + j)
        frames.append(scene.render(R, t))

    log_dir = tempfile.mkdtemp(prefix="dispatch_audit_")
    n_kf0 = system.tracker.slam_map.n_kf
    with device_trace(log_dir):
        for j, img in enumerate(frames):
            system.process_image(img, timestamp=(i + j) / 30.0)
        system.tracker.finish()
    n_kf = system.tracker.slam_map.n_kf - n_kf0

    per_fn, totals = count_dispatches(log_dir)
    F = args.frames
    execs = totals.get("PjRtCpuExecutable::Execute", 0)
    print(f"# {F} frames, {n_kf} keyframes inserted, "
          f"{execs} executable launches "
          f"({execs / F:.2f}/frame)")
    print(f"# latency model @ {args.latency_ms:.0f} ms/call: "
          f"{1000.0 / (execs / F * args.latency_ms):.1f} fps ceiling")
    rows = sorted(per_fn.items(), key=lambda kv: -kv[1])
    for name, c in rows:
        tag = ""
        if n_kf and 0.5 <= c / n_kf <= 40 and c < F:
            tag = f"  ({c / n_kf:.1f}/KF)"
        print(f"{c:8.1f}  {c / F:7.3f}/frame  {name}{tag}")
    print(json.dumps({"frames": F, "keyframes": n_kf,
                      "exec_launches": execs,
                      "launches_per_frame": round(execs / F, 3)}))


if __name__ == "__main__":
    main()
