"""Per-stage dispatch/transfer audit of the keyframe-rate mapping path.

bench.py r4/r5 shows the mapping tax is what caps keyframe insertions in
the measured window (warm per-KF wall ~1.0 s: triangulate ~350 ms, fuse
~250 ms, localBA ~230 ms, commit ~250 ms).  On the tunneled TPU every
device interaction costs ~28 ms once a readback happened (memory note),
so per-stage wall ≈ interactions x 28 ms + device time.  This audit runs
the live system on the CPU backend and counts executable launches +
host transfers per mapping sub-stage — the honest decomposition of the
keyframe tax, measurable without the tunnel.

Usage:  python scripts/mapping_profile.py [--out MAPPING_AUDIT.json]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from bench import SceneRenderer, pose_at  # noqa: E402


def count_events(log_dir):
    """(executes, transfers, per-fn Counter) from the newest CPU trace."""
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return 0, 0, collections.Counter()
    tr = json.load(gzip.open(paths[-1]))
    import re
    per_fn = collections.Counter()
    executes = transfers = 0
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        m = re.match(r"PjitFunction\((.*)\)", name)
        if m:
            per_fn[m.group(1)] += 1
        elif name == "PjRtCpuExecutable::Execute":
            executes += 1
        elif name in ("CommonPjRtBuffer::Await", "CopyToHost",
                      "TransferToDevice"):
            transfers += 1
    return executes, transfers, per_fn


def traced(fn, *a, **kw):
    d = tempfile.mkdtemp(prefix="mapaudit_")
    with jax.profiler.trace(d):
        out = fn(*a, **kw)
    ex, tx, per_fn = count_events(d)
    return out, dict(executes=ex, transfers=tx,
                     top_fns=per_fn.most_common(6))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from orb_slam_tpu.config import (
        CameraConfig, ExtractorConfig, MatcherConfig, SystemConfig,
        TrackerConfig,
    )
    from orb_slam_tpu.pipeline.system import System
    from orb_slam_tpu.pipeline.tracker import TrackState
    from orb_slam_tpu.pipeline import mapping_kernels as mk

    rng = np.random.default_rng(11)
    cfg = SystemConfig(
        camera=CameraConfig(fx=500, fy=500, cx=320, cy=240,
                            k1=0, k2=0, p1=0, p2=0, k3=0,
                            width=640, height=480),
        extractor=ExtractorConfig(n_features=1000, max_keypoints=1024,
                                  n_levels=8),
        matcher=MatcherConfig(window_init=120),
        # async like the bench; the audit drives the mapper methods
        # directly on the drained map, so the worker stays idle
        tracker=TrackerConfig(async_mapping=True,
                              frame_batch=int(os.environ.get(
                                  "ORB_SLAM_TPU_FRAME_BATCH", 16))),
    )
    system = System.create(cfg)
    scene = SceneRenderer(rng, cfg.camera.K)

    # drive to a steady mid-size map so stage work is representative
    i = 0
    while i < 40 and not (system.tracker.state == TrackState.WORKING
                          and system.tracker.slam_map.n_kf >= 3):
        R, t = pose_at(i)
        system.process_image(scene.render(R, t), timestamp=i / 30.0)
        i += 1
    assert system.tracker.state == TrackState.WORKING
    kf0 = system.tracker.slam_map.n_kf
    while i < 200 and system.tracker.slam_map.n_kf < kf0 + 5:
        R, t = pose_at(i)
        system.process_image(scene.render(R, t), timestamp=i / 30.0)
        i += 1
    system.tracker.finish()
    smap = system.tracker.slam_map
    mapper = (system.tracker.async_mapper.local_mapper
              if system.tracker.async_mapper is not None
              else system.tracker.local_mapper)
    kf = smap.n_kf - 1
    print(f"# audit at n_kf={smap.n_kf} n_mp={smap.n_mp}")

    # warm every stage once so the audit counts steady-state dispatches
    mapper.process_keyframe(smap, kf)

    report = {"n_kf": int(smap.n_kf), "n_mp": int(smap.n_mp), "stages": {}}
    stages = [
        ("cullPoints", lambda: mapper.cull_points(smap, kf)),
        ("triangulate", lambda: mapper.triangulate_new_points(smap, kf)),
        ("pointStats", lambda: mapper.refresh_point_stats(smap)),
        ("fuse", lambda: mapper.fuse_neighbors(smap, kf)),
        ("statsMedoid", lambda: mk.point_stats_and_medoid(
            smap.state.kf_obs, smap.state.kf_R, smap.state.kf_t,
            smap.state.kf_level, smap.state.kf_valid, smap.state.mp_pos,
            smap.state.mp_valid, smap.state.mp_ref_kf, smap.state.kf_desc,
            smap.state.mp_desc, np.int32(kf),
            n_levels=cfg.extractor.n_levels,
            scale_factor=cfg.extractor.scale_factor)[0]
            .block_until_ready()),
        ("localBA", lambda: mapper.local_ba(smap, kf)),
        ("cullKeyframes", lambda: mapper.cull_keyframes(smap, kf)),
    ]
    for name, fn in stages:
        import time as _t
        t0 = _t.perf_counter()
        _, stats = traced(fn)
        stats["wall_cpu_ms"] = round((_t.perf_counter() - t0) * 1e3, 1)
        stats["projected_tpu_ms_at_28ms"] = stats["executes"] * 28
        report["stages"][name] = stats
        print(name, json.dumps(stats), flush=True)

    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
