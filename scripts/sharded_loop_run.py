"""Live sharded city-scale loop (VERDICT r3 item 4): the TRACKER drives the
pipeline while local BA executes through parallel/dist_ba.py map-block
(Morton "spatial") sharding over a device mesh — the SURVEY §2.3
distributed row exercised in the loop, not as a solver harness.

Two identical endurance-style runs (same rendered world, same poses):
  A) single-device BA      (mesh.data_parallel=1)
  B) mesh-sharded BA       (mesh.data_parallel=N, strategy="spatial")
Synchronous mapping + frame_batch=1 make both runs deterministic, so the
only divergence source is the sharded Schur reduction's f32 summation
order.  The artifact reports per-frame pose deltas and both ATEs.

Run on the virtual 8-device CPU mesh (the same code spans hosts over
ICI/DCN on a real slice — see parallel/dist_ba.py):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/sharded_loop_run.py --frames 600 --out SHARDED_LOOP_r04.json
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    # the virtual multi-device mesh only exists on the CPU backend
    jax.config.update("jax_platforms", "cpu")

from endurance_run import (build_world, endurance_config, lap_poses,  # noqa: E402
                           render_image, default_vocab100k)


def run_loop(n_frames, n_shards, strategy, seed=7, frames_per_lap=400,
             verbose=True):
    from orb_slam_tpu.pipeline.system import System

    rng = np.random.default_rng(seed)
    cfg = endurance_config(max_keyframes=64, frame_batch=1,
                           vocab_path=default_vocab100k())
    # synchronous keyframe mapping: deterministic commit boundaries, so the
    # sharded and unsharded runs are comparable frame by frame
    cfg = cfg.replace(
        tracker=dataclasses.replace(cfg.tracker, async_mapping=False,
                                    frame_batch=1),
        mesh=dataclasses.replace(cfg.mesh, data_parallel=n_shards,
                                 ba_strategy=strategy),
    )
    X, patches = build_world(rng)
    poses, gt_centers = lap_poses(n_frames, frames_per_lap, rng)
    K = cfg.camera.K

    system = System.create(cfg)
    n_ba = 0
    t0 = time.perf_counter()
    for i, (R, t) in enumerate(poses):
        img = render_image(X, patches, R, t, K)
        m = system.process_image(img, timestamp=i / 30.0)
        if m.get("event") == "keyframe_inserted":
            n_ba += 1
        if verbose and i % 100 == 99:
            el = time.perf_counter() - t0
            print(f"  [{n_shards}shard/{strategy}] frame {i+1}/{n_frames} "
                  f"{el:.0f}s kf={m.get('n_keyframes')} "
                  f"mp={m.get('n_map_points')}", flush=True)
    system.tracker.finish()
    wall = time.perf_counter() - t0

    traj = {r.frame_id: r for r in system.tracker.trajectory if r.tracked}
    gt = np.zeros((n_frames, 8), np.float64)
    gt[:, 0] = np.arange(n_frames) / 30.0
    gt[:, 1:4] = gt_centers
    ate = system.evaluate_ate(gt)
    out = dict(
        n_shards=n_shards, strategy=strategy,
        tracked=len(traj), n_kf=int(system.tracker.slam_map.n_kf),
        n_mp=int(system.tracker.slam_map.n_mp),
        keyframe_insertions=n_ba,
        loops_closed=int(system.tracker.loop_closer.n_loops_closed),
        ate_rmse_sim3_m=None if ate is None else round(float(ate), 5),
        wall_s=round(wall, 1),
    )
    system.tracker.shutdown()
    return out, traj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--out", default="")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    n_dev = len(jax.devices())
    assert n_dev >= args.shards, (
        f"need {args.shards} devices, have {n_dev} — run with "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8")

    print(f"# devices: {n_dev} ({jax.default_backend()})")
    a, traj_a = run_loop(args.frames, 1, "index")
    print(json.dumps(a), flush=True)
    b, traj_b = run_loop(args.frames, args.shards, "spatial")
    print(json.dumps(b), flush=True)

    # per-frame camera-center deltas on the common tracked frames.
    # NOTE on interpretation: the sharded Schur reduction sums partial
    # camera systems in a different f32 order (and the Morton partition
    # permutes landmarks), so each local BA differs at ~1e-6 relative;
    # over hundreds of frames the keyframe POLICY eventually makes a
    # different integer decision and the two maps diverge structurally.
    # Frame-exact equality is therefore not a property either system has
    # (the reference's own threads are timing-nondeterministic); the
    # equality claims are (a) solver-level: identical problems solve to
    # f32-level agreement (solver_equality below, and
    # tests/test_dist_ba.py), and (b) system-level: both runs track the
    # same fraction and land the same ATE.
    common = sorted(set(traj_a) & set(traj_b))
    d = []
    for f in common:
        ra, rb = traj_a[f], traj_b[f]
        ca = -ra.R.T @ ra.t
        cb = -rb.R.T @ rb.t
        d.append(np.linalg.norm(ca - cb))
    d = np.asarray(d)

    # solver-level equality on ONE fixed local-BA problem
    from orb_slam_tpu.solvers import bundle_adjust as ba_mod
    from orb_slam_tpu.parallel import dist_ba
    from orb_slam_tpu.geometry.camera import make_camera
    from orb_slam_tpu.config import SolverConfig
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ba_city_bench import make_problem
    rng = np.random.default_rng(5)
    Rs, ts, Xs, fixed, edges, cam, _ = make_problem(rng, 32, 4096)
    scfg = SolverConfig()
    r1 = ba_mod.bundle_adjust(Rs, ts, Xs, fixed, edges, cam, scfg,
                              two_phase=True, solver="dense")
    r2 = dist_ba.bundle_adjust_dist(Rs, ts, Xs, fixed, edges, cam, scfg,
                                    two_phase=True, n_shards=args.shards,
                                    strategy="spatial")
    solver_dt = float(np.abs(np.asarray(r1.t) - np.asarray(r2.t)).max())

    results = {
        "run": "sharded_live_loop",
        "backend": jax.default_backend(),
        "n_devices": n_dev,
        "n_frames": args.frames,
        "single": a,
        "sharded": b,
        "common_tracked_frames": len(common),
        "pose_delta_m": {
            "p50": round(float(np.percentile(d, 50)), 6),
            "p95": round(float(np.percentile(d, 95)), 6),
            "max": round(float(d.max()), 6),
        },
        "solver_equality_max_t_delta_m": solver_dt,
        "ate_delta_m": None if (a["ate_rmse_sim3_m"] is None
                                or b["ate_rmse_sim3_m"] is None) else
        round(abs(a["ate_rmse_sim3_m"] - b["ate_rmse_sim3_m"]), 6),
        "trajectory_extent_m": 6.0,
    }
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
