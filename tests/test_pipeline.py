"""End-to-end tracking pipeline on a synthetic feature sequence."""
import numpy as np
import pytest

from orb_slam_tpu.config import (
    CameraConfig, ExtractorConfig, MapConfig, MatcherConfig, SystemConfig,
)
from orb_slam_tpu.dataio import trajectory as traj
from orb_slam_tpu.pipeline.tracker import Tracker, TrackState
from synthetic_sequence import make_world, circular_trajectory, render_frame


def small_config(n_slots=512):
    return SystemConfig(
        camera=CameraConfig(fx=500, fy=500, cx=320, cy=240,
                            k1=0, k2=0, p1=0, p2=0, k3=0,
                            width=640, height=480),
        extractor=ExtractorConfig(n_features=n_slots, max_keypoints=n_slots),
        # synthetic sequences move ~2x faster than handheld: widen the init
        # window so 3-5-frame pairs (enough parallax) still match
        matcher=MatcherConfig(window_init=200),
        map=MapConfig(max_keyframes=64, max_points=4096,
                      local_ba_max_kfs=8, local_ba_max_fixed=8,
                      local_ba_max_points=2048),
    )


@pytest.fixture(scope="module")
def tracked_run():
    rng = np.random.default_rng(11)
    cfg = small_config()
    X, desc = make_world(rng, n_points=900)
    K = cfg.camera.K
    poses = circular_trajectory(40)
    tracker = Tracker.create(cfg)
    logs = []
    for i, (R, t) in enumerate(poses):
        feats, _ = render_frame(rng, X, desc, R, t, K)
        logs.append(tracker.process(feats, timestamp=i / 30.0))
    return dict(tracker=tracker, logs=logs, poses=poses)


def test_initializes(tracked_run):
    events = [l.get("event") for l in tracked_run["logs"]]
    assert "map_initialized" in events


def test_tracks_to_end(tracked_run):
    tracker = tracked_run["tracker"]
    assert tracker.state == TrackState.WORKING
    tracked = [r for r in tracker.trajectory if r.tracked]
    assert len(tracked) >= 35


def test_inserts_keyframes_and_points(tracked_run):
    tracker = tracked_run["tracker"]
    assert tracker.slam_map.n_kf >= 3
    assert tracker.slam_map.n_mp >= 150


def test_ate_near_zero(tracked_run):
    tracker = tracked_run["tracker"]
    poses = tracked_run["poses"]
    est, gt = [], []
    for rec in tracker.trajectory:
        if not rec.tracked:
            continue
        R_gt, t_gt = poses[rec.frame_id]
        est.append(-rec.R.T @ rec.t)     # camera center, estimated
        gt.append(-R_gt.T @ t_gt)
    est = np.asarray(est)
    gt = np.asarray(gt)
    # monocular: align with scale; trajectory spans ~2.4 m
    rmse = traj.ate_rmse(est, gt, with_scale=True)
    span = np.linalg.norm(gt.max(0) - gt.min(0))
    assert rmse < 0.02 * span, f"ATE {rmse:.4f} m over span {span:.2f} m"


def test_trajectory_roundtrip(tmp_path, tracked_run):
    tracker = tracked_run["tracker"]
    rows = tracker.keyframe_trajectory()
    p = str(tmp_path / "kf.txt")
    traj.save_tum(p, rows)
    loaded = traj.load_tum(p)
    # culled keyframes are skipped on export (main.cc:169 isBad skip)
    n_valid = int(np.asarray(
        tracker.slam_map.state.kf_valid[: tracker.slam_map.n_kf]).sum())
    assert loaded.shape[0] == n_valid
    assert loaded.shape[1] == 8


def test_obs_mirror_consistent_after_run(tracked_run):
    """After a full tracked run (insertions, triangulation, fuse, BA
    write-back, culling), the maintained host observation mirror must
    equal the device table bitwise (mapstore.SlamMap.obs_np)."""
    smap = tracked_run["tracker"].slam_map
    np.testing.assert_array_equal(np.asarray(smap.state.kf_obs), smap.obs_np)
    np.testing.assert_array_equal(
        np.asarray(smap.state.kf_valid), smap.kf_valid_np)
    np.testing.assert_array_equal(
        np.asarray(smap.state.mp_valid), smap.mp_valid_np)
    for name, arr in smap.host.items():
        if name in ("mp_found", "mp_visible"):
            continue   # insert-time snapshots by design (tracking updates
            #            them per batch; culling reads keyframe-time values)
        np.testing.assert_array_equal(
            np.asarray(getattr(smap.state, name)), arr, err_msg=name)
