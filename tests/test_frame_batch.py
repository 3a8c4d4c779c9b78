"""Micro-batched tracking (frame_step_scan): B frames per device program
must reproduce the per-frame dispatch path.

The scan chains pose/feature state through the carry exactly like the
software pipeline chains it through device handles, so trajectories agree
up to keyframe-decision lag (B-1 frames at most)."""
import numpy as np
import pytest

from orb_slam_tpu.config import (
    CameraConfig, ExtractorConfig, MapConfig, MatcherConfig, SystemConfig,
    TrackerConfig,
)
from orb_slam_tpu.pipeline.system import System
from orb_slam_tpu.pipeline.tracker import TrackState
from synthetic import rotmat
from test_image_e2e import render_image


def run_system(frame_batch, n_frames=20, **tracker_kw):
    rng = np.random.default_rng(5)
    n_pts = 500
    X = np.stack([
        rng.uniform(-6, 6, n_pts),
        rng.uniform(-3.5, 3.5, n_pts),
        rng.uniform(4, 10, n_pts),
    ], 1).astype(np.float32)
    patches = rng.uniform(0, 255, (n_pts, 9, 9)).astype(np.float32)

    cfg = SystemConfig(
        camera=CameraConfig(fx=500, fy=500, cx=320, cy=240,
                            k1=0, k2=0, p1=0, p2=0, k3=0,
                            width=640, height=480),
        extractor=ExtractorConfig(n_features=600, max_keypoints=640,
                                  n_levels=4),
        matcher=MatcherConfig(window_init=120),
        map=MapConfig(max_keyframes=32, max_points=4096,
                      local_ba_max_kfs=8, local_ba_max_fixed=8,
                      local_ba_max_points=2048),
        tracker=TrackerConfig(async_mapping=True, frame_batch=frame_batch,
                              **tracker_kw),
    )
    system = System.create(cfg)
    K = cfg.camera.K
    for i in range(n_frames):
        R = rotmat([0, 1, 0], np.radians(0.3 * i))
        t = np.array([-0.08 * i, 0.0, 0.01 * i], np.float32)
        system.process_image(render_image(X, patches, R, t, K),
                             timestamp=i / 30.0)
    system.tracker.finish()
    return system


@pytest.mark.slow
def test_batched_matches_per_frame():
    s1 = run_system(frame_batch=1)
    s4 = run_system(frame_batch=4)
    assert s1.tracker.state == TrackState.WORKING
    assert s4.tracker.state == TrackState.WORKING

    t1 = {r.frame_id: r for r in s1.tracker.trajectory}
    t4 = {r.frame_id: r for r in s4.tracker.trajectory}
    common = sorted(set(t1) & set(t4))
    assert len(common) >= 10
    n_tracked1 = sum(t1[f].tracked for f in common)
    n_tracked4 = sum(t4[f].tracked for f in common)
    assert n_tracked4 >= n_tracked1 - 2
    # poses agree where both tracked (keyframe-lag changes BA timing, so
    # compare loosely in position)
    for f in common:
        if t1[f].tracked and t4[f].tracked:
            c1 = -t1[f].R.T @ t1[f].t
            c4 = -t4[f].R.T @ t4[f].t
            assert np.linalg.norm(c1 - c4) < 0.25, (f, c1, c4)


@pytest.mark.slow
def test_batched_partial_flush():
    """finish() must flush a partial batch (padded dispatch) and keep the
    trajectory complete."""
    s = run_system(frame_batch=4, n_frames=18)  # (18 - init) % 4 != 0
    fids = [r.frame_id for r in s.tracker.trajectory]
    assert len(set(fids)) == len(fids)
    assert max(fids) == 17


@pytest.mark.slow
def test_batched_loss_mid_batch_recovers():
    """A blackout inside a batch must mark the lost rows untracked, route
    the rest through the staged machine, and relocalize when texture
    returns — same contract as the per-frame pipeline."""
    rng = np.random.default_rng(5)
    n_pts = 500
    X = np.stack([
        rng.uniform(-6, 6, n_pts),
        rng.uniform(-3.5, 3.5, n_pts),
        rng.uniform(4, 10, n_pts),
    ], 1).astype(np.float32)
    patches = rng.uniform(0, 255, (n_pts, 9, 9)).astype(np.float32)
    cfg = SystemConfig(
        camera=CameraConfig(fx=500, fy=500, cx=320, cy=240,
                            k1=0, k2=0, p1=0, p2=0, k3=0,
                            width=640, height=480),
        extractor=ExtractorConfig(n_features=600, max_keypoints=640,
                                  n_levels=4),
        matcher=MatcherConfig(window_init=120),
        map=MapConfig(max_keyframes=32, max_points=4096,
                      local_ba_max_kfs=8, local_ba_max_fixed=8,
                      local_ba_max_points=2048),
        tracker=TrackerConfig(async_mapping=True, frame_batch=4,
                              reset_if_lost_before_kfs=0),
    )
    system = System.create(cfg)
    K = cfg.camera.K
    black = np.full((480, 640), 90.0, np.float32)
    for i in range(26):
        if 14 <= i < 18:     # blackout spanning a batch boundary
            img = black
        else:
            R = rotmat([0, 1, 0], np.radians(0.3 * min(i, 13)))
            t = np.array([-0.08 * min(i, 13), 0.0, 0.01 * min(i, 13)],
                         np.float32)
            img = render_image(X, patches, R, t, K)
        system.process_image(img, timestamp=i / 30.0)
    system.tracker.finish()
    rec = {r.frame_id: r for r in system.tracker.trajectory}
    # lost frames recorded as untracked, not silently dropped
    lost = [f for f in range(14, 18) if f in rec and not rec[f].tracked]
    assert lost, "blackout frames should appear untracked"
    # trajectory completeness (r5): once the map exists, EVERY frame —
    # tracked, lost, mid-batch-aborted, or recovered — leaves exactly one
    # record; a live consumer never sees a gap.  (Pre-init frames carry no
    # pose by definition — the reference's trajectory also starts at the
    # initialized map, src/Tracking.cc:181-205.)
    tracked_fids = sorted(f for f in rec if rec[f].tracked)
    first = tracked_fids[1]   # 2nd init view: the map exists from here
    missing = [f for f in range(first, 26) if f not in rec]
    assert not missing, f"frames with no trajectory record: {missing}"
    # after texture returns the system relocalizes (or it reset+reinit —
    # either way it must end WORKING and track the tail)
    assert system.tracker.state == TrackState.WORKING
    tail_tracked = sum(1 for f in range(20, 26)
                       if f in rec and rec[f].tracked)
    assert tail_tracked >= 3, tail_tracked


@pytest.mark.slow
def test_prefetch_host_blob_is_value_neutral():
    """prefetch_host_blob only moves the D2H start to dispatch time
    (copy_to_host_async) — with the mapper service interval pinned, the
    trajectory must be IDENTICAL to the synchronous-fetch run."""
    kw = dict(mapper_service_polls=4)
    s_off = run_system(frame_batch=4, **kw)
    s_on = run_system(frame_batch=4, prefetch_host_blob=True, **kw)
    assert not s_on.tracker._prefetch_failed   # CPU PJRT supports async D2H
    t_off = {r.frame_id: r for r in s_off.tracker.trajectory}
    t_on = {r.frame_id: r for r in s_on.tracker.trajectory}
    assert t_off.keys() == t_on.keys()
    for f, a in t_off.items():
        b = t_on[f]
        assert a.tracked == b.tracked, f
        np.testing.assert_array_equal(a.R, b.R, err_msg=str(f))
        np.testing.assert_array_equal(a.t, b.t, err_msg=str(f))


def test_frame_batch_clamped_to_keyframe_cadence():
    """frame_batch beyond max_frames_between_kf starves the keyframe policy
    (BENCH_SWEEP_r03: fb=24 collapsed to 0.69 fps); Tracker.create must
    clamp it to the cadence bound and warn (VERDICT r3 weak #5)."""
    import warnings

    from orb_slam_tpu.pipeline.tracker import Tracker

    cfg = SystemConfig(
        tracker=TrackerConfig(async_mapping=True, frame_batch=24))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        tr = Tracker.create(cfg)
    assert tr.cfg.tracker.frame_batch == \
        cfg.tracker.max_frames_between_kf == 18
    assert any("frame_batch" in str(x.message) for x in w)

    # an in-bounds value passes through untouched, no warning
    cfg2 = SystemConfig(
        tracker=TrackerConfig(async_mapping=True, frame_batch=16))
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        tr2 = Tracker.create(cfg2)
    assert tr2.cfg.tracker.frame_batch == 16
    assert not any("frame_batch" in str(x.message) for x in w2)
