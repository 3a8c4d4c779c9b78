"""Async keyframe-rate work (pipeline/async_mapper.py): the image pipeline
with local mapping + loop closing on a worker thread must track, build a
map, and commit results equivalent in kind to the synchronous path
(reference thread semantics, src/main.cc:123-133)."""
import numpy as np

from orb_slam_tpu.config import (
    CameraConfig, ExtractorConfig, MapConfig, MatcherConfig, SystemConfig,
    TrackerConfig,
)
from orb_slam_tpu.pipeline.system import System
from orb_slam_tpu.pipeline.tracker import TrackState
from synthetic import rotmat
from test_image_e2e import render_image


def _run(async_mapping: bool, n_frames: int = 24):
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
        tracker=TrackerConfig(async_mapping=async_mapping),
        map=MapConfig(max_keyframes=32, max_points=4096,
                      local_ba_max_kfs=8, local_ba_max_fixed=8,
                      local_ba_max_points=2048),
    )
    system = System.create(cfg)
    K = cfg.camera.K
    for i in range(n_frames):
        R = rotmat([0, 1, 0], np.radians(0.3 * i))
        t = np.array([-0.08 * i, 0.0, 0.01 * i], np.float32)
        img = render_image(X, patches, R, t, K)
        system.process_image(img, timestamp=i / 30.0)
    system.tracker.finish()
    return system


def test_async_pipeline_tracks_and_maps():
    system = _run(async_mapping=True)
    tr = system.tracker
    assert tr.state == TrackState.WORKING
    tracked = [r for r in tr.trajectory if r.tracked]
    assert len(tracked) >= 10, f"tracked {len(tracked)}"
    # mapping work was actually committed: triangulation grew the map well
    # beyond the bootstrap set
    assert tr.slam_map.n_kf >= 3
    assert tr.slam_map.n_mp > 100
    # worker drained
    assert tr.async_mapper is not None and not tr.async_mapper.busy


def test_keyframe_pressure_gates():
    """The reference's two release valves under keyframe pressure
    (src/LocalMapping.cc:58-66, src/Tracking.cc:679-685): a queued
    keyframe skips fuse+BA+culling after triangulation; InterruptBA drops
    only the BA while culling still runs."""
    from orb_slam_tpu.pipeline.async_mapper import snapshot_map

    system = _run(async_mapping=True)
    tr = system.tracker
    am = tr.async_mapper
    lm = am.local_mapper
    kf = int(np.where(tr.slam_map.kf_valid_np)[0].max())

    m_q = lm.process_keyframe(snapshot_map(tr.slam_map), kf,
                              kf_queued=lambda: True)
    assert m_q.get("skipped_for_queued_kf")
    assert "fused" not in m_q and "culled_kfs" not in m_q

    m_i = lm.process_keyframe(snapshot_map(tr.slam_map), kf,
                              interrupt_ba=lambda: True)
    assert m_i.get("ba_interrupted")
    assert "fused" in m_i and "culled_kfs" in m_i

    m_full = lm.process_keyframe(snapshot_map(tr.slam_map), kf)
    assert "ba_interrupted" not in m_full and "culled_kfs" in m_full

    # the events are job-scoped: stale signals must not leak into the
    # next submission
    am.interrupt_ba.set()
    am.kf_queued.set()
    am.submit(tr.slam_map, kf)
    assert not am.interrupt_ba.is_set() and not am.kf_queued.is_set()
    am.flush()


def test_pinned_service_interval():
    """service_polls pins the worker's VISIBLE service interval: the
    result surfaces at exactly the N-th poll after submit regardless of
    how fast the thread actually ran — the determinism contract that
    makes long async-pipeline tests reproducible across machines."""
    import time
    from orb_slam_tpu.pipeline.async_mapper import AsyncMapper

    class InstantMapper:
        last_culled_kfs = []

        def process_keyframe(self, smap, kf, **kw):
            return {"ok": True}

    class FakeMap:
        last_compaction_lut = None

    am = AsyncMapper(InstantMapper(), None, service_polls=4)
    fake = FakeMap()
    am._busy = True   # bypass snapshot_map: submit real payload directly
    am.interrupt_ba.clear(); am.kf_queued.clear()
    am._polls_since_submit = 0
    am._in.put((fake, 0, None, None))
    time.sleep(0.2)   # let the instant job actually finish
    for _ in range(3):
        assert am.poll() is None and am.busy
    res = am.poll()
    assert res is not None and res.metrics.get("ok") and not am.busy
    am.shutdown()


def test_async_matches_sync_scale():
    """Async and sync runs of the same sequence agree on gross map scale and
    trajectory direction (not bitwise: commit timing differs by design)."""
    s_async = _run(async_mapping=True)
    s_sync = _run(async_mapping=False)
    ta, ts = s_async.tracker, s_sync.tracker
    assert ta.state == TrackState.WORKING and ts.state == TrackState.WORKING
    # both directions along +x
    for t in (ta, ts):
        centers = [(-r.R.T @ r.t) for r in t.trajectory if r.tracked]
        d = centers[-1] - centers[0]
        d = d / np.linalg.norm(d)
        assert d[0] > 0.9, f"direction {d}"
    # comparable map sizes (within 2x)
    assert ta.slam_map.n_mp > 0.5 * ts.slam_map.n_mp
