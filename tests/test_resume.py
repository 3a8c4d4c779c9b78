"""Checkpoint/resume e2e (SURVEY §5.4 — beyond reference parity): track a
rendered sequence, persist the map, resume in a FRESH System, relocalize
into the loaded map, and keep tracking.  Exercises checkpoint round-trip of
the dual-resident host mirrors, place-recognition rebuild from host
descriptors, and the LOST->relocalized->WORKING transition."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.slow
def test_checkpoint_resume_relocalizes(tmp_path):
    from endurance_run import (build_world, lap_poses, render_image,
                               endurance_config, default_vocab100k)
    from orb_slam_tpu.pipeline.system import System
    from orb_slam_tpu.pipeline.tracker import TrackState

    rng = np.random.default_rng(7)
    # the 10^5-word vocabulary: the 10^4 prebuilt assigns ~600 random-patch
    # descriptors too uniformly for discriminative retrieval on this world
    cfg = endurance_config(max_keyframes=28, frame_batch=4,
                           vocab_path=default_vocab100k())
    X, patches = build_world(rng)
    poses, _ = lap_poses(260, 300, rng)
    K = cfg.camera.K

    sysA = System.create(cfg)
    for i in range(200):
        R, t = poses[i]
        sysA.process_image(render_image(X, patches, R, t, K),
                           timestamp=i / 30.0)
    assert sysA.tracker.state == TrackState.WORKING
    n_kf_saved = sysA.tracker.slam_map.n_kf
    assert n_kf_saved >= 5
    p = str(tmp_path / "map.npz")
    sysA.save_checkpoint(p)
    sysA.shutdown()

    sysB = System.create(cfg)
    sysB.resume_checkpoint(p)
    tr = sysB.tracker
    assert tr.state == TrackState.LOST
    assert tr.slam_map.n_kf == n_kf_saved
    # mirrors restored bitwise
    np.testing.assert_array_equal(
        np.asarray(tr.slam_map.state.kf_obs), tr.slam_map.obs_np)
    np.testing.assert_array_equal(
        np.asarray(tr.slam_map.state.kf_desc),
        tr.slam_map.host["kf_desc"])

    # replay INSIDE the mapped region (the sequence covered 2/3 of a lap;
    # relocalizing into never-mapped territory is not a fair ask)
    events = []
    for j, i in enumerate(range(160, 200)):
        R, t = poses[i]
        m = sysB.process_image(render_image(X, patches, R, t, K),
                               timestamp=(i + 200) / 30.0)
        if m.get("event"):
            events.append(m["event"])
        if tr.state == TrackState.WORKING and j >= 12:
            break
    assert "relocalized" in events, events
    assert tr.state == TrackState.WORKING
    # tracking continues against the LOADED landmarks (no re-init):
    # keyframe ids keep growing from the restored pool
    assert tr.slam_map.n_kf >= n_kf_saved
    tr.finish()   # retire in-flight batched frames before counting
    tracked = [r for r in tr.trajectory if r.tracked]
    assert len(tracked) >= 10
    sysB.shutdown()
