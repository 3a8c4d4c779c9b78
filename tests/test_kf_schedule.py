"""Pinned keyframe-insertion schedule (tracker.kf_schedule).

The sharded-loop comparison (SHARDED_LOOP_r05.json, VERDICT r4 #6)
replays run A's insertion decisions into run B so the sharded Schur
reduction is the only policy-level free variable.  That replay relies
on kf_schedule REPLACING NeedNewKeyFrame (Tracking.cc:651-689): insert
at every scheduled tracked frame, never at an unscheduled one.  This
test pins the replay contract on the synchronous path, where the
decision cannot be deferred by mapper backpressure: replaying a run's
own organic schedule must reproduce the run exactly, and adding one
unscheduled frame must force exactly one extra insertion there.
"""
import numpy as np

from orb_slam_tpu.pipeline.tracker import Tracker, TrackState
from synthetic_sequence import make_world, circular_trajectory, render_frame
from test_pipeline import small_config


def _run(schedule=None, n_frames=40):
    rng = np.random.default_rng(11)
    cfg = small_config()
    X, desc = make_world(rng, n_points=900)
    K = cfg.camera.K
    poses = circular_trajectory(n_frames)
    tracker = Tracker.create(cfg)
    if schedule is not None:
        tracker.kf_schedule = set(schedule)
    inserted = []
    for i, (R, t) in enumerate(poses):
        feats, _ = render_frame(rng, X, desc, R, t, K)
        log = tracker.process(feats, timestamp=i / 30.0)
        if log.get("event") == "keyframe_inserted":
            inserted.append(i)
    return tracker, inserted


def test_replaying_own_schedule_reproduces_the_run():
    t_a, sched_a = _run()
    assert t_a.state == TrackState.WORKING
    assert len(sched_a) >= 2, sched_a

    t_b, sched_b = _run(schedule=sched_a)
    assert t_b.state == TrackState.WORKING
    # pinned replay inserts at exactly the organic frames (the first two
    # post-init insertions on this world are the organic run's own), and
    # the trajectories agree to float tolerance
    assert sched_b == sched_a, (sched_a, sched_b)
    pa = {r.frame_id: (r.R, r.t) for r in t_a.trajectory if r.tracked}
    pb = {r.frame_id: (r.R, r.t) for r in t_b.trajectory if r.tracked}
    assert pa.keys() == pb.keys()
    for fid, (Ra, ta) in pa.items():
        Rb, tb = pb[fid]
        np.testing.assert_allclose(ta, tb, atol=1e-5, err_msg=str(fid))
        np.testing.assert_allclose(Ra, Rb, atol=1e-5, err_msg=str(fid))


def test_schedule_forces_an_unscheduled_insertion():
    _, sched_a = _run()
    extra = max(sched_a) + 2   # a tracked frame the organic policy skipped
    assert extra not in sched_a and extra < 40
    _, sched_c = _run(schedule=sorted(set(sched_a) | {extra}))
    assert extra in sched_c, (sched_a, sched_c)
