"""Relocalisation and loop closing integration tests (BASELINE configs 2-3
analogs on synthetic feature sequences)."""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam_tpu.pipeline.tracker import Tracker, TrackState
from orb_slam_tpu.frontend.extractor import FrameFeatures
from synthetic_sequence import make_world, circular_trajectory, render_frame
from test_pipeline import small_config


def blank_frame(n_slots=512):
    return FrameFeatures(
        xy=jnp.zeros((n_slots, 2)),
        response=jnp.zeros(n_slots),
        angle=jnp.zeros(n_slots),
        level=jnp.zeros(n_slots, jnp.int32),
        desc=jnp.zeros((n_slots, 8), jnp.uint32),
        valid=jnp.zeros(n_slots, bool),
    )


def test_relocalisation_after_blackout():
    rng = np.random.default_rng(13)
    cfg = small_config()
    X, desc = make_world(rng, n_points=900)
    K = cfg.camera.K
    poses = circular_trajectory(40)
    tracker = Tracker.create(cfg)
    events = []
    for i, (R, t) in enumerate(poses):
        if 20 <= i < 25:
            feats = blank_frame()  # camera covered -> tracking must drop
        else:
            feats, _ = render_frame(rng, X, desc, R, t, K)
        m = tracker.process(feats, timestamp=i / 30.0)
        events.append(m.get("event"))
    assert "map_initialized" in events
    assert "tracking_lost" in events
    assert "relocalized" in events, f"events: {events}"
    assert tracker.state == TrackState.WORKING


def test_loop_closure_on_revisit():
    """A full driving loop: the tracker returns to the start region with the
    early keyframes out of covisibility; the loop closer must detect the
    revisit and correct (loop edge recorded)."""
    from synthetic_sequence import driving_loop, annulus_world
    rng = np.random.default_rng(17)
    cfg = small_config()
    X, desc = annulus_world(rng, n_points=6000)
    prio = rng.uniform(size=len(X))
    K = cfg.camera.K
    poses = driving_loop(110)

    tracker = Tracker.create(cfg)
    loop_events = []
    for i, (R, t) in enumerate(poses):
        feats, _ = render_frame(rng, X, desc, R, t, K, priority=prio)
        m = tracker.process(feats, timestamp=i / 30.0)
        if m.get("loop_closed"):
            loop_events.append(i)
    assert tracker.state == TrackState.WORKING
    assert tracker.loop_closer.n_loops_closed >= 1, \
        f"no loop closed; kfs={tracker.slam_map.n_kf}"
    assert len(tracker.slam_map.loop_edges) >= 1
