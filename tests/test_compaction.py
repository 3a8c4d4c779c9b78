"""Map-point pool compaction: pack live landmarks, remap observations."""
import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.config import MapConfig
from orb_slam_tpu.mapping import mapstore


def build_map(n_pts=20, cap=24):
    cfg = MapConfig(max_keyframes=4, max_points=cap)
    smap = mapstore.SlamMap.create(cfg, n_slots=n_pts)
    rng = np.random.default_rng(0)
    kf = smap.add_keyframe(
        jnp.eye(3), jnp.zeros(3),
        jnp.asarray(rng.uniform(0, 100, (n_pts, 2)).astype(np.float32)),
        jnp.zeros(n_pts, jnp.int32), jnp.zeros(n_pts),
        jnp.asarray(rng.integers(0, 2**32, (n_pts, 8), dtype=np.uint32)),
        jnp.ones(n_pts, bool), jnp.full(n_pts, -1, jnp.int32),
        frame_id=0, timestamp=0.0)
    ids = smap.add_points(
        jnp.asarray(rng.normal(0, 1, (n_pts, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2**32, (n_pts, 8), dtype=np.uint32)),
        jnp.zeros((n_pts, 3)), jnp.zeros(n_pts), jnp.full(n_pts, np.inf),
        kf, np.ones(n_pts, bool))
    smap.set_observations(kf, jnp.arange(n_pts), jnp.asarray(ids))
    return smap, kf, ids


def test_compaction_packs_and_remaps():
    smap, kf, ids = build_map()
    st = smap.state
    pos_before = np.asarray(st.mp_pos)
    # kill every other point
    dead = ids[::2]
    smap.state = st._replace(
        mp_valid=st.mp_valid.at[jnp.asarray(dead)].set(False))
    freed = smap.compact_points()
    assert freed == 10
    assert smap.n_mp == 10
    st = smap.state
    obs = np.asarray(st.kf_obs[kf])
    # dead slots cleared; live slots remapped into [0, 10)
    assert (obs[::2] == -1).all()
    live_obs = obs[1::2]
    assert (live_obs >= 0).all() and (live_obs < 10).all()
    # positions preserved through the remap
    for slot in range(1, 20, 2):
        np.testing.assert_array_equal(
            np.asarray(st.mp_pos)[obs[slot]], pos_before[ids[slot]])


def test_add_points_triggers_compaction():
    smap, kf, ids = build_map(n_pts=20, cap=24)
    st = smap.state
    smap.state = st._replace(
        mp_valid=st.mp_valid.at[jnp.asarray(ids[:15])].set(False))
    rng = np.random.default_rng(1)
    # 12 new points only fit after compacting the 15 dead rows
    new_ids = smap.add_points(
        jnp.asarray(rng.normal(0, 1, (12, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2**32, (12, 8), dtype=np.uint32)),
        jnp.zeros((12, 3)), jnp.zeros(12), jnp.full(12, np.inf),
        kf, np.ones(12, bool))
    assert (new_ids >= 0).all()
    assert smap.n_mp == 5 + 12


def test_full_pool_truncates_gracefully():
    smap, kf, ids = build_map(n_pts=20, cap=24)
    rng = np.random.default_rng(2)
    new_ids = smap.add_points(
        jnp.asarray(rng.normal(0, 1, (10, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2**32, (10, 8), dtype=np.uint32)),
        jnp.zeros((10, 3)), jnp.zeros(10), jnp.full(10, np.inf),
        kf, np.ones(10, bool))
    # all 20 existing points live: only 4 of 10 fit
    assert (new_ids >= 0).sum() == 4
    assert smap.n_mp == 24
