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
    smap.mp_valid_np[np.asarray(dead)] = False
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
    smap.mp_valid_np[np.asarray(ids[:15])] = False
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


def test_keyframe_compaction_packs_and_remaps():
    """compact_keyframes packs live keyframes, remaps the spanning tree,
    loop edges, host metadata, and mp_ref_kf/mp_first_kf."""
    from orb_slam_tpu.config import MapConfig
    cfg = MapConfig(max_keyframes=6, max_points=32)
    n = 8
    smap = mapstore.SlamMap.create(cfg, n_slots=n)
    rng = np.random.default_rng(3)

    def add_kf(parent):
        return smap.add_keyframe(
            jnp.eye(3), jnp.full(3, float(smap.n_kf)),
            jnp.asarray(rng.uniform(0, 100, (n, 2)).astype(np.float32)),
            jnp.zeros(n, jnp.int32), jnp.zeros(n),
            jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32)),
            jnp.ones(n, bool), jnp.full(n, -1, jnp.int32),
            frame_id=smap.n_kf * 10, timestamp=float(smap.n_kf),
            parent=parent)

    ks = [add_kf(-1)]
    for _ in range(5):
        ks.append(add_kf(ks[-1]))
    ids = smap.add_points(
        jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32)),
        jnp.zeros((n, 3)), jnp.zeros(n), jnp.full(n, np.inf),
        ks[2], np.ones(n, bool))
    smap.set_observations(ks[4], jnp.arange(n), jnp.asarray(ids))
    smap.loop_edges = [(ks[1], ks[4])]

    # cull keyframes 2 and 3 (observations already cleared for 2: none)
    st = smap.state
    smap.state = st._replace(
        kf_valid=st.kf_valid.at[jnp.asarray([ks[2], ks[3]])].set(False))
    smap.kf_valid_np[[ks[2], ks[3]]] = False
    # re-parent k4 to k1 like the eraser would
    smap.parent[ks[4]] = ks[1]

    t_before = np.asarray(smap.state.kf_t)[[0, 1, 4, 5]]
    freed = smap.compact_keyframes()
    assert freed == 2
    assert smap.n_kf == 4
    lut = smap.last_kf_compaction_lut
    assert lut[ks[0]] == 0 and lut[ks[1]] == 1
    assert lut[ks[2]] == -1 and lut[ks[3]] == -1
    assert lut[ks[4]] == 2 and lut[ks[5]] == 3

    st = smap.state
    np.testing.assert_array_equal(np.asarray(st.kf_t)[:4], t_before)
    assert list(np.asarray(st.kf_valid)[:4]) == [True] * 4
    assert not np.asarray(st.kf_valid)[4:].any()
    # spanning tree: k4 (-> new 2) hangs off k1 (-> new 1); k5 walks
    # through culled k4? no - k5's parent k4 is live -> new 2
    assert smap.parent[2] == 1
    assert smap.parent[3] == 2
    assert smap.loop_edges == [(1, 2)]
    assert list(smap.kf_frame_id[:4]) == [0, 10, 40, 50]
    # landmarks' reference keyframe ks[2] was culled -> -1; obs rows moved
    assert (np.asarray(st.mp_ref_kf)[np.asarray(ids)] == -1).all()
    obs_new = np.asarray(st.kf_obs)
    np.testing.assert_array_equal(obs_new[2], np.asarray(ids))


def test_keyframe_pool_full_compacts_on_insert():
    """add_keyframe at a full pool with holes compacts instead of raising."""
    from orb_slam_tpu.config import MapConfig
    cfg = MapConfig(max_keyframes=4, max_points=16)
    n = 4
    smap = mapstore.SlamMap.create(cfg, n_slots=n)
    rng = np.random.default_rng(0)

    def add_kf():
        return smap.add_keyframe(
            jnp.eye(3), jnp.zeros(3),
            jnp.asarray(rng.uniform(0, 100, (n, 2)).astype(np.float32)),
            jnp.zeros(n, jnp.int32), jnp.zeros(n),
            jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32)),
            jnp.ones(n, bool), jnp.full(n, -1, jnp.int32),
            frame_id=smap.n_kf, timestamp=0.0, parent=-1)

    for _ in range(4):
        add_kf()
    st = smap.state
    smap.state = st._replace(kf_valid=st.kf_valid.at[1].set(False))
    smap.kf_valid_np[1] = False
    k = add_kf()  # would raise without compaction
    assert k == 3
    assert smap.n_kf == 4


def test_keyframe_pool_grows_when_all_live():
    """A full pool with NO holes doubles instead of raising: ids stay
    stable, old rows are intact, new insertions land past the old capacity
    (the TPU-native analog of the reference's unbounded std::set map,
    src/Map.cc — bounded compile buckets via geometric growth)."""
    cfg = MapConfig(max_keyframes=4, max_points=16)
    n = 4
    smap = mapstore.SlamMap.create(cfg, n_slots=n)
    rng = np.random.default_rng(1)

    def add_kf():
        return smap.add_keyframe(
            jnp.eye(3), jnp.zeros(3),
            jnp.asarray(rng.uniform(0, 100, (n, 2)).astype(np.float32)),
            jnp.zeros(n, jnp.int32), jnp.zeros(n),
            jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32)),
            jnp.ones(n, bool), jnp.full(n, -1, jnp.int32),
            frame_id=smap.n_kf, timestamp=float(smap.n_kf), parent=-1)

    for _ in range(4):
        add_kf()
    desc_before = np.asarray(smap.state.kf_desc[:4]).copy()
    k = add_kf()  # all 4 slots live -> must grow, not raise
    assert k == 4
    assert smap.cfg.max_keyframes == 8
    assert smap.state.kf_valid.shape[0] == 8
    assert smap.parent.shape[0] == 8
    assert smap.kf_frame_id[4] == 4
    np.testing.assert_array_equal(
        np.asarray(smap.state.kf_desc[:4]), desc_before)
    assert not bool(np.asarray(smap.state.kf_valid[5:]).any())
    # growth composes with compaction: free a slot, fill up again
    st = smap.state
    smap.state = st._replace(kf_valid=st.kf_valid.at[0].set(False))
    smap.kf_valid_np[0] = False
    for _ in range(3):
        add_kf()
    assert smap.n_kf == 8 and smap.cfg.max_keyframes == 8
    add_kf()  # hole at 0 -> compacts back to 7 live, inserts at 7
    assert smap.n_kf == 8 and smap.cfg.max_keyframes == 8


def test_database_grows_with_pool():
    from orb_slam_tpu.place.database import BowDatabase
    from orb_slam_tpu.place.vocabulary import SparseBow, PAD_ID
    db = BowDatabase.create(4, 8)
    bow = SparseBow(ids=np.full(8, PAD_ID, np.int32),
                    weights=np.zeros(8, np.float32))
    db = db.add(2, bow)
    g = db.grown(8)
    assert g.ids.shape == (8, 8) and g.has_row[2] and not g.has_row[4:].any()
    assert g.grown(8) is g


def test_obs_mirror_stays_consistent():
    """SlamMap.obs_np is the authoritative host mirror of state.kf_obs —
    every mutator (insert, set_observations*, compaction, growth) must keep
    the two bitwise equal (keyframe-rate logic reads the mirror instead of
    re-fetching the device array)."""
    cfg = MapConfig(max_keyframes=4, max_points=32)
    n = 8
    smap = mapstore.SlamMap.create(cfg, n_slots=n)
    rng = np.random.default_rng(3)

    def check():
        np.testing.assert_array_equal(
            np.asarray(smap.state.kf_obs), smap.obs_np)
        np.testing.assert_array_equal(
            np.asarray(smap.state.kf_valid), smap.kf_valid_np)
        np.testing.assert_array_equal(
            np.asarray(smap.state.mp_valid), smap.mp_valid_np)

    def add_kf(obs):
        return smap.add_keyframe(
            jnp.eye(3), jnp.zeros(3),
            jnp.asarray(rng.uniform(0, 100, (n, 2)).astype(np.float32)),
            jnp.zeros(n, jnp.int32), jnp.zeros(n),
            jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32)),
            jnp.ones(n, bool), np.asarray(obs, np.int32),
            frame_id=smap.n_kf, timestamp=0.0)

    k0 = add_kf(np.full(n, -1)); check()
    ids = smap.add_points(
        jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32)),
        jnp.zeros((n, 3)), jnp.zeros(n), jnp.full(n, np.inf),
        k0, np.ones(n, bool))
    smap.set_observations(k0, np.arange(n), np.asarray(ids)); check()
    k1 = add_kf(ids); check()
    smap.set_observations_multi(
        np.full(4, k1, np.int32), np.arange(4, dtype=np.int32),
        np.asarray(ids[:4], np.int32)); check()
    # point compaction remaps the mirror through the same LUT
    st = smap.state
    smap.state = st._replace(mp_valid=st.mp_valid.at[ids[0]].set(False))
    smap.mp_valid_np[ids[0]] = False
    smap.compact_points(); check()
    # keyframe compaction packs the mirror
    st = smap.state
    smap.state = st._replace(kf_valid=st.kf_valid.at[k0].set(False))
    smap.kf_valid_np[k0] = False
    smap.compact_keyframes(); check()
    # growth pads it
    smap.grow_keyframes(); check()
    assert smap.obs_np.shape[0] == smap.state.kf_obs.shape[0]


def test_refresh_host_mirrors_stay_writable():
    """refresh_host (loop-rate re-fetch) must store WRITABLE copies: the
    next keyframe insertion patches mirror rows in place (np.asarray of a
    device array is read-only — caught by the endurance drive)."""
    cfg = MapConfig(max_keyframes=4, max_points=16)
    smap = mapstore.SlamMap.create(cfg, n_slots=4)
    smap.refresh_host()
    for name, arr in smap.host.items():
        assert arr.flags.writeable, name
    smap.host["kf_R"][0] = np.eye(3)  # must not raise
