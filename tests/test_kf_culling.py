"""KeyFrame culling parity: same-or-finer-octave redundancy condition
(src/LocalMapping.cc:563-580) and greedy spanning-tree re-parenting on
erase (src/KeyFrame.cc:519-588)."""
import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.config import (
    CameraConfig, ExtractorConfig, MapConfig, SystemConfig,
)
from orb_slam_tpu.geometry import camera as cam_mod
from orb_slam_tpu.mapping import mapstore
from orb_slam_tpu.pipeline.local_mapper import LocalMapper


def make_cfg(n_kf=8, n_pts=64):
    return SystemConfig(
        camera=CameraConfig(fx=500, fy=500, cx=320, cy=240,
                            k1=0, k2=0, p1=0, p2=0, k3=0,
                            width=640, height=480),
        extractor=ExtractorConfig(n_levels=8),
        map=MapConfig(max_keyframes=n_kf, max_points=n_pts),
    )


def build_map(cfg, n_kf, n_slots, kf_levels, rng):
    """n_kf keyframes all observing the same n_slots points; keyframe k's
    observations are at octave kf_levels[k]."""
    smap = mapstore.SlamMap.create(cfg.map, n_slots=n_slots)
    kfs = []
    for k in range(n_kf):
        kf = smap.add_keyframe(
            jnp.eye(3), jnp.zeros(3),
            jnp.asarray(rng.uniform(0, 400, (n_slots, 2)).astype(np.float32)),
            jnp.full(n_slots, kf_levels[k], jnp.int32),
            jnp.zeros(n_slots),
            jnp.asarray(rng.integers(0, 2**32, (n_slots, 8), dtype=np.uint32)),
            jnp.ones(n_slots, bool), jnp.full(n_slots, -1, jnp.int32),
            frame_id=k, timestamp=float(k), parent=k - 1)
        kfs.append(kf)
    ids = smap.add_points(
        jnp.asarray(rng.normal(0, 1, (n_slots, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2**32, (n_slots, 8), dtype=np.uint32)),
        jnp.zeros((n_slots, 3)), jnp.zeros(n_slots), jnp.full(n_slots, np.inf),
        kfs[0], np.ones(n_slots, bool))
    for kf in kfs:
        smap.set_observations(kf, jnp.arange(n_slots), jnp.asarray(ids))
    return smap, kfs


def make_mapper(cfg):
    return LocalMapper(cfg=cfg, cam=cam_mod.make_camera(cfg.camera))


def test_cull_allows_same_or_finer_octave(rng):
    # kf 1 observes at octave 2; the others observe the same points at
    # octaves <= 3 (= 2+1) -> redundant cover -> kf 1 is culled.
    cfg = make_cfg()
    smap, kfs = build_map(cfg, 5, 32, [0, 2, 3, 1, 0], rng)
    mapper = make_mapper(cfg)
    n = mapper.cull_keyframes(smap, current_kf=kfs[-1])
    assert n >= 1
    assert not bool(np.asarray(smap.state.kf_valid)[kfs[1]])


def test_cull_blocked_by_coarser_others(rng):
    # kf 1 observes at octave 0; others at octave 2 (> 1) -> no cover.
    cfg = make_cfg()
    smap, kfs = build_map(cfg, 5, 32, [2, 0, 2, 2, 2], rng)
    mapper = make_mapper(cfg)
    mapper.cull_keyframes(smap, current_kf=kfs[-1])
    assert bool(np.asarray(smap.state.kf_valid)[kfs[1]])


def test_greedy_reparenting_chains_children(rng):
    """Erase kf 1 with two children k2, k3: k2 is covisible with the
    original parent k0 and k3 only with k2 — greedy must chain k2 -> k0
    then k3 -> k2 (grandparent re-parenting would hand both to k0)."""
    cfg = make_cfg(n_kf=8, n_pts=128)
    n = 48
    smap = mapstore.SlamMap.create(cfg.map, n_slots=n)

    def add_kf(parent):
        return smap.add_keyframe(
            jnp.eye(3), jnp.zeros(3),
            jnp.asarray(rng.uniform(0, 400, (n, 2)).astype(np.float32)),
            jnp.zeros(n, jnp.int32), jnp.zeros(n),
            jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32)),
            jnp.ones(n, bool), jnp.full(n, -1, jnp.int32),
            frame_id=smap.n_kf, timestamp=float(smap.n_kf), parent=parent)

    k0 = add_kf(-1)
    k1 = add_kf(k0)
    k2 = add_kf(k1)
    k3 = add_kf(k1)
    ids = smap.add_points(
        jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32)),
        jnp.zeros((n, 3)), jnp.zeros(n), jnp.full(n, np.inf),
        k0, np.ones(n, bool))
    # k2 shares slots 0..19 with k0; k3 shares slots 20..39 with k2 only.
    smap.set_observations(k0, jnp.arange(0, 20), jnp.asarray(ids[0:20]))
    smap.set_observations(k2, jnp.arange(0, 40), jnp.asarray(ids[0:40]))
    smap.set_observations(k3, jnp.arange(20, 40), jnp.asarray(ids[20:40]))

    mapper = make_mapper(cfg)
    mapper._erase_keyframe(smap, k1)
    assert int(smap.parent[k2]) == k0
    assert int(smap.parent[k3]) == k2
    assert int(smap.parent[k1]) == -1


def test_reparenting_falls_back_to_grandparent(rng):
    cfg = make_cfg(n_kf=8, n_pts=128)
    n = 16
    smap = mapstore.SlamMap.create(cfg.map, n_slots=n)

    def add_kf(parent):
        return smap.add_keyframe(
            jnp.eye(3), jnp.zeros(3),
            jnp.asarray(rng.uniform(0, 400, (n, 2)).astype(np.float32)),
            jnp.zeros(n, jnp.int32), jnp.zeros(n),
            jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32)),
            jnp.ones(n, bool), jnp.full(n, -1, jnp.int32),
            frame_id=smap.n_kf, timestamp=float(smap.n_kf), parent=parent)

    k0 = add_kf(-1)
    k1 = add_kf(k0)
    k2 = add_kf(k1)  # child of k1, no shared observations with anyone
    mapper = make_mapper(cfg)
    mapper._erase_keyframe(smap, k1)
    assert int(smap.parent[k2]) == k0
