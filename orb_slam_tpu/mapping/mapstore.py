"""Flat SoA map state: the TPU-native replacement of the reference's
pointer-graph data model (Map / KeyFrame / MapPoint, src/Map.cc,
src/KeyFrame.cc, src/MapPoint.cc).

Design (SURVEY.md §7): fixed-capacity arrays + validity masks replace
std::set / new / delete; the observation graph is a dense per-keyframe slot
array (keypoint slot -> map-point id) instead of per-object maps; the
covisibility graph (KeyFrame::UpdateConnections, src/KeyFrame.cc:332-421) is
*derived* on demand from the observation incidence by one int matmul rather
than maintained mutably under mutexes.  All updates are pure array updates —
the entire class of lock-ordering bugs in the reference (§5.2) is gone by
construction.

Host-side scalars (n_kf, n_mp) control allocation; device arrays hold state.
The spanning tree and loop edges (tiny, irregular) live on host.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import MapConfig, ExtractorConfig
from ..ops import scatter as scatter_ops


class MapState(NamedTuple):
    """Device-resident SoA map (a pytree; every update returns a new one)."""

    # keyframes
    kf_valid: jnp.ndarray    # [K] bool
    kf_R: jnp.ndarray        # [K, 3, 3] world->cam
    kf_t: jnp.ndarray        # [K, 3]
    kf_xy: jnp.ndarray       # [K, N, 2] undistorted keypoint pixels (level-0)
    kf_level: jnp.ndarray    # [K, N] int32
    kf_angle: jnp.ndarray    # [K, N] float32
    kf_desc: jnp.ndarray     # [K, N, 8] uint32
    kf_kp_valid: jnp.ndarray  # [K, N] bool
    kf_obs: jnp.ndarray      # [K, N] int32 map-point id per slot, -1 = none
    # map points
    mp_valid: jnp.ndarray    # [P] bool
    mp_pos: jnp.ndarray      # [P, 3]
    mp_desc: jnp.ndarray     # [P, 8] uint32 representative descriptor
    mp_normal: jnp.ndarray   # [P, 3] mean viewing direction
    mp_min_dist: jnp.ndarray  # [P] scale-invariance band (MapPoint.cc:273-312)
    mp_max_dist: jnp.ndarray  # [P]
    mp_ref_kf: jnp.ndarray   # [P] int32
    mp_first_kf: jnp.ndarray  # [P] int32 (culling window anchor)
    mp_found: jnp.ndarray    # [P] int32 tracking found count
    mp_visible: jnp.ndarray  # [P] int32 tracking visible count


@dataclasses.dataclass
class SlamMap:
    """Host wrapper: device MapState + host allocation counters + the tiny
    irregular graphs (spanning tree, loop edges)."""

    state: MapState
    cfg: MapConfig
    n_kf: int = 0
    n_mp: int = 0
    parent: Optional[np.ndarray] = None       # [K] spanning-tree parent, -1 root
    loop_edges: Optional[list] = None          # list of (kf_a, kf_b)
    kf_frame_id: Optional[np.ndarray] = None   # [K] source frame index
    kf_timestamp: Optional[np.ndarray] = None  # [K] float64
    # old->new point-id LUT of the most recent compaction(s), composed; -1 =
    # dropped.  Consumers (async tracker commit) read and clear it.
    last_compaction_lut: Optional[np.ndarray] = None
    # old->new KEYFRAME-id LUT of the most recent keyframe compaction(s)
    last_kf_compaction_lut: Optional[np.ndarray] = None
    # lifetime compaction counters (observability: endurance runs assert the
    # pools actually wrapped)
    kf_compactions: int = 0
    pt_compactions: int = 0
    # authoritative HOST mirrors of state.kf_obs / kf_valid / mp_valid:
    # every mutation of these arrays is known host-side (insertion rows,
    # fuse/cull working copies, BA outlier erasures, compaction packing),
    # so the keyframe-rate graph logic (covisibility, culling, BA windows,
    # place recognition) reads the mirrors instead of re-fetching device
    # arrays after each mutation — on a latency-bound runtime those fetches
    # dominated the per-keyframe wall clock
    obs_np: Optional[np.ndarray] = None
    kf_valid_np: Optional[np.ndarray] = None
    mp_valid_np: Optional[np.ndarray] = None
    # host mirrors of the larger keyframe tables + landmark positions,
    # maintained incrementally: insertion updates one row from a single
    # packed fetch (_kf_row_fetch_jit); BA write-back patches the touched
    # window from the solver's packed host_blob; loop-rate whole-map writes
    # call refresh_host().  Without these, every keyframe insertion changed
    # the identity of each kf_* array and the old identity-keyed mirrors
    # re-fetched multi-MB tables per keyframe.
    host: Optional[dict] = None   # kf_R kf_t kf_xy kf_level kf_desc
    #                               kf_kp_valid mp_pos

    @staticmethod
    def create(cfg: MapConfig, n_slots: int) -> "SlamMap":
        K, P, N = cfg.max_keyframes, cfg.max_points, n_slots
        f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
        state = MapState(
            kf_valid=jnp.zeros(K, bool),
            kf_R=jnp.tile(jnp.eye(3, dtype=f32), (K, 1, 1)),
            kf_t=jnp.zeros((K, 3), f32),
            kf_xy=jnp.zeros((K, N, 2), f32),
            kf_level=jnp.zeros((K, N), i32),
            kf_angle=jnp.zeros((K, N), f32),
            kf_desc=jnp.zeros((K, N, 8), u32),
            kf_kp_valid=jnp.zeros((K, N), bool),
            kf_obs=jnp.full((K, N), -1, i32),
            mp_valid=jnp.zeros(P, bool),
            mp_pos=jnp.zeros((P, 3), f32),
            mp_desc=jnp.zeros((P, 8), u32),
            mp_normal=jnp.zeros((P, 3), f32),
            mp_min_dist=jnp.zeros(P, f32),
            mp_max_dist=jnp.full(P, jnp.inf, f32),
            mp_ref_kf=jnp.full(P, -1, i32),
            mp_first_kf=jnp.full(P, -1, i32),
            mp_found=jnp.ones(P, i32),
            mp_visible=jnp.ones(P, i32),
        )
        return SlamMap(
            state=state, cfg=cfg,
            parent=np.full(K, -1, np.int64),
            loop_edges=[],
            kf_frame_id=np.full(K, -1, np.int64),
            kf_timestamp=np.zeros(K, np.float64),
            obs_np=np.full((K, N), -1, np.int32),
            kf_valid_np=np.zeros(K, bool),
            mp_valid_np=np.zeros(P, bool),
            host=dict(
                kf_R=np.tile(np.eye(3, dtype=np.float32), (K, 1, 1)),
                kf_t=np.zeros((K, 3), np.float32),
                kf_xy=np.zeros((K, N, 2), np.float32),
                kf_level=np.zeros((K, N), np.int32),
                kf_desc=np.zeros((K, N, 8), np.uint32),
                kf_kp_valid=np.zeros((K, N), bool),
                mp_pos=np.zeros((P, 3), np.float32),
                mp_first_kf=np.full(P, -1, np.int32),
                # insert-time snapshots of the tracking counters (refreshed
                # by every keyframe insertion's blob; exact at KF time)
                mp_found=np.ones(P, np.int32),
                mp_visible=np.ones(P, np.int32),
            ),
        )

    def refresh_host(self, *names: str) -> None:
        """Re-fetch host mirrors from the device state (used after
        loop-rate whole-map writes: loop correction, essential graph,
        checkpoint load).  With no names, refreshes all of them."""
        for name in names or tuple(self.host.keys()):
            # np.asarray of a device array is READ-ONLY; mirrors must stay
            # writable for the next insertion's row update
            self.host[name] = np.array(getattr(self.state, name), copy=True)

    def set_kf_obs(self, obs_np: np.ndarray) -> None:
        """Adopt a full host observation table: ONE upload + mirror swap.
        The canonical commit path for stages that edit observations on a
        host working copy (fuse, point culling, loop fusion)."""
        obs_np = np.ascontiguousarray(obs_np, np.int32)
        self.state = self.state._replace(kf_obs=jnp.asarray(obs_np))
        self.obs_np = obs_np

    def set_mp_valid(self, mp_valid_np: np.ndarray) -> None:
        """Adopt a full host landmark-validity mask (fuse merges, culling):
        ONE upload + mirror swap."""
        mp_valid_np = np.ascontiguousarray(mp_valid_np, bool)
        self.state = self.state._replace(mp_valid=jnp.asarray(mp_valid_np))
        self.mp_valid_np = mp_valid_np

    # ------------------------------------------------------------------
    # allocation (host decides ids; device arrays updated functionally)
    # ------------------------------------------------------------------

    def add_keyframe(self, R, t, xy, level, angle, desc, kp_valid, obs,
                     frame_id: int, timestamp: float, parent: int = -1,
                     batch_index: Optional[int] = None) -> int:
        """Insert a keyframe row.  With batch_index set, the feature
        arguments are STACKED frame_step_scan outputs and row batch_index
        is sliced in-program (no separate materialization dispatch)."""
        if self.n_kf >= self.cfg.max_keyframes:
            self.compact_keyframes()
        if self.n_kf >= self.cfg.max_keyframes:
            # every slot genuinely live: grow geometrically.  The reference
            # map is an unbounded heap (std::set<KeyFrame*>, src/Map.cc);
            # the TPU-native analog of "unbounded" is doubling the SoA pool —
            # log2(K_final) compile buckets total, ids stable (no remap).
            self.grow_keyframes()
        k = self.n_kf
        # one fused program (k traced -> no recompile per slot) that ALSO
        # returns the packed row blob, so insertion costs one dispatch +
        # one fetch total; this is on the keyframe-insertion critical path
        if batch_index is not None:
            blob_d, self.state = _insert_keyframe_batch_jit(
                self.state, np.int32(k), R, t, xy, level, angle, desc,
                kp_valid, obs, np.int32(batch_index))
        else:
            blob_d, self.state = _insert_keyframe_jit(
                self.state, np.int32(k), R, t, xy, level, angle, desc,
                kp_valid, obs)
        self.parent[k] = parent
        self.obs_np[k] = np.asarray(obs)
        self.kf_valid_np[k] = True
        # the returned packed row blob refreshes every host mirror row
        N = self.state.kf_xy.shape[1]
        blob = np.asarray(blob_d)
        h = self.host
        h["kf_R"][k] = blob[:9].view(np.float32).reshape(3, 3)
        h["kf_t"][k] = blob[9:12].view(np.float32)
        o = 12
        h["kf_xy"][k] = blob[o:o + 2 * N].view(np.float32).reshape(N, 2)
        o += 2 * N
        h["kf_level"][k] = blob[o:o + N]; o += N
        h["kf_desc"][k] = blob[o:o + 8 * N].view(np.uint32).reshape(N, 8)
        o += 8 * N
        h["kf_kp_valid"][k] = blob[o:o + N] != 0
        o += N
        P = self.cfg.max_points
        h["mp_found"] = blob[o:o + P].copy(); o += P
        h["mp_visible"] = blob[o:o + P].copy()
        self.kf_frame_id[k] = frame_id
        self.kf_timestamp[k] = timestamp
        self.n_kf += 1
        return k

    def grow_keyframes(self, new_max: Optional[int] = None) -> int:
        """Double the keyframe pool (ids are stable; only padding is added).

        Growth is the fixed-shape answer to the reference's unbounded
        std::set map (src/Map.cc): kf-shaped device programs recompile once
        per doubling — a bounded number of compile buckets over any run —
        while every keyframe id, observation row, and consumer LUT stays
        valid.  Callers holding kf-sized side arrays (the place-recognition
        database) re-pad lazily by comparing against cfg.max_keyframes.

        Only safe at the insertion boundary (backpressure guarantees no
        mapping worker is in flight there — async_mapper.submit asserts).
        Returns the new capacity."""
        K = self.cfg.max_keyframes
        new_K = max(new_max or 2 * K, K + 1)
        pad = new_K - K
        st = self.state

        def grow(arr, fill=0):
            return jnp.concatenate([
                arr, jnp.full((pad,) + arr.shape[1:], fill, arr.dtype)])

        self.state = st._replace(
            kf_valid=grow(st.kf_valid),
            kf_R=jnp.concatenate([
                st.kf_R, jnp.tile(jnp.eye(3, dtype=st.kf_R.dtype),
                                  (pad, 1, 1))]),
            kf_t=grow(st.kf_t),
            kf_xy=grow(st.kf_xy),
            kf_level=grow(st.kf_level),
            kf_angle=grow(st.kf_angle),
            kf_desc=grow(st.kf_desc),
            kf_kp_valid=grow(st.kf_kp_valid),
            kf_obs=grow(st.kf_obs, fill=-1),
        )
        self.parent = np.concatenate(
            [self.parent, np.full(pad, -1, np.int64)])
        self.kf_frame_id = np.concatenate(
            [self.kf_frame_id, np.full(pad, -1, np.int64)])
        self.kf_timestamp = np.concatenate(
            [self.kf_timestamp, np.zeros(pad)])
        self.obs_np = np.concatenate(
            [self.obs_np,
             np.full((pad,) + self.obs_np.shape[1:], -1, np.int32)])
        self.kf_valid_np = np.concatenate(
            [self.kf_valid_np, np.zeros(pad, bool)])
        h = self.host
        h["kf_R"] = np.concatenate(
            [h["kf_R"], np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))])
        for name, fill in (("kf_t", 0), ("kf_xy", 0), ("kf_level", 0),
                           ("kf_desc", 0), ("kf_kp_valid", False)):
            arr = h[name]
            h[name] = np.concatenate(
                [arr, np.full((pad,) + arr.shape[1:], fill, arr.dtype)])
        if self.last_kf_compaction_lut is not None:
            lut = self.last_kf_compaction_lut
            # keep the pad row (old index K, value -1) at the END
            self.last_kf_compaction_lut = np.concatenate(
                [lut[:-1], np.full(pad + 1, -1, lut.dtype)])
        self.cfg = dataclasses.replace(self.cfg, max_keyframes=new_K)
        return new_K

    def compact_points(self) -> int:
        """Pack live landmarks to the front of the pool, remap observations,
        free the culled rows (replaces the reference's delete/new churn;
        allocation stays monotonic between compactions).  Returns #freed."""
        from .. import native

        st = self.state
        valid = self.mp_valid_np
        live = np.where(valid[: self.n_mp])[0]
        n_live = len(live)
        freed = self.n_mp - n_live
        if freed == 0:
            return 0
        self.pt_compactions += 1
        P = self.cfg.max_points
        lut = np.full(P + 1, -1, np.int32)
        lut[live] = np.arange(n_live, dtype=np.int32)
        if self.last_compaction_lut is None:
            self.last_compaction_lut = lut.copy()
        else:  # compose: oldest ids -> newest ids
            prev = self.last_compaction_lut
            self.last_compaction_lut = np.where(prev >= 0, lut[prev], -1)

        obs_np = self.obs_np.copy()
        native.remap_observations(obs_np, lut)
        self.obs_np = obs_np
        self.mp_valid_np = np.concatenate(
            [np.ones(n_live, bool), np.zeros(P - n_live, bool)])
        self.host["mp_pos"] = np.concatenate(
            [self.host["mp_pos"][live],
             np.zeros((P - n_live, 3), np.float32)])
        self.host["mp_first_kf"] = np.concatenate(
            [self.host["mp_first_kf"][live],
             np.full(P - n_live, -1, np.int32)])
        for name in ("mp_found", "mp_visible"):
            self.host[name] = np.concatenate(
                [self.host[name][live], np.ones(P - n_live, np.int32)])

        sel = jnp.asarray(live)

        def pack(arr, fill=0):
            packed = arr[sel]
            pad = jnp.full((P - n_live,) + arr.shape[1:], fill, arr.dtype)
            return jnp.concatenate([packed, pad])

        self.state = st._replace(
            kf_obs=jnp.asarray(obs_np),
            mp_valid=jnp.concatenate([
                jnp.ones(n_live, bool), jnp.zeros(P - n_live, bool)]),
            mp_pos=pack(st.mp_pos),
            mp_desc=pack(st.mp_desc),
            mp_normal=pack(st.mp_normal),
            mp_min_dist=pack(st.mp_min_dist),
            mp_max_dist=pack(st.mp_max_dist, fill=jnp.inf),
            mp_ref_kf=pack(st.mp_ref_kf, fill=-1),
            mp_first_kf=pack(st.mp_first_kf, fill=-1),
            mp_found=pack(st.mp_found, fill=1),
            mp_visible=pack(st.mp_visible, fill=1),
        )
        self.n_mp = n_live
        return freed

    def compact_keyframes(self) -> int:
        """Pack live keyframes to the front of the pool (culling leaves
        holes) and remap every keyframe index: spanning tree, loop edges,
        host metadata, and the landmarks' reference-keyframe ids.  The
        composed old->new LUT is left in last_kf_compaction_lut for
        consumers holding keyframe ids (tracker ref_kf, place-recognition
        rows).  Returns the number of freed slots."""
        st = self.state
        K = self.cfg.max_keyframes
        valid = self.kf_valid_np
        live = np.where(valid[: self.n_kf])[0]
        n_live = len(live)
        freed = self.n_kf - n_live
        if freed == 0:
            return 0
        self.kf_compactions += 1
        lut = np.full(K + 1, -1, np.int32)
        lut[live] = np.arange(n_live, dtype=np.int32)
        if self.last_kf_compaction_lut is None:
            self.last_kf_compaction_lut = lut.copy()
        else:
            prev = self.last_kf_compaction_lut
            self.last_kf_compaction_lut = np.where(prev >= 0, lut[prev], -1)

        sel = jnp.asarray(live)

        def pack(arr, fill=0):
            packed = arr[sel]
            pad = jnp.full((K - n_live,) + arr.shape[1:], fill, arr.dtype)
            return jnp.concatenate([packed, pad])

        eye_pad = jnp.tile(jnp.eye(3, dtype=st.kf_R.dtype),
                           (K - n_live, 1, 1))
        ref_lut = jnp.asarray(lut)
        new_ref = jnp.where(st.mp_ref_kf >= 0,
                            ref_lut[jnp.clip(st.mp_ref_kf, 0, K)], -1)
        new_first = jnp.where(st.mp_first_kf >= 0,
                              ref_lut[jnp.clip(st.mp_first_kf, 0, K)], -1)
        self.state = st._replace(
            kf_valid=jnp.concatenate([
                jnp.ones(n_live, bool), jnp.zeros(K - n_live, bool)]),
            kf_R=jnp.concatenate([st.kf_R[sel], eye_pad]),
            kf_t=pack(st.kf_t),
            kf_xy=pack(st.kf_xy),
            kf_level=pack(st.kf_level),
            kf_angle=pack(st.kf_angle),
            kf_desc=pack(st.kf_desc),
            kf_kp_valid=pack(st.kf_kp_valid),
            kf_obs=pack(st.kf_obs, fill=-1),
            mp_ref_kf=new_ref,
            mp_first_kf=new_first,
        )

        # host metadata + spanning tree + loop edges
        old_parent = self.parent.copy()
        new_parent = np.full(K, -1, np.int64)
        for old_k in live:
            p = old_parent[old_k]
            # walk up through culled ancestors (defensive; erasure already
            # re-parents children, so p is normally live or -1)
            while p >= 0 and lut[p] < 0:
                p = old_parent[p]
            new_parent[lut[old_k]] = lut[p] if p >= 0 else -1
        self.parent = new_parent
        self.kf_frame_id = np.concatenate(
            [self.kf_frame_id[live], np.full(K - n_live, -1, np.int64)])
        self.kf_timestamp = np.concatenate(
            [self.kf_timestamp[live], np.zeros(K - n_live)])
        self.obs_np = np.concatenate(
            [self.obs_np[live],
             np.full((K - n_live,) + self.obs_np.shape[1:], -1, np.int32)])
        self.kf_valid_np = np.concatenate(
            [np.ones(n_live, bool), np.zeros(K - n_live, bool)])
        h = self.host
        h["kf_R"] = np.concatenate(
            [h["kf_R"][live],
             np.tile(np.eye(3, dtype=np.float32), (K - n_live, 1, 1))])
        for name, fill in (("kf_t", 0), ("kf_xy", 0), ("kf_level", 0),
                           ("kf_desc", 0), ("kf_kp_valid", False)):
            arr = h[name]
            h[name] = np.concatenate(
                [arr[live],
                 np.full((K - n_live,) + arr.shape[1:], fill, arr.dtype)])
        first = h["mp_first_kf"]
        h["mp_first_kf"] = np.where(
            first >= 0, lut[np.clip(first, 0, K)], -1).astype(np.int32)
        self.loop_edges = [
            (int(lut[a]), int(lut[b])) for a, b in (self.loop_edges or [])
            if lut[a] >= 0 and lut[b] >= 0]
        self.n_kf = n_live
        return freed

    def add_points(self, pos, desc, normal, min_dist, max_dist, ref_kf: int,
                   valid_mask, pos_np: Optional[np.ndarray] = None
                   ) -> np.ndarray:
        """Allocate a block of map points (masked).  pos: [M,3] etc;
        valid_mask: [M] — invalid rows are skipped but still consume no ids.
        Returns [M] int32 assigned ids (-1 where invalid)."""
        m = np.asarray(valid_mask).copy()
        n_new = int(m.sum())
        if self.n_mp + n_new > self.cfg.max_points:
            self.compact_points()
        if self.n_mp + n_new > self.cfg.max_points:
            # pool genuinely full: admit as many as fit (oldest-first bias
            # mirrors the reference's implicit density bound via culling)
            space = self.cfg.max_points - self.n_mp
            keep = np.cumsum(m) <= space
            m &= keep
            n_new = int(m.sum())
        ids = np.full(m.shape[0], -1, np.int32)
        ids[m] = self.n_mp + np.arange(n_new, dtype=np.int32)
        # ONE fused program for all ten pool fields (keyframe-rate path: the
        # per-field eager scatters used to cost ~100 dispatches per KF)
        self.state = _add_points_jit(
            self.state,
            jnp.asarray(np.where(m, ids, self.cfg.max_points)),  # scatter-safe
            jnp.asarray(m), jnp.asarray(pos), jnp.asarray(desc),
            jnp.asarray(normal), jnp.asarray(min_dist),
            jnp.asarray(max_dist), np.int32(ref_kf))
        self.mp_valid_np[ids[m]] = True
        self.host["mp_pos"][ids[m]] = np.asarray(
            pos if pos_np is None else pos_np)[m]
        self.host["mp_first_kf"][ids[m]] = ref_kf
        self.n_mp += n_new
        return ids

    def alloc_point_ids(self, valid_mask) -> tuple:
        """Host-side id allocation for a batch of new points: compaction
        when the pool would overflow, then capping and sequential ids.
        Returns (ids [M] int32 with -1 on unallocated slots, m [M] bool
        final allocation mask).  Mirrors/pools are untouched — pair with
        _add_points_from_kf_jit (or a fused program embedding it) and
        note_points_added."""
        m = np.asarray(valid_mask).copy()
        n_new = int(m.sum())
        if self.n_mp + n_new > self.cfg.max_points:
            self.compact_points()
        if self.n_mp + n_new > self.cfg.max_points:
            space = self.cfg.max_points - self.n_mp
            m &= np.cumsum(m) <= space
            n_new = int(m.sum())
        ids = np.full(m.shape[0], -1, np.int32)
        ids[m] = self.n_mp + np.arange(n_new, dtype=np.int32)
        return ids, m

    def note_points_added(self, ids, m, kf: int, pos_np: np.ndarray):
        """Host-mirror bookkeeping for points a DEVICE program just added
        (the program embedded _add_points_from_kf_jit's update)."""
        self.mp_valid_np[ids[m]] = True
        self.host["mp_pos"][ids[m]] = np.asarray(pos_np)[m]
        self.host["mp_first_kf"][ids[m]] = kf
        self.n_mp += int(m.sum())

    def add_points_from_kf(self, pos, kf: int, valid_mask,
                           pos_np: Optional[np.ndarray] = None
                           ) -> np.ndarray:
        """add_points specialized for triangulation: descriptors come from
        keyframe kf's slot rows IN-PROGRAM (desc[i] = kf_desc[kf, i]),
        normals/bands zeroed for the next point_stats refresh.  One fused
        dispatch — the generic path's eager kf_desc[kf] slice, zeros_like
        and full(inf) cost a round trip each at keyframe rate."""
        ids, m = self.alloc_point_ids(valid_mask)
        self.state = _add_points_from_kf_jit(
            self.state,
            jnp.asarray(np.where(m, ids, self.cfg.max_points)),
            jnp.asarray(m), pos, np.int32(kf))
        self.note_points_added(ids, m, kf,
                               np.asarray(pos if pos_np is None else pos_np))
        return ids

    def set_observations(self, kf_id: int, slot_idx, point_ids):
        """Associate keypoint slots of keyframe kf_id with map points."""
        s = self.state
        row = scatter_ops.scatter_set_rows(
            s.kf_obs[kf_id][:, None], jnp.asarray(slot_idx),
            jnp.asarray(point_ids)[:, None])[:, 0]
        # kf_id is a host int -> static dynamic-update-slice, fast-path safe
        self.state = s._replace(kf_obs=s.kf_obs.at[kf_id].set(row))
        self.obs_np[kf_id, np.asarray(slot_idx)] = np.asarray(point_ids)

    _OBS_MULTI_CAP = 4096

    def set_observations_multi(self, kf_ids, slot_idx, point_ids):
        """Associate (keyframe, slot) -> point for a flat batch of triples
        in ONE device program (padded to a fixed capacity so the program
        compiles once).  Used by the keyframe-rate map builder to commit a
        whole multi-neighbor stage without per-keyframe dispatches."""
        M = len(kf_ids)
        cap = self._OBS_MULTI_CAP
        assert M <= cap, (M, cap)
        pad = cap - M
        kf_ids = np.concatenate([np.asarray(kf_ids, np.int32),
                                 np.zeros(pad, np.int32)])
        slot_idx = np.concatenate([np.asarray(slot_idx, np.int32),
                                   np.zeros(pad, np.int32)])
        point_ids = np.concatenate([np.asarray(point_ids, np.int32),
                                    np.zeros(pad, np.int32)])
        valid = np.concatenate([np.ones(M, bool), np.zeros(pad, bool)])
        s = self.state
        self.state = s._replace(kf_obs=_set_obs_flat_jit(
            s.kf_obs, jnp.asarray(kf_ids), jnp.asarray(slot_idx),
            jnp.asarray(point_ids), jnp.asarray(valid)))
        self.obs_np[kf_ids[valid], slot_idx[valid]] = point_ids[valid]

    def set_pose(self, kf_id: int, R, t):
        s = self.state
        self.state = s._replace(
            kf_R=s.kf_R.at[kf_id].set(R), kf_t=s.kf_t.at[kf_id].set(t)
        )
        # mirror from the arguments (a device read-back here would cost two
        # round trips for values the caller already has)
        self.host["kf_R"][kf_id] = np.asarray(R, np.float32)
        self.host["kf_t"][kf_id] = np.asarray(t, np.float32)


@jax.jit
def _add_points_jit(s: MapState, dev_ids, m, pos, desc, normal, min_dist,
                    max_dist, ref_kf) -> MapState:
    P = s.mp_valid.shape[0]
    M = m.shape[0]

    def scat(arr, vals):
        # add-only scatter-set (see ops/scatter.py): invalid rows target
        # the pad row; unique ids guarantee exact set semantics
        padded = jnp.concatenate(
            [arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)])
        padded = scatter_ops.scatter_set_rows(padded, dev_ids, vals, active=m)
        return padded[:P]

    return s._replace(
        mp_valid=scat(s.mp_valid, m),
        mp_pos=scat(s.mp_pos, pos),
        mp_desc=scat(s.mp_desc, desc),
        mp_normal=scat(s.mp_normal, normal),
        mp_min_dist=scat(s.mp_min_dist, min_dist),
        mp_max_dist=scat(s.mp_max_dist, max_dist),
        mp_ref_kf=scat(s.mp_ref_kf, jnp.full(M, ref_kf)),
        mp_first_kf=scat(s.mp_first_kf, jnp.full(M, ref_kf)),
        mp_found=scat(s.mp_found, jnp.ones(M)),
        mp_visible=scat(s.mp_visible, jnp.ones(M)),
    )


@jax.jit
def _add_points_from_kf_jit(s: MapState, dev_ids, m, pos, kf) -> MapState:
    P = s.mp_valid.shape[0]
    M = m.shape[0]

    def scat(arr, vals):
        padded = jnp.concatenate(
            [arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)])
        padded = scatter_ops.scatter_set_rows(padded, dev_ids, vals, active=m)
        return padded[:P]

    return s._replace(
        mp_valid=scat(s.mp_valid, m),
        mp_pos=scat(s.mp_pos, pos),
        mp_desc=scat(s.mp_desc, s.kf_desc[kf]),
        mp_normal=scat(s.mp_normal, jnp.zeros((M, 3), s.mp_normal.dtype)),
        mp_min_dist=scat(s.mp_min_dist, jnp.zeros(M, s.mp_min_dist.dtype)),
        mp_max_dist=scat(s.mp_max_dist,
                         jnp.full(M, jnp.inf, s.mp_max_dist.dtype)),
        mp_ref_kf=scat(s.mp_ref_kf, jnp.full(M, kf, s.mp_ref_kf.dtype)),
        mp_first_kf=scat(s.mp_first_kf, jnp.full(M, kf, s.mp_first_kf.dtype)),
        mp_found=scat(s.mp_found, jnp.ones(M, s.mp_found.dtype)),
        mp_visible=scat(s.mp_visible, jnp.ones(M, s.mp_visible.dtype)),
    )


@jax.jit
def _row_blob(R, t, xy, level, desc, kp_valid) -> jnp.ndarray:
    """One keyframe row as a single INT32 blob: [9 R][3 t][2N xy] (f32
    bitcast) [N level][8N desc][N kp_valid] — the insert-time mirror
    refresh and the loop closer's BoW inputs in ONE round trip (returned BY
    the insert program, so insertion is one dispatch + one fetch total).
    Integer transport throughout: bitcasting descriptors to float32 would
    expose NaN bit patterns to potential canonicalization on the device
    link, silently corrupting the host descriptor mirror."""
    def f2i(x):
        return jax.lax.bitcast_convert_type(
            jnp.asarray(x, jnp.float32), jnp.int32).reshape(-1)
    return jnp.concatenate([
        f2i(R), f2i(t), f2i(xy),
        jnp.asarray(level).astype(jnp.int32),
        jax.lax.bitcast_convert_type(
            jnp.asarray(desc, jnp.uint32), jnp.int32).reshape(-1),
        jnp.asarray(kp_valid).astype(jnp.int32),
    ])


@jax.jit
def _insert_keyframe_batch_jit(s: MapState, k, R, t, xy_s, level_s, angle_s,
                               desc_s, kp_valid_s, obs, b):
    """Insert from STACKED batch outputs (frame_step_scan row b) — the
    slice happens in-program, so keyframe creation from a tracked batch
    needs no separate slice_frame dispatch."""
    return _insert_keyframe_jit(s, k, R, t, xy_s[b], level_s[b], angle_s[b],
                                desc_s[b], kp_valid_s[b], obs)


@jax.jit
def _insert_keyframe_jit(s: MapState, k, R, t, xy, level, angle, desc,
                         kp_valid, obs):
    # the blob also carries the landmark found/visible counters: point
    # culling needs their insert-time values, and riding the insert fetch
    # saves two keyframe-rate round trips
    blob = jnp.concatenate([
        _row_blob(R, t, xy, level, desc, kp_valid),
        s.mp_found.astype(jnp.int32), s.mp_visible.astype(jnp.int32)])
    return blob, s._replace(
        kf_valid=s.kf_valid.at[k].set(True),
        kf_R=s.kf_R.at[k].set(R),
        kf_t=s.kf_t.at[k].set(t),
        kf_xy=s.kf_xy.at[k].set(xy),
        kf_level=s.kf_level.at[k].set(level),
        kf_angle=s.kf_angle.at[k].set(angle),
        kf_desc=s.kf_desc.at[k].set(desc),
        kf_kp_valid=s.kf_kp_valid.at[k].set(kp_valid),
        kf_obs=s.kf_obs.at[k].set(obs),
    )


# ---------------------------------------------------------------------------
# derived structure (pure functions of MapState)
# ---------------------------------------------------------------------------

def covisibility_row(state: MapState, kf_id, n_points: int) -> jnp.ndarray:
    """Shared-observation counts of kf_id vs every keyframe: [K] int32.

    Replaces KeyFrame::UpdateConnections counting (src/KeyFrame.cc:332-421)
    with one scatter + gather-free matmul-like reduction.
    """
    obs = state.kf_obs[kf_id]                      # [N]
    # add-scatter formulation (non-add scatters demote the axon fast path)
    cnt = jnp.zeros((n_points + 1,), jnp.int32).at[
        jnp.where(obs >= 0, obs, n_points)
    ].add((obs >= 0).astype(jnp.int32))
    seen = jnp.concatenate([cnt[:n_points] > 0, jnp.zeros((1,), bool)])
    # count per keyframe: how many of its obs are in `seen`
    hits = seen[jnp.where(state.kf_obs >= 0, state.kf_obs, n_points)]  # [K, N]
    counts = jnp.sum(hits & (state.kf_obs >= 0), axis=1).astype(jnp.int32)
    counts = counts * state.kf_valid
    K = counts.shape[0]
    return counts * (jnp.arange(K) != kf_id)


def covisibility_matrix(state: MapState, n_points: int) -> jnp.ndarray:
    """Full [K, K] covisibility weights via incidence matmul (int32)."""
    K, N = state.kf_obs.shape
    # incidence B [K, P+1] via ADD-scatter of ones (a keyframe observes a
    # landmark at most once, so add == set here)
    obs = jnp.where(state.kf_obs >= 0, state.kf_obs, n_points)
    B = jnp.zeros((K, n_points + 1), jnp.float32)
    B = B.at[jnp.arange(K)[:, None], obs].add(
        (state.kf_obs >= 0).astype(jnp.float32))
    B = B[:, :n_points]
    W = (B @ B.T).astype(jnp.int32)
    W = W * state.kf_valid[:, None] * state.kf_valid[None, :]
    return W - jnp.diag(jnp.diag(W))


def connected_weights(weights, min_weight: int):
    """KeyFrame::UpdateConnections edge rule (src/KeyFrame.cc:378-421): a
    covisibility EDGE exists only for weight >= min_weight (15); a keyframe
    none of whose edges pass keeps its single best edge.  All neighbor /
    group / exclusion queries go through connected sets in the reference,
    so raw shared-observation counts must be filtered by this rule before
    any `> 0` test or top-k selection.

    Host-side numpy; accepts a [K] row or [K, K] matrix (rows independent).
    """
    W = np.asarray(weights)
    one = W.ndim == 1
    Wm = W[None, :] if one else W
    keep = Wm >= min_weight
    none = ~keep.any(axis=1) & (Wm.max(axis=1, initial=0) > 0)
    if none.any():
        rows = np.where(none)[0]
        keep[rows, Wm[rows].argmax(axis=1)] = True
    out = np.where(keep, Wm, 0)
    return out[0] if one else out


def point_observation_counts(state: MapState) -> jnp.ndarray:
    """[P] number of keyframes observing each point."""
    P = state.mp_valid.shape[0]
    obs = jnp.where(state.kf_obs >= 0, state.kf_obs, P)
    flat = obs.reshape(-1)
    counts = jnp.zeros((P + 1,), jnp.int32).at[flat].add(1)
    return counts[:P] * state.mp_valid


def point_observation_counts_by_level(state: MapState,
                                      n_levels: int) -> jnp.ndarray:
    """[P, L] cumulative observation counts: entry (p, l) is the number of
    keyframe observations of point p whose keypoint octave is <= l.  Feeds
    the same-or-finer-scale redundancy test of keyframe culling
    (src/LocalMapping.cc:563-580: an observation only counts as redundant
    cover if scaleLevel_i <= scaleLevel + 1)."""
    P = state.mp_valid.shape[0]
    pid = jnp.where(state.kf_obs >= 0, state.kf_obs, P)
    lvl = jnp.clip(state.kf_level, 0, n_levels - 1)
    flat = (pid * n_levels + lvl).reshape(-1)
    counts = jnp.zeros(((P + 1) * n_levels,), jnp.int32).at[flat].add(1)
    by_level = counts[:P * n_levels].reshape(P, n_levels)
    return jnp.cumsum(by_level, axis=1) * state.mp_valid[:, None]


@jax.jit
def _set_obs_flat_jit(kf_obs, kf_ids, slots, pids, valid):
    K, N = kf_obs.shape
    flat_idx = jnp.where(valid, kf_ids * N + slots, K * N)
    padded = jnp.concatenate(
        [kf_obs.reshape(-1), jnp.zeros((1,), kf_obs.dtype)])
    return padded.at[flat_idx].set(pids)[:K * N].reshape(K, N)
