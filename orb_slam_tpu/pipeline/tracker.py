"""Tracking state machine: the host orchestrator of the per-frame pipeline.

Replaces the Tracking thread (src/Tracking.cc) — but where the reference
interleaves three threads over a mutex-guarded map, this design runs pure
jitted kernels over SoA state and serializes map commits on the host
(SURVEY.md §2.3).  Keyframe-rate work (LocalMapper + LoopCloser) runs either
synchronously after the frame or on a worker thread over functional map
snapshots (pipeline/async_mapper.py, cfg.tracker.async_mapping) — the
equivalent of the reference's LocalMapping/LoopClosing threads.

States mirror Tracking.h:57-64: NOT_INITIALIZED -> INITIALIZING -> WORKING
<-> LOST (SYSTEM_NOT_READY/NO_IMAGES_YET collapse into NOT_INITIALIZED).
"""
from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geometry import se3, camera as cam_mod
from ..frontend.extractor import FrameFeatures
from ..mapping import mapstore
from ..solvers import initializer, pose_opt, bundle_adjust as ba
from .. import native
from ..ops import match as match_ops
from ..place import vocabulary as voc_mod
from ..place import database as db_mod
from ..solvers import pnp
from ..utils.timing import GLOBAL_TIMER as _timer
from . import frame as frame_mod
from . import track_kernels as tk
from .local_mapper import LocalMapper
from .loop_closer import LoopCloser


from functools import partial


@partial(jax.jit, static_argnames=("has_lut",))
def _commit_stats_jit(nvis, nfnd, cur_vis, cur_fnd, snap_vis, snap_fnd,
                      lut, mp_pos, pid, *, has_lut: bool):
    """Mapping-commit device work in ONE program: re-apply the tracker-side
    visible/found deltas (through the worker's compaction LUT if any) and
    gather the remapped association positions."""
    P = nvis.shape[0]
    dvis = cur_vis - snap_vis
    dfnd = cur_fnd - snap_fnd
    if has_lut:
        tgt = jnp.where(lut >= 0, lut, P)
        dvis = jnp.zeros(P + 1, jnp.int32).at[tgt].add(dvis)[:P]
        dfnd = jnp.zeros(P + 1, jnp.int32).at[tgt].add(dfnd)[:P]
    return (nvis + dvis, nfnd + dfnd, mp_pos[jnp.clip(pid, 0, None)])


def _orthonormalize_np(R: np.ndarray) -> np.ndarray:
    """Host-side SO(3) projection (SVD) — the per-frame motion-model
    bookkeeping must not cost device round trips (see se3.orthonormalize
    for why the projection is needed at all)."""
    u, _, vt = np.linalg.svd(R.astype(np.float64))
    s = np.sign(np.linalg.det(u @ vt))
    return (u @ np.diag([1.0, 1.0, s]) @ vt).astype(np.float32)


class TrackState(enum.Enum):
    NOT_INITIALIZED = 0
    INITIALIZING = 1
    WORKING = 2
    LOST = 3


@dataclass
class FrameRecord:
    frame_id: int
    timestamp: float
    R: np.ndarray
    t: np.ndarray
    tracked: bool


@dataclass
class Tracker:
    cfg: SystemConfig
    cam: cam_mod.CameraParams
    slam_map: mapstore.SlamMap
    local_mapper: LocalMapper
    loop_closer: Optional[LoopCloser] = None
    async_mapper: Optional[object] = None  # pipeline.async_mapper.AsyncMapper

    state: TrackState = TrackState.NOT_INITIALIZED
    frame_id: int = 0
    last_kf_frame_id: int = -10**9
    last_reloc_frame_id: int = -10**9
    ref_kf: int = -1
    n_ref_tracked: int = 0

    # motion model: velocity = T_cur * T_last^-1
    vel_R: Optional[np.ndarray] = None
    vel_t: Optional[np.ndarray] = None

    # last frame state
    _prev_localmap_matches: int = 0
    # cached local-map window selection (recomputed on map changes)
    _sel_cache: Optional[np.ndarray] = None
    _sel_frame: int = -10**9
    _sel_dirty: bool = True
    # host mirrors of slow-changing device arrays, keyed by array identity
    # (fetching kf_obs through the tunnel every selection costs a round
    # trip, and a dynamic [:n_kf] device slice would recompile per KF count)
    # software pipeline (fused path): in-flight dispatched frames whose
    # host blobs have not been fetched yet, plus the device-resident chain
    # of "last frame" handles feeding the next dispatch (frame_step docs)
    _pipe: List[dict] = field(default_factory=list)
    _chain: Optional[dict] = None
    _force_kf: bool = False
    # pinned keyframe schedule (replay harness): when set, NeedNewKeyFrame
    # is exactly "frame_id in this set" — used to replay one run's
    # insertion decisions into another so a comparison isolates the solver
    # under test (VERDICT r4 next #6; the policy's integer decisions
    # otherwise amplify ulp-level solver differences into structurally
    # different maps)
    kf_schedule: Optional[set] = None
    # micro-batching (frame_step_scan): buffered raw frames awaiting a
    # batch dispatch, and the stacked outputs holding the newest frame's
    # features (materialized lazily — slicing costs a dispatch)
    _batch_buf: List[dict] = field(default_factory=list)
    _last_stacked: Optional[tuple] = None
    # sticky fallback: set when the runtime rejects async D2H once
    # (TrackerConfig.prefetch_host_blob docs)
    _prefetch_failed: bool = False
    last_frame: Optional[frame_mod.FrameData] = None
    last_R: Optional[jnp.ndarray] = None
    last_t: Optional[jnp.ndarray] = None
    last_assoc_pos: Optional[jnp.ndarray] = None   # [N,3] per-slot landmark
    last_assoc_pid: Optional[np.ndarray] = None    # [N] global point ids
    last_assoc_valid: Optional[jnp.ndarray] = None

    # initialization ref
    init_frame: Optional[frame_mod.FrameData] = None
    init_frame_id: int = -1
    init_timestamp: float = 0.0

    trajectory: List[FrameRecord] = field(default_factory=list)
    rng_key: jax.Array = field(default_factory=lambda: jax.random.PRNGKey(0))
    stats: dict = field(default_factory=dict)

    @staticmethod
    def create(cfg: SystemConfig) -> "Tracker":
        if cfg.tracker.frame_batch > 1 and not cfg.tracker.async_mapping:
            raise ValueError(
                "frame_batch > 1 requires async_mapping: synchronous "
                "keyframe mapping mutates the landmark pools mid-batch, "
                "invalidating the in-flight rows' associations")
        # Clamp frame_batch to the keyframe-latency budget: the forced-KF
        # cadence is max_frames_between_kf (mMaxFrames = 18*fps/30,
        # src/Tracking.cc:79), and a batched keyframe decision retires up
        # to frame_batch-1 frames after the frame that triggered it.  A
        # batch longer than the cadence means the policy can lag a full
        # forced-KF interval — measured at frame_batch=24 the map starves
        # and resets (BENCH_SWEEP_r03.json: 0.69 fps).  Clamp + warn
        # instead of collapsing (VERDICT r3 weak #5).
        max_fb = max(1, cfg.tracker.max_frames_between_kf)
        if cfg.tracker.frame_batch > max_fb:
            import dataclasses as _dc
            import warnings
            warnings.warn(
                f"frame_batch={cfg.tracker.frame_batch} exceeds the "
                f"keyframe cadence bound max_frames_between_kf={max_fb}; "
                f"clamping to {max_fb} (an over-long batch delays keyframe "
                "decisions past the forced-insertion interval and starves "
                "the map)", stacklevel=2)
            cfg = cfg.replace(tracker=_dc.replace(
                cfg.tracker, frame_batch=max_fb))
        cam = cam_mod.make_camera(cfg.camera)
        smap = mapstore.SlamMap.create(cfg.map, cfg.extractor.max_keypoints)
        lm = LocalMapper(cfg=cfg, cam=cam)
        lc = LoopCloser(cfg=cfg, cam=cam)
        am = None
        if cfg.tracker.async_mapping:
            from .async_mapper import AsyncMapper
            am = AsyncMapper(
                lm, lc, service_polls=cfg.tracker.mapper_service_polls)
        return Tracker(cfg=cfg, cam=cam, slam_map=smap, local_mapper=lm,
                       loop_closer=lc, async_mapper=am,
                       rng_key=jax.random.PRNGKey(cfg.seed))

    # ------------------------------------------------------------------
    def process(self, feats: FrameFeatures, timestamp: float) -> dict:
        """Track one frame from pre-extracted features; returns a metrics
        dict (SURVEY.md §5.5)."""
        self._drain_pipe()  # leave the fused pipeline before the staged path
        self._chain = None
        fd = frame_mod.build_frame(feats, self.cam, self.cfg.extractor)
        metrics = {"frame_id": self.frame_id, "state": self.state.name,
                   "n_kp": int(jnp.sum(feats.valid))}
        self._poll_mapper(metrics)

        if self.state in (TrackState.NOT_INITIALIZED, TrackState.INITIALIZING):
            self._initialize(fd, timestamp, metrics)
        elif self.state == TrackState.WORKING:
            self._track(fd, timestamp, metrics)
        else:  # LOST: BoW relocalisation (src/Tracking.cc:867-1036)
            self._relocalize(fd, timestamp, metrics)

        self.frame_id += 1
        metrics["state_after"] = self.state.name
        metrics["n_map_points"] = self.slam_map.n_mp
        metrics["n_keyframes"] = self.slam_map.n_kf
        return metrics

    def process_image(self, image, timestamp: float) -> dict:
        """Track one frame from a raw grayscale image.

        In the WORKING state the whole hot path (extraction + undistortion +
        matching + pose optimization + landmark stats) runs as ONE device
        program (pipeline/frame_step.py); other states extract first, then
        take the host-orchestrated path.
        """
        if self.state == TrackState.WORKING:
            metrics = {"frame_id": self.frame_id, "state": self.state.name}
            # commit finished keyframe-rate work first; the pipeline must be
            # drained so in-flight associations can be remapped/revalidated
            if self.async_mapper is not None:
                res = self.async_mapper.poll()
                if res is not None:
                    with _timer.stage("tracking", "commitMapping"):
                        self._drain_pipe()
                        self._commit_mapping(res, metrics)
            if self._force_kf and self.state == TrackState.WORKING:
                with _timer.stage("tracking", "starvedKeyframe"):
                    self._starved_keyframe(metrics)
            if self.state == TrackState.WORKING:
                with _timer.stage("tracking", "trackFused"):
                    self._track_fused(image, timestamp, metrics)
                self.frame_id += 1
                metrics["state_after"] = self.state.name
                metrics["n_map_points"] = self.slam_map.n_mp
                metrics["n_keyframes"] = self.slam_map.n_kf
                return metrics
            # a drained in-flight frame lost tracking: fall through to the
            # staged path for THIS image in the new state
        feats = self.extract(image)
        return self.process(feats, timestamp)

    # ------------------------------------------------------------------
    # async mapping: poll/commit (see pipeline/async_mapper.py)
    # ------------------------------------------------------------------
    def _poll_mapper(self, metrics):
        if self.async_mapper is None:
            return
        res = self.async_mapper.poll()
        if res is not None:
            self._commit_mapping(res, metrics)

    def _commit_mapping(self, res, metrics):
        """Adopt the worker's map and re-apply the tracking-side landmark
        stat deltas accumulated while it ran (the tracker's only map writes
        between keyframes), remapped if the worker compacted the pool."""
        P = self.cfg.map.max_points
        cur = self.slam_map.state
        new_map = res.smap
        nst = new_map.state
        old_state = cur
        metrics["mapping"] = res.metrics

        # remap + revalidate the in-flight per-slot associations (host)
        pid = self.last_assoc_pid
        if pid is not None:
            pid = np.asarray(pid)
            if res.remap_lut is not None:
                pid = np.where(
                    pid >= 0, res.remap_lut[np.clip(pid, 0, None)], -1)
            mp_valid = new_map.mp_valid_np
            pid = np.where((pid >= 0) & mp_valid[np.clip(pid, 0, None)],
                           pid, -1).astype(np.int32)

        # stat re-apply + association-position gather: ONE device program
        # (the eager form cost ~11 dispatches per commit)
        lut = res.remap_lut[:P] if res.remap_lut is not None else \
            np.zeros(0, np.int32)
        new_vis, new_fnd, assoc_pos = _commit_stats_jit(
            nst.mp_visible, nst.mp_found, cur.mp_visible, cur.mp_found,
            res.snap_visible, res.snap_found, jnp.asarray(lut),
            nst.mp_pos,
            pid if pid is not None else np.zeros(1, np.int32),
            has_lut=res.remap_lut is not None)
        new_map.state = nst._replace(mp_visible=new_vis, mp_found=new_fnd)
        self.slam_map = new_map
        self._sel_dirty = True
        self._chain = None  # chained handles reference the pre-commit pools

        if pid is not None:
            self.last_assoc_pid = pid
            self.last_assoc_valid = pid >= 0
            self.last_assoc_pos = assoc_pos

        kf_valid = new_map.kf_valid_np
        if self.ref_kf >= 0 and (self.ref_kf >= len(kf_valid)
                                 or not kf_valid[self.ref_kf]):
            self.ref_kf = res.kf

        if res.metrics.get("loop_closed"):
            # the map moved under the tracker (LoopClosing::CorrectLoop +
            # ForceRelocalisation, src/LoopClosing.cc:551): carry the loop
            # KF's world correction onto the current tracked pose, then
            # reset the motion model
            R_old = np.asarray(old_state.kf_R[res.kf])
            t_old = np.asarray(old_state.kf_t[res.kf])
            R_new = np.asarray(nst.kf_R[res.kf])
            t_new = np.asarray(nst.kf_t[res.kf])
            R_g = R_old.T @ R_new                 # G^-1 = Twc_old ∘ Tcw_new
            t_g = R_old.T @ (t_new - t_old)
            R_last = np.asarray(self.last_R)
            t_last = np.asarray(self.last_t)
            self.last_R = np.asarray(se3.orthonormalize(
                jnp.asarray(R_last @ R_g)))
            self.last_t = R_last @ t_g + t_last
            self.vel_R, self.vel_t = None, None
            self.local_mapper.refresh_point_stats(self.slam_map)

    def prewarm_commit_variants(self):
        """Compile both mapping-commit program variants (with and without
        a compaction LUT, _commit_stats_jit) ahead of any measured
        window: the has_lut=True variant otherwise compiles at the FIRST
        pool compaction — observed as a multi-second commitMapping stall
        wherever that commit lands.  Identity LUT + zero deltas makes the
        warm calls semantic no-ops."""
        st = self.slam_map.state
        P = self.cfg.map.max_points
        cap = self.cfg.extractor.max_keypoints
        pid = jnp.zeros(cap, jnp.int32)
        for lut, has in ((jnp.zeros(0, jnp.int32), False),
                         (jnp.arange(P, dtype=jnp.int32), True)):
            out = _commit_stats_jit(
                st.mp_visible, st.mp_found, st.mp_visible, st.mp_found,
                st.mp_visible, st.mp_found, lut, st.mp_pos, pid,
                has_lut=has)
            jax.block_until_ready(out)

    def finish(self):
        """Flush in-flight mapping work and commit (call before exporting
        the trajectory/map — the reference joins its threads at shutdown)."""
        self._drain_pipe()
        if self.async_mapper is not None:
            res = self.async_mapper.flush()
            if res is not None:
                self._commit_mapping(res, {})

    def shutdown(self):
        """finish() + join the mapping worker (System::Shutdown analog,
        src/System.cc — the reference joins LocalMapping/LoopClosing before
        trajectory export; without the join the daemon thread can abort
        inside the JAX runtime at interpreter teardown)."""
        self.finish()
        if self.async_mapper is not None:
            self.async_mapper.shutdown()
            self.async_mapper = None

    def adopt_map(self, smap: mapstore.SlamMap):
        """Resume from a checkpointed map (mapping/checkpoint.py): tracking
        re-enters LOST and relocalizes into the loaded map — the
        multi-session story the reference lacks (it has no persistence;
        SURVEY §5.4).  Place recognition is rebuilt from the map's host
        descriptor mirrors, so resume costs zero device fetches beyond the
        map upload itself."""
        self._drain_pipe()
        if self.async_mapper is not None:
            res = self.async_mapper.flush()
            if res is not None:
                self._commit_mapping(res, {})
        self.slam_map = smap
        self.state = TrackState.LOST if smap.n_kf else \
            TrackState.NOT_INITIALIZED
        self.frame_id = (int(smap.kf_frame_id[: smap.n_kf].max()) + 1
                         if smap.n_kf else 0)
        live = np.where(smap.kf_valid_np[: smap.n_kf])[0]
        self.ref_kf = int(live[-1]) if len(live) else -1
        if self.ref_kf >= 0:
            self.last_R = smap.host["kf_R"][self.ref_kf].copy()
            self.last_t = smap.host["kf_t"][self.ref_kf].copy()
        self.last_frame = None
        self._last_stacked = None
        self._chain = None
        self._pipe = []
        self._batch_buf = []
        self._sel_cache = None
        self._sel_dirty = True
        self.vel_R, self.vel_t = None, None
        self.last_kf_frame_id = -10**9
        self.last_reloc_frame_id = -10**9
        self.n_ref_tracked = 0
        self.last_assoc_pid = None

        lc = self.loop_closer
        if lc is None:
            return
        if lc.voc is None:
            # bootstrap a vocabulary from the map's own descriptors (the
            # configured path/prebuilt wins inside ensure_vocabulary)
            desc = smap.host["kf_desc"][live][smap.host["kf_kp_valid"][live]]
            lc.ensure_vocabulary(desc[:20000])
        lc.db = db_mod.BowDatabase.create(
            smap.cfg.max_keyframes, self.cfg.extractor.max_keypoints)
        lc.kf_bow = {}
        for k in live:
            bow = voc_mod.transform_np(
                lc.voc, smap.host["kf_desc"][k], smap.host["kf_kp_valid"][k])
            lc.kf_bow[int(k)] = bow
            lc.db = lc.db.add(int(k), bow)
        lc.consistent_groups = []
        lc.last_loop_kf = -(10 ** 9)
        lc._covis_cache = None

    def extract(self, image) -> FrameFeatures:
        """Default extraction path: level-batched, Pallas-fused on TPU.

        During initialization the feature budget is init_features_mult x
        the runtime budget (the reference builds mpIniORBextractor with
        2*nFeatures, src/Tracking.cc:128) — one extra compile bucket; the
        init frames are reduced back to the runtime width at map creation
        (_compress_init)."""
        from ..frontend.extractor_batched import extract_batched
        ecfg = self.cfg.extractor
        use_pallas = (jax.default_backend() in ("tpu", "axon")
                      and not ecfg.score_harris)
        n_feat, cap = ecfg.n_features, ecfg.max_keypoints
        if (self.state in (TrackState.NOT_INITIALIZED,
                           TrackState.INITIALIZING)
                and ecfg.init_features_mult > 1):
            n_feat *= ecfg.init_features_mult
            cap *= ecfg.init_features_mult
        return extract_batched(
            jnp.asarray(image, jnp.float32), ecfg, n_feat, cap, use_pallas)

    def _inlier_floor(self, frame_id: int) -> int:
        """TrackLocalMap acceptance floor: 50 inliers within mMaxFrames
        (= max_frames_between_kf, 18 at 30 fps) of a relocalisation, 30
        otherwise (src/Tracking.cc:640-647).  Through r5 the window was
        2*fps = 60 frames — 3.3x the reference's — which made marginal
        (30-49-inlier) stretches self-perpetuating: every reloc re-armed
        a long 50-floor window that the next frames re-failed."""
        tcfg = self.cfg.tracker
        recent = (frame_id - self.last_reloc_frame_id
                  < tcfg.max_frames_between_kf)
        return (tcfg.min_localmap_inliers_reloc if recent
                else tcfg.min_localmap_inliers)

    def _track_fused(self, image, timestamp, metrics):
        """WORKING-state tracking via the single fused frame program,
        software-pipelined (depth 1 with async mapping): frame i+1 is
        dispatched from frame i's device-resident outputs (pose chain,
        feature tables, landmark stats) BEFORE frame i's host blob is
        fetched, so the fetch round trip overlaps frame i+1's execution.
        On dispatch-latency-bound runtimes (the tunneled TPU) this halves
        per-frame wall clock; the keyframe decision lags one frame, which
        matches the reference's asynchronous insertion latency."""
        from . import frame_step as fs

        tcfg = self.cfg.tracker
        if tcfg.frame_batch > 1:
            # micro-batched dispatch: buffer, then one scan program per
            # frame_batch frames (amortizes the fixed per-dispatch cost of
            # latency-bound runtimes; see frame_step_scan)
            self._batch_buf.append(dict(
                image=image, timestamp=timestamp, metrics=metrics,
                frame_id=self.frame_id))
            if len(self._batch_buf) >= tcfg.frame_batch:
                self._dispatch_batch()
                depth = 1 if self.async_mapper is not None else 0
                while len(self._pipe) > depth:
                    self._retire_batch()
            return

        st = self.slam_map.state
        chain = self._chain if self._chain is not None else self._build_chain()

        # local-map window selection (host covisibility voting).  The local
        # window only changes when mapping commits or tracked associations
        # drift, so recompute it at most every few frames (the upload is a
        # relay round trip).  Votes use associations from the most recently
        # retired frame (<= 2 frames stale under the pipeline).
        cap = self.cfg.map.local_ba_max_points
        if (self._sel_cache is None or self._sel_dirty
                or self.frame_id - self._sel_frame >= 4):
          with _timer.stage("tracking", "selectLocalWindow"):
            ids = self._select_local_point_ids(cap)
            pad = cap - len(ids)
            self._sel_cache = np.concatenate(
                [ids, np.full(pad, -1)]).astype(np.int32)
            self._sel_frame = self.frame_id
            self._sel_dirty = False
        sel = self._sel_cache
        use_pallas = (jax.default_backend() in ("tpu", "axon")
                      and not self.cfg.extractor.score_harris)

        with _timer.stage("tracking", "dispatchFrameStep"):
          out = fs.frame_step(
            image,
            chain["desc"], chain["level"], chain["angle"],
            chain["pos"], chain["valid"],
            st.mp_pos, st.mp_desc, st.mp_normal, st.mp_min_dist,
            st.mp_max_dist, st.mp_valid,
            sel,
            chain["mp_visible"], chain["mp_found"],
            chain["R_last"], chain["t_last"],
            chain["R_prev"], chain["t_prev"], chain["lm"],
            self.cam,
            ext_cfg=self.cfg.extractor, matcher_cfg=self.cfg.matcher,
            solver_cfg=self.cfg.solver, use_pallas=use_pallas,
            min_track_inliers=tcfg.min_track_inliers,
            has_vel=chain["has_vel"])

        self._pipe.append(dict(out=out, frame_id=self.frame_id,
                               timestamp=timestamp, metrics=metrics))
        self._start_host_prefetch(out.host_blob)
        self._chain = dict(
            desc=out.desc, level=out.level, angle=out.angle,
            pos=out.next_last_pos, valid=out.next_last_valid,
            R_last=out.R, t_last=out.t,
            R_prev=chain["R_last"], t_prev=chain["t_last"],
            lm=out.lm_matches,
            mp_visible=out.mp_visible, mp_found=out.mp_found,
            has_vel=bool(tcfg.use_motion_model))

        # retire past-depth frames (depth 0 without the async mapper: the
        # synchronous keyframe path mutates landmark pools in place, which
        # would invalidate an in-flight frame's chained tables)
        depth = 1 if self.async_mapper is not None else 0
        while len(self._pipe) > depth:
            self._retire_one()

    def _start_host_prefetch(self, arr):
        """Begin the host-blob D2H at dispatch time (value-neutral; see
        TrackerConfig.prefetch_host_blob).  The retire-side np.asarray
        then finds the literal already local instead of paying the relay
        round trip on the critical path."""
        if self._prefetch_failed or not self.cfg.tracker.prefetch_host_blob:
            return
        try:
            arr.copy_to_host_async()
        except Exception:   # PJRT client without async D2H: fetch at retire
            self._prefetch_failed = True

    def _materialize_frame(self, out, b: int) -> frame_mod.FrameData:
        """Pull frame b's features out of a stacked batch output (one
        jitted slice dispatch — keyframe-rate only)."""
        from . import frame_step as fs
        sl = fs.slice_frame(
            (out.xy, out.xy_und, out.response, out.angle, out.level,
             out.desc, out.kp_valid, out.inv_sigma2, out.sigma2),
            np.int32(b))
        xy, xy_und, response, angle, level, desc, kp_valid, inv_s2, s2 = sl
        return frame_mod.FrameData(
            feats=FrameFeatures(xy=xy, response=response, angle=angle,
                                level=level, desc=desc, valid=kp_valid),
            xy_und=xy_und, inv_sigma2=inv_s2, sigma2=s2)

    def _build_chain(self) -> dict:
        """Device handles feeding the next frame_step dispatch, rebuilt from
        host state after init/reloc/commit/reset (the in-program motion
        model reproduces the host velocity model exactly: with
        R_prev = vel_R^T R_last, t_prev = vel_R^T (t_last - vel_t) the
        program's R_last R_prev^T == vel_R)."""
        if self.last_frame is None and self._last_stacked is not None:
            self.last_frame = self._materialize_frame(*self._last_stacked)
        lf = self.last_frame
        tcfg = self.cfg.tracker
        st = self.slam_map.state
        R_last = np.asarray(self.last_R, np.float32)
        t_last = np.asarray(self.last_t, np.float32)
        has_vel = bool(tcfg.use_motion_model and self.vel_R is not None)
        if has_vel:
            R_prev = self.vel_R.T @ R_last
            t_prev = self.vel_R.T @ (t_last - self.vel_t)
        else:
            R_prev, t_prev = R_last, t_last
        return dict(
            desc=lf.feats.desc, level=lf.feats.level, angle=lf.feats.angle,
            pos=self.last_assoc_pos, valid=jnp.asarray(self.last_assoc_valid),
            R_last=jnp.asarray(R_last), t_last=jnp.asarray(t_last),
            R_prev=jnp.asarray(R_prev, jnp.float32),
            t_prev=jnp.asarray(t_prev, jnp.float32),
            lm=np.int32(self._prev_localmap_matches),
            mp_visible=st.mp_visible, mp_found=st.mp_found,
            has_vel=has_vel)

    def _refresh_sel(self) -> np.ndarray:
        cap = self.cfg.map.local_ba_max_points
        if (self._sel_cache is None or self._sel_dirty
                or self.frame_id - self._sel_frame >= 4):
            with _timer.stage("tracking", "selectLocalWindow"):
                ids = self._select_local_point_ids(cap)
            pad = cap - len(ids)
            self._sel_cache = np.concatenate(
                [ids, np.full(pad, -1)]).astype(np.int32)
            self._sel_frame = self.frame_id
            self._sel_dirty = False
        return self._sel_cache

    def _dispatch_batch(self):
        """Dispatch the buffered frames as ONE frame_step_scan program."""
        from . import frame_step as fs
        tcfg = self.cfg.tracker
        recs, self._batch_buf = self._batch_buf, []
        if not recs:
            return
        B = tcfg.frame_batch
        n_real = len(recs)
        # keep the caller's dtype: 8-bit frames upload 4x less than f32
        # through the device link (the scan casts to f32 in-program)
        imgs = [np.asarray(r["image"]) for r in recs]
        while len(imgs) < B:   # pad a partial flush: ONE compiled program
            imgs.append(imgs[-1])
        images = np.stack(imgs)
        row_valid = np.arange(B) < n_real
        st = self.slam_map.state
        chain = self._chain if self._chain is not None else self._build_chain()
        sel = self._refresh_sel()
        use_pallas = (jax.default_backend() in ("tpu", "axon")
                      and not self.cfg.extractor.score_harris)
        with _timer.stage("tracking", "dispatchFrameStep"):
            out = fs.frame_step_scan(
                images, row_valid,
                chain["desc"], chain["level"], chain["angle"],
                chain["pos"], chain["valid"],
                st.mp_pos, st.mp_desc, st.mp_normal, st.mp_min_dist,
                st.mp_max_dist, st.mp_valid,
                sel,
                chain["mp_visible"], chain["mp_found"],
                chain["R_last"], chain["t_last"],
                chain["R_prev"], chain["t_prev"], chain["lm"],
                np.bool_(chain["has_vel"]),
                self.cam,
                ext_cfg=self.cfg.extractor, matcher_cfg=self.cfg.matcher,
                solver_cfg=self.cfg.solver, use_pallas=use_pallas,
                min_track_inliers=tcfg.min_track_inliers)
        self._pipe.append(dict(out=out, recs=recs, n_real=n_real))
        self._start_host_prefetch(out.host_blob)
        if n_real == B:
            self._chain = dict(
                desc=out.last_desc, level=out.last_level,
                angle=out.last_angle,
                pos=out.next_last_pos, valid=out.next_last_valid,
                R_last=out.R_last, t_last=out.t_last,
                R_prev=out.R_prev, t_prev=out.t_prev,
                lm=out.lm_matches,
                mp_visible=out.mp_visible, mp_found=out.mp_found,
                has_vel=bool(tcfg.use_motion_model))
        else:
            # padded flush: the final carry tracked duplicated frames —
            # rebuild the chain from host state at the next dispatch
            self._chain = None

    def _retire_batch(self):
        """Fetch one batch's host blobs (ONE readback) and run the per-frame
        host bookkeeping rows in order."""
        rec = self._pipe.pop(0)
        out, recs, n_real = rec["out"], rec["recs"], rec["n_real"]
        tcfg = self.cfg.tracker
        with _timer.stage("tracking", "fetchHostBlob"):
            blobs = np.asarray(out.host_blob)
        self.slam_map.state = self.slam_map.state._replace(
            mp_visible=out.mp_visible, mp_found=out.mp_found)

        for b in range(n_real):
            r = recs[b]
            fid, timestamp, metrics = (r["frame_id"], r["timestamp"],
                                       r["metrics"])
            blob = blobs[b]
            pid_global = blob[16:].astype(np.int32)
            Rc = blob[:9].reshape(3, 3)
            tc = blob[9:12]
            n_f2f, n_lm, n_vis, n_inl = (int(x) for x in blob[12:16])
            metrics.update(f2f_matches=n_f2f, localmap_matches=n_lm,
                           n_visible=n_vis, inliers=n_inl)
            self._prev_localmap_matches = n_lm

            if n_inl < self._inlier_floor(fid):
                self.trajectory.append(
                    FrameRecord(fid, timestamp, Rc, tc, False))
                self._chain = None
                self.last_frame = None
                if self.slam_map.n_kf <= tcfg.reset_if_lost_before_kfs:
                    self._reset_map()
                    metrics["event"] = "system_reset"
                else:
                    self.state = TrackState.LOST
                    metrics["event"] = "tracking_lost"
                self._abort_batch_rows(out, recs, b + 1, n_real)
                self._last_stacked = None
                self._abort_pipe()
                return

            R_last = np.asarray(self.last_R)
            t_last = np.asarray(self.last_t)
            self.vel_R = _orthonormalize_np(Rc @ R_last.T)
            self.vel_t = tc - self.vel_R @ t_last
            self.last_R, self.last_t = Rc, tc
            self.last_assoc_pid = pid_global
            self.last_assoc_valid = pid_global >= 0
            self.trajectory.append(FrameRecord(fid, timestamp, Rc, tc, True))

            # keyframe decision (NeedNewKeyFrame, Tracking.cc:651-689)
            self.n_ref_tracked = max(self.n_ref_tracked, n_inl)
            need = self._need_kf(fid, n_inl)
            if need:
                am = self.async_mapper
                if am is not None and am.busy:
                    if tcfg.interrupt_ba:
                        am.interrupt_ba.set()
                    if n_inl < 2 * tcfg.kf_min_tracked:
                        self._force_kf = True
                        if tcfg.interrupt_ba:
                            am.kf_queued.set()
                else:
                    # stacked insertion: the batch-row slice happens inside
                    # the insert program (no slice_frame dispatch)
                    self._create_keyframe(None, timestamp, pid_global,
                                          metrics, frame_id=fid,
                                          stacked=(out, b))

        # the newest frame's features stay stacked until someone needs them
        self.last_frame = None
        self._last_stacked = (out, n_real - 1)
        self.last_assoc_pos = out.next_last_pos

    def _abort_batch_rows(self, out, recs, start: int, n_real: int):
        """Post-loss rows of a batch: route their device-resident features
        through the staged state machine — reloc / re-initialization, and
        once a mid-batch reloc recovers, staged WORKING tracking for the
        remaining rows.  (Through r5 recovered-state rows were silently
        dropped: no pose record and no keyframe decision, so every loss
        threw away up to frame_batch-1 frames — the reference processes
        every frame in whatever state the tracker is in,
        src/Tracking.cc:181-298.)"""
        for b in range(start, n_real):
            fd = self._materialize_frame(out, b)
            r = recs[b]
            saved = self.frame_id
            self.frame_id = r["frame_id"]
            try:
                if self.state in (TrackState.NOT_INITIALIZED,
                                  TrackState.INITIALIZING):
                    self._initialize(fd, r["timestamp"], r["metrics"])
                elif self.state == TrackState.LOST:
                    self._relocalize(fd, r["timestamp"], r["metrics"])
                elif self.state == TrackState.WORKING:
                    self._track(fd, r["timestamp"], r["metrics"])
            finally:
                self.frame_id = saved

    def _drain_pipe(self):
        if self._batch_buf:
            self._dispatch_batch()
        while self._pipe:
            if "recs" in self._pipe[0]:
                self._retire_batch()
            else:
                self._retire_one()

    def _retire_one(self):
        """Fetch the oldest in-flight frame's host blob and run the host-side
        bookkeeping: trajectory, stats, motion model, loss handling, and the
        keyframe decision."""
        rec = self._pipe.pop(0)
        out = rec["out"]
        fid, timestamp, metrics = rec["frame_id"], rec["timestamp"], rec["metrics"]
        tcfg = self.cfg.tracker

        # ONE host fetch: pose + stats + per-slot landmark ids
        with _timer.stage("tracking", "fetchHostBlob"):
            blob = np.asarray(out.host_blob)
        pid_global = blob[16:].astype(np.int32)
        Rc = blob[:9].reshape(3, 3)
        tc = blob[9:12]
        n_f2f, n_lm, n_vis, n_inl = (int(x) for x in blob[12:16])
        metrics.update(f2f_matches=n_f2f, localmap_matches=n_lm,
                       n_visible=n_vis, inliers=n_inl)
        self._prev_localmap_matches = n_lm

        # landmark stats were bumped inside the program
        self.slam_map.state = self.slam_map.state._replace(
            mp_visible=out.mp_visible, mp_found=out.mp_found)

        fd = frame_mod.FrameData(
            feats=FrameFeatures(
                xy=out.xy, response=out.response, angle=out.angle,
                level=out.level, desc=out.desc, valid=out.kp_valid),
            xy_und=out.xy_und, inv_sigma2=out.inv_sigma2, sigma2=out.sigma2)

        if n_inl < self._inlier_floor(fid):
            self.trajectory.append(FrameRecord(fid, timestamp, Rc, tc, False))
            self._chain = None
            if self.slam_map.n_kf <= tcfg.reset_if_lost_before_kfs:
                self._reset_map()
                metrics["event"] = "system_reset"
            else:
                self.state = TrackState.LOST
                metrics["event"] = "tracking_lost"
            self._abort_pipe()
            return

        # motion model update (host math — no device round trips)
        R_last = np.asarray(self.last_R)
        t_last = np.asarray(self.last_t)
        self.vel_R = _orthonormalize_np(Rc @ R_last.T)
        self.vel_t = tc - self.vel_R @ t_last

        self.last_R, self.last_t = Rc, tc
        self.last_frame = fd
        self.last_assoc_pid = pid_global
        self.last_assoc_valid = pid_global >= 0
        self.last_assoc_pos = out.next_last_pos

        self.trajectory.append(FrameRecord(fid, timestamp, Rc, tc, True))

        # keyframe decision (NeedNewKeyFrame, Tracking.cc:651-689)
        self.n_ref_tracked = max(self.n_ref_tracked, n_inl)
        need = self._need_kf(fid, n_inl)
        if need:
            am = self.async_mapper
            if am is not None and am.busy:
                # backpressure (SetAcceptKeyFrames, src/Tracking.cc:665-685):
                # normally skip, signalling InterruptBA; if tracking is
                # about to starve, mark a forced insertion — executed at
                # the next frame boundary with the pipeline empty — and a
                # queued keyframe so the worker drops its fuse/BA/cull tail
                if tcfg.interrupt_ba:
                    am.interrupt_ba.set()
                if n_inl < 2 * tcfg.kf_min_tracked:
                    self._force_kf = True
                    if tcfg.interrupt_ba:
                        am.kf_queued.set()
            else:
                self._create_keyframe(fd, timestamp, pid_global, metrics,
                                      frame_id=fid)
                if am is None:
                    # synchronous mapping moved landmark pools/poses:
                    # rebuild the dispatch chain from the committed state
                    self._chain = None


    def _need_kf(self, fid: int, n_inl: int) -> bool:
        """NeedNewKeyFrame (Tracking.cc:651-689), or the pinned schedule
        when one is installed (see kf_schedule)."""
        tcfg = self.cfg.tracker
        if self.kf_schedule is not None:
            return fid in self.kf_schedule
        frames_since = fid - self.last_kf_frame_id
        return (
            frames_since >= tcfg.max_frames_between_kf
            or (n_inl < tcfg.kf_min_tracked_ratio
                * max(self.n_ref_tracked, 1)
                and frames_since >= tcfg.min_frames_between_kf)
        ) and n_inl > tcfg.kf_min_inliers_insert

    def _abort_pipe(self):
        """After a loss/reset detected at retire time: frames dispatched
        beyond the lost frame chained from a bogus pose.  Route their
        device-resident features through the staged state machine (reloc /
        re-initialization) instead of trusting their fused results."""
        recs, self._pipe = self._pipe, []
        self._chain = None
        for rec in recs:
            out = rec["out"]
            if "recs" in rec:  # a batched (frame_step_scan) record
                self._abort_batch_rows(out, rec["recs"], 0, rec["n_real"])
                continue
            fd = frame_mod.FrameData(
                feats=FrameFeatures(
                    xy=out.xy, response=out.response, angle=out.angle,
                    level=out.level, desc=out.desc, valid=out.kp_valid),
                xy_und=out.xy_und, inv_sigma2=out.inv_sigma2,
                sigma2=out.sigma2)
            saved = self.frame_id
            self.frame_id = rec["frame_id"]
            try:
                if self.state in (TrackState.NOT_INITIALIZED,
                                  TrackState.INITIALIZING):
                    self._initialize(fd, rec["timestamp"], rec["metrics"])
                elif self.state == TrackState.LOST:
                    self._relocalize(fd, rec["timestamp"], rec["metrics"])
                elif self.state == TrackState.WORKING:
                    # a mid-abort reloc recovered: keep tracking the rest
                    # of the in-flight frames instead of dropping them
                    self._track(fd, rec["timestamp"], rec["metrics"])
            finally:
                self.frame_id = saved

    def _starved_keyframe(self, metrics):
        """Forced keyframe insertion under backpressure (pipeline drained,
        worker flushed): insert the latest retired frame as a keyframe."""
        self._force_kf = False
        self._drain_pipe()
        if self.state != TrackState.WORKING:
            return
        if self.last_frame is None and self._last_stacked is not None:
            self.last_frame = self._materialize_frame(*self._last_stacked)
        res = self.async_mapper.flush()
        if res is not None:
            self._commit_mapping(res, metrics)
        # the drain may already have retired a frame whose keyframe decision
        # inserted this exact frame — don't insert it twice
        if (self.trajectory
                and self.last_kf_frame_id == self.trajectory[-1].frame_id):
            return
        self._create_keyframe(
            self.last_frame, self.trajectory[-1].timestamp,
            self.last_assoc_pid, metrics,
            frame_id=self.trajectory[-1].frame_id)
        self._chain = None

    # ------------------------------------------------------------------
    def _initialize(self, fd, timestamp, metrics):
        n_kp = int(jnp.sum(fd.feats.valid))
        if self.state == TrackState.NOT_INITIALIZED:
            if n_kp > self.cfg.tracker.min_init_keypoints:
                self.init_frame = fd
                self.init_frame_id = self.frame_id
                self.init_timestamp = timestamp
                self.state = TrackState.INITIALIZING
                metrics["event"] = "init_ref_set"
            return

        if n_kp <= self.cfg.tracker.min_init_keypoints:
            self.state = TrackState.NOT_INITIALIZED
            metrics["event"] = "init_ref_dropped"
            return

        f0, f1 = self.init_frame, fd
        mm = tk.init_window_match(
            f0.xy_und, f0.feats.desc, f0.feats.level, f0.feats.angle, f0.feats.valid,
            f1.xy_und, f1.feats.desc, f1.feats.level, f1.feats.angle, f1.feats.valid,
            radius=float(self.cfg.matcher.window_init),
            max_dist=self.cfg.matcher.th_low,
            ratio=self.cfg.matcher.nn_ratio_init,
            histo_length=self.cfg.matcher.histo_length,
            check_orientation=self.cfg.matcher.check_orientation,
        )
        n_matches = int(jnp.sum(mm.valid))
        metrics["init_matches"] = n_matches
        if n_matches < self.cfg.tracker.min_init_matches:
            self.state = TrackState.NOT_INITIALIZED
            metrics["event"] = "init_too_few_matches"
            return

        # paired coordinates for the initializer (rows of frame 0)
        j = jnp.clip(mm.idx, 0, None)
        self.rng_key, sub = jax.random.split(self.rng_key)
        res = initializer.initialize(
            sub, f0.xy_und, f1.xy_und[j], mm.valid,
            jnp.asarray(self.cfg.camera.K), self.cfg.initializer,
        )
        if not bool(res.ok):
            metrics["event"] = "init_geometry_failed"
            # keep the reference frame; try again with the next frame
            return

        f0, f1, mm, res = self._compress_init(f0, f1, mm, res)
        self._create_initial_map(f0, f1, mm, res, timestamp, metrics)

    def _gather_frame_rows(self, fd, rows, row_valid):
        g = jnp.asarray(rows)
        f = fd.feats
        feats = FrameFeatures(
            xy=f.xy[g], response=f.response[g], angle=f.angle[g],
            level=f.level[g], desc=f.desc[g],
            valid=f.valid[g] & jnp.asarray(row_valid))
        return frame_mod.FrameData(
            feats=feats, xy_und=fd.xy_und[g],
            inv_sigma2=fd.inv_sigma2[g], sigma2=fd.sigma2[g])

    def _compress_init(self, f0, f1, mm, res):
        """The init frames carry init_features_mult x the runtime feature
        budget (src/Tracking.cc:128) but map pools are sized for the
        runtime budget: reduce both frames to max_keypoints rows before
        map creation — triangulation inliers first (kept aligned at rows
        0..m-1 of both frames), then highest-response fill.  Init-rate
        host work."""
        W = self.cfg.extractor.max_keypoints
        if f0.xy_und.shape[0] <= W and f1.xy_und.shape[0] <= W:
            return f0, f1, mm, res
        good = np.asarray(res.good) & np.asarray(mm.valid)
        idx = np.asarray(mm.idx)
        slots0 = np.where(good)[0][:W]
        slots1 = idx[slots0]
        m0 = len(slots0)

        def keep(matched, fd):
            v = np.asarray(fd.feats.valid)
            resp = np.asarray(fd.feats.response)
            rest = np.where(v)[0]
            rest = rest[~np.isin(rest, matched)]
            rest = rest[np.argsort(-resp[rest])]
            k = np.concatenate([matched, rest])[:W].astype(np.int64)
            kv = np.zeros(W, bool)
            kv[: len(k)] = True
            if len(k) < W:
                k = np.concatenate([k, np.zeros(W - len(k), np.int64)])
            return k, kv

        k0, kv0 = keep(slots0, f0)
        k1, kv1 = keep(slots1, f1)
        nf0 = self._gather_frame_rows(f0, k0, kv0)
        nf1 = self._gather_frame_rows(f1, k1, kv1)

        new_idx = np.full(W, -1, np.int32)
        new_idx[:m0] = np.arange(m0)        # matched rows lead in BOTH frames
        new_valid = np.zeros(W, bool)
        new_valid[:m0] = True
        new_pts = np.zeros((W, 3), np.float32)
        new_pts[:m0] = np.asarray(res.points)[slots0]
        new_dist = np.zeros(W, np.int32)
        new_dist[:m0] = np.asarray(mm.dist)[slots0]
        mm2 = mm._replace(idx=jnp.asarray(new_idx),
                          dist=jnp.asarray(new_dist),
                          valid=jnp.asarray(new_valid))
        res2 = res._replace(points=jnp.asarray(new_pts),
                            good=jnp.asarray(new_valid),
                            n_good=jnp.asarray(m0))
        return nf0, nf1, mm2, res2

    def _create_initial_map(self, f0, f1, mm, res, timestamp, metrics):
        """CreateInitialMap (src/Tracking.cc:394-479): two keyframes, the
        triangulated points, init BA, median-depth normalization."""
        good = np.asarray(res.good)
        X = np.asarray(res.points)
        slots0 = np.where(good)[0]
        slots1 = np.asarray(mm.idx)[slots0]

        smap = self.slam_map
        N = f0.xy_und.shape[0]

        obs0 = np.full(N, -1, np.int32)
        obs1 = np.full(N, -1, np.int32)

        kf0 = smap.add_keyframe(
            jnp.eye(3), jnp.zeros(3),
            f0.xy_und, f0.feats.level, f0.feats.angle, f0.feats.desc,
            f0.feats.valid, np.asarray(obs0, np.int32),
            self.init_frame_id, self.init_timestamp, parent=-1,
        )
        kf1 = smap.add_keyframe(
            res.R, res.t,
            f1.xy_und, f1.feats.level, f1.feats.angle, f1.feats.desc,
            f1.feats.valid, np.asarray(obs1, np.int32),
            self.frame_id, timestamp, parent=kf0,
        )

        ids = smap.add_points(
            jnp.asarray(X), f0.feats.desc, jnp.zeros((N, 3)),
            jnp.zeros(N), jnp.full(N, np.inf), kf1, good,
        )
        obs0[good] = ids[good]
        obs1h = np.full(N, -1, np.int32)
        obs1h[slots1] = ids[slots0]
        smap.set_observations(kf0, np.arange(N), np.asarray(obs0))
        smap.set_observations(kf1, np.arange(N), np.asarray(obs1h))

        # init BA (20 iters, Tracking.cc:448)
        self.local_mapper.global_ba(smap)

        # median-depth normalization (Tracking.cc:451-475)
        st = smap.state
        pos = np.asarray(st.mp_pos[: smap.n_mp])
        valid = smap.mp_valid_np[: smap.n_mp]
        R1 = np.asarray(st.kf_R[kf1])
        t1 = np.asarray(st.kf_t[kf1])
        z0 = pos[valid][:, 2]  # kf0 at identity: depth = z
        if len(z0) < self.cfg.tracker.min_init_matches or np.median(z0) <= 0:
            metrics["event"] = "init_rejected_after_ba"
            self._reset_map()
            return
        med = float(np.median(z0))
        scale = 1.0 / med
        smap.state = st._replace(
            mp_pos=st.mp_pos * scale,
            kf_t=st.kf_t.at[kf1].set(jnp.asarray(t1 * scale)),
        )
        # mirror the normalization (f32 multiply is bitwise identical)
        smap.host["mp_pos"] *= np.float32(scale)
        smap.host["kf_t"][kf1] = (t1 * scale).astype(np.float32)

        # point stats (normals, distance bands, descriptors already set)
        self.local_mapper.refresh_point_stats(smap)

        # place recognition: train the vocabulary on the init frames'
        # descriptors (the reference loads a pre-trained ORBvoc blob, absent
        # from this snapshot — SURVEY.md §7 phase 8 risk) and register the
        # two bootstrap keyframes
        if self.loop_closer is not None:
            pool = np.concatenate([
                np.asarray(f0.feats.desc)[np.asarray(f0.feats.valid)],
                np.asarray(f1.feats.desc)[np.asarray(f1.feats.valid)],
            ])
            self.loop_closer.ensure_vocabulary(pool)
            self.loop_closer.add_keyframe(smap, kf0)
            self.loop_closer.add_keyframe(smap, kf1)

        st = smap.state
        self.last_R = st.kf_R[kf1]
        self.last_t = st.kf_t[kf1]
        self.last_frame = f1
        pid = np.asarray(smap.state.kf_obs[kf1])
        self.last_assoc_pid = pid
        self.last_assoc_valid = jnp.asarray(pid >= 0)
        self.last_assoc_pos = smap.state.mp_pos[jnp.clip(jnp.asarray(pid), 0, None)]
        self.ref_kf = kf1
        self.n_ref_tracked = int((pid >= 0).sum())
        self.last_kf_frame_id = self.frame_id
        self.vel_R, self.vel_t = None, None
        self.state = TrackState.WORKING
        metrics["event"] = "map_initialized"
        metrics["n_init_points"] = int(good.sum())

        self.trajectory.append(FrameRecord(
            self.init_frame_id, self.init_timestamp,
            np.eye(3), np.zeros(3), True))
        self.trajectory.append(FrameRecord(
            self.frame_id, timestamp,
            np.asarray(self.last_R), np.asarray(self.last_t), True))

    def _reset_map(self):
        """Full system reset (Reset/RequestReset handshakes,
        src/Tracking.cc:1052-1089): clears map, keyframe database, motion
        model; tracking restarts from initialization."""
        if self.async_mapper is not None:
            try:  # drain the worker; its result dies with the old map
                self.async_mapper.flush()
            except Exception:
                pass
        self.slam_map = mapstore.SlamMap.create(
            self.cfg.map, self.cfg.extractor.max_keypoints)
        self.state = TrackState.NOT_INITIALIZED
        self.ref_kf = -1
        self.vel_R = None
        self.last_kf_frame_id = -10**9
        self.last_reloc_frame_id = -10**9
        self.n_ref_tracked = 0
        self._prev_localmap_matches = 0
        self._sel_cache = None
        self._sel_dirty = True
        self._pipe = []
        self._chain = None
        self._force_kf = False
        self._batch_buf = []
        self._last_stacked = None
        if self.loop_closer is not None:
            self.loop_closer.kf_bow = {}
            self.loop_closer.consistent_groups = []
            # stale old-map anchor would gate loop detection in the new map
            self.loop_closer.last_loop_kf = -(10 ** 9)
            self.loop_closer._covis_cache = None
            if self.loop_closer.voc is not None:
                self.loop_closer.db = db_mod.BowDatabase.create(
                    self.cfg.map.max_keyframes,
                    self.cfg.extractor.max_keypoints)

    # ------------------------------------------------------------------
    def _track(self, fd, timestamp, metrics):
        tcfg = self.cfg.tracker
        # after batched tracking (process_image, frame_batch>1) the last
        # frame lives only as a stacked-batch slice; materialize it before
        # the staged path dereferences it
        if self.last_frame is None and self._last_stacked is not None:
            self.last_frame = self._materialize_frame(*self._last_stacked)
        # --- pose prediction (motion model, Tracking.cc:130-139) ----------
        if tcfg.use_motion_model and self.vel_R is not None:
            R_pred = jnp.asarray(self.vel_R) @ self.last_R
            t_pred = jnp.asarray(self.vel_R) @ self.last_t + jnp.asarray(self.vel_t)
        else:
            R_pred, t_pred = self.last_R, self.last_t

        # --- the whole hot path in ONE device program ---------------------
        # (TrackWithMotionModel + fallbacks + TrackLocalMap + pose LM;
        # SURVEY.md §7 hard part 3: per-frame dispatch count)
        lf = self.last_frame
        mp = self._local_points()
        R_fin, t_fin, assoc2, inliers_mask, visible_mask, stats = tk.tracking_megastep(
            fd.xy_und, fd.feats.desc, fd.feats.level, fd.feats.angle,
            fd.feats.valid, fd.inv_sigma2,
            self.last_assoc_pos, lf.feats.desc, lf.feats.level,
            lf.feats.angle, self.last_assoc_valid,
            mp["pos"], mp["desc"], mp["normal"], mp["min_d"], mp["max_d"],
            mp["valid"],
            R_pred, t_pred, self.cam, self.cfg.solver,
            min_track_inliers=tcfg.min_track_inliers,
            prev_localmap_matches=self._prev_localmap_matches,
            scale_factor=self.cfg.extractor.scale_factor,
            n_levels=self.cfg.extractor.n_levels,
            matcher_cfg=self.cfg.matcher,
        )
        metrics["f2f_matches"] = int(stats["f2f_matches"])
        n_lm = int(stats["localmap_matches"])
        self._prev_localmap_matches = n_lm
        metrics["localmap_matches"] = n_lm
        metrics["n_visible"] = int(stats["n_visible"])
        n_inl = int(stats["n_inliers"])
        metrics["inliers"] = n_inl
        R_cur, t_cur = R_fin, t_fin

        if n_inl < self._inlier_floor(self.frame_id):
            self.trajectory.append(FrameRecord(
                self.frame_id, timestamp,
                np.asarray(R_cur), np.asarray(t_cur), False))
            if self.slam_map.n_kf <= tcfg.reset_if_lost_before_kfs:
                # early failure -> full system reset (src/Tracking.cc:278-285)
                self._reset_map()
                metrics["event"] = "system_reset"
            else:
                self.state = TrackState.LOST
                metrics["event"] = "tracking_lost"
            return

        # (megastep already SO(3)-projects R_fin — required because the
        # motion-model composition compounds off-manifold f32 error
        # geometrically, see se3.orthonormalize)

        # update visibility stats for culling (MapPoint found/visible,
        # src/MapPoint.cc:167-183: visible = in frustum, found = tracked)
        pid_local = np.asarray(assoc2.point_idx)
        inl = np.asarray(inliers_mask)
        self._bump_point_stats(
            mp["ids"], pid_local, np.asarray(assoc2.valid), inl,
            np.asarray(visible_mask))

        # --- motion model update ------------------------------------------
        Rl, tl = np.asarray(self.last_R), np.asarray(self.last_t)
        Rc, tc = np.asarray(R_cur), np.asarray(t_cur)
        self.vel_R = np.asarray(se3.orthonormalize(jnp.asarray(Rc @ Rl.T)))
        self.vel_t = tc - self.vel_R @ tl

        self.last_R, self.last_t = R_cur, t_cur
        self.last_frame = fd

        # per-slot association of this frame (for next frame-to-frame step)
        pid_global = np.where(
            np.asarray(assoc2.valid) & inl, mp["ids"][pid_local], -1
        ).astype(np.int32)
        self.last_assoc_pid = pid_global
        self.last_assoc_valid = jnp.asarray(pid_global >= 0)
        self.last_assoc_pos = self.slam_map.state.mp_pos[
            jnp.clip(jnp.asarray(pid_global), 0, None)]

        self.trajectory.append(FrameRecord(
            self.frame_id, timestamp, Rc, tc, True))

        # --- keyframe decision (NeedNewKeyFrame, Tracking.cc:651-689) -----
        # The 90% rule compares against the running maximum of tracked
        # inliers since the last keyframe (equivalent to the reference's
        # "tracked < 0.9 * reference-KF matches": right after insertion the
        # reference count equals the tracking yield, and our running max
        # keeps the trigger live as the map grows between keyframes).
        self.n_ref_tracked = max(self.n_ref_tracked, n_inl)
        need = self._need_kf(self.frame_id, n_inl)
        if need:
            am = self.async_mapper
            if am is not None and am.busy:
                # backpressure (SetAcceptKeyFrames, src/Tracking.cc:665-685):
                # normally skip; but if tracking is about to starve, drain
                # the worker and insert (the InterruptBA analog)
                if tcfg.interrupt_ba:
                    am.interrupt_ba.set()
                if n_inl < 2 * tcfg.kf_min_tracked:
                    if tcfg.interrupt_ba:
                        am.kf_queued.set()
                    res = am.flush()
                    if res is not None:
                        self._commit_mapping(res, metrics)
                    self._create_keyframe(
                        fd, timestamp, self.last_assoc_pid, metrics)
            else:
                self._create_keyframe(fd, timestamp, pid_global, metrics)

    # ------------------------------------------------------------------
    def _relocalize(self, fd, timestamp, metrics):
        """BoW relocalisation (src/Tracking.cc:867-1036): candidate
        keyframes from the database, descriptor matching against their
        landmarks, batched PnP RANSAC, pose refinement, local-map
        re-acquisition."""
        metrics["event"] = "lost"
        # reloc reads the place-recognition DB the worker writes: drain it
        if self.async_mapper is not None:
            res = self.async_mapper.flush()
            if res is not None:
                self._commit_mapping(res, metrics)
        lc = self.loop_closer
        if lc is None or lc.voc is None or self.slam_map.n_kf == 0:
            if self.last_R is not None:
                self.trajectory.append(FrameRecord(
                    self.frame_id, timestamp, np.asarray(self.last_R),
                    np.asarray(self.last_t), False))
            return
        st = self.slam_map.state
        bow = voc_mod.transform_np(
            lc.voc, np.asarray(fd.feats.desc), np.asarray(fd.feats.valid))
        P = self.cfg.map.max_points
        # host mirrors + sparse native counting: the previous device
        # [K,P]@[P,K] incidence product plus full-matrix fetch cost several
        # round trips on every LOST frame
        covis = mapstore.connected_weights(
            native.covisibility_counts(
                self.slam_map.obs_np, self.slam_map.kf_valid_np,
                P).astype(np.int64),
            self.cfg.loop.covisibility_weight_min).astype(np.float64)
        lc.ensure_capacity(self.slam_map.cfg.max_keyframes)
        cands = db_mod.detect_candidates(
            lc.db, bow, np.zeros(len(lc.db.has_row), bool), covis,
            min_score=None)
        # Augment weak BoW shortlists with the most recent live keyframes:
        # a tracking loss usually happens NEAR the last tracked position,
        # and the reference's own recovery path for that case is a reloc
        # against the last-KF window (ForceRelocalisation,
        # src/Tracking.cc:867-884).  With few shared words (fast motion,
        # thin coverage) the BoW shortlist alone held recovery at 30-70
        # frames in the endurance runs; the recency candidates cut it to
        # a few frames whenever the camera is still in last-known space.
        live = np.where(self.slam_map.kf_valid_np)[0]
        by_recency = live[np.argsort(
            -np.asarray(self.slam_map.kf_frame_id)[live])]
        recent = [k for k in by_recency
                  if k not in set(int(c) for c in cands)][:3]
        cands = np.concatenate([np.asarray(cands, np.int64),
                                np.asarray(recent, np.int64)])
        metrics["reloc_candidates"] = len(cands)

        for cand in cands[:8]:
            cand = int(cand)
            obs = self.slam_map.obs_np[cand]
            if (obs >= 0).sum() < 15:
                continue
            # frame keypoints (rows) vs candidate's landmarks (cols)
            dist = match_ops.hamming_matrix(fd.feats.desc, st.kf_desc[cand])
            mask = match_ops.valid_mask(fd.feats.valid, jnp.asarray(obs >= 0))
            mm = match_ops.match_nn(
                match_ops.apply_masks(dist, mask),
                max_dist=self.cfg.matcher.th_low, ratio=0.75)
            if self.cfg.matcher.check_orientation:
                # SearchByBoW's rotation histogram (ORBmatcher.cc reloc
                # call is matcher(0.75, true)) — without it ~60% of the
                # BoW matches here are false and RANSAC starves
                keep = match_ops.rotation_consistency(
                    fd.feats.angle, st.kf_angle[cand], mm,
                    histo_length=self.cfg.matcher.histo_length)
                mm = match_ops.Matches(
                    idx=jnp.where(keep, mm.idx, -1), dist=mm.dist,
                    valid=keep)
            mm = match_ops.resolve_duplicates(mm, obs.shape[0])
            n_matches = int(jnp.sum(mm.valid))
            metrics["reloc_matches"] = n_matches
            if n_matches < 15:
                continue

            idx = np.asarray(jnp.clip(mm.idx, 0, None))
            pid = obs[idx]
            pvalid = np.asarray(mm.valid) & (pid >= 0)
            X = st.mp_pos[jnp.asarray(np.clip(pid, 0, None))]
            self.rng_key, sub = jax.random.split(self.rng_key)
            # EPnP RANSAC budget per SetRansacParameters(0.99, 10, 300, 4,
            # 0.5, 5.991) (Tracking.cc:922, PnPsolver.cc:85-116):
            # iters = log(1-p)/log(1-eps^min_set) capped at max_iters;
            # power-of-2 bucket since n_samples is a static arg.
            scfg = self.cfg.solver
            n_samp = int(np.ceil(
                np.log(max(1e-9, 1.0 - scfg.pnp_prob))
                / np.log(1.0 - scfg.pnp_epsilon ** scfg.pnp_min_set)))
            # the analytic budget assumes the reference's epsilon=0.5
            # inlier ratio; measured BoW-match purity after the rotation
            # gate is ~0.5-0.7 but drops below 0.4 on repetitive texture,
            # where 128 samples starve (observed in the resume e2e).  The
            # batched vmapped EPnP makes extra samples nearly free: floor
            # at the reference's 300-iteration cap (-> 512 bucket).
            n_samp = max(scfg.pnp_max_iters, min(n_samp, scfg.pnp_max_iters))
            n_samp = 1 << (n_samp - 1).bit_length()
            res = pnp.pnp_ransac(
                sub, X, fd.xy_und, fd.inv_sigma2, jnp.asarray(pvalid),
                jnp.asarray(self.cfg.camera.K),
                n_samples=n_samp, min_set=scfg.pnp_min_set,
                chi2_th=scfg.pnp_th2,
                min_inliers=scfg.pnp_min_inliers)
            if not bool(res.ok):
                continue
            # refine over the RANSAC inliers only (Tracking.cc:958-980
            # nulls non-inlier map points before PoseOptimization; feeding
            # the false BoW matches back in drags the pose away)
            r1 = pose_opt.optimize_pose(
                res.R, res.t, X, fd.xy_und, fd.inv_sigma2,
                jnp.asarray(pvalid) & res.inliers, self.cam,
                self.cfg.solver)
            if int(r1.n_inliers) < self.cfg.solver.pnp_min_inliers:
                continue

            # local-map re-acquisition at the recovered pose, seeded by the
            # PnP inlier landmarks (the stale pre-loss associations would
            # vote the wrong keyframe neighborhood)
            inl_pnp = np.asarray(res.inliers)
            mp = self._local_points(seed_pids=pid[inl_pnp & pvalid])

            def match_round(R, t, th, max_dist):
                assoc, _ = tk.match_local_map(
                    fd.xy_und, fd.feats.desc, fd.feats.level,
                    fd.feats.angle, fd.feats.valid,
                    mp["pos"], mp["desc"], mp["normal"], mp["min_d"],
                    mp["max_d"], mp["valid"],
                    R, t, self.cam,
                    th=jnp.float32(th), max_dist=max_dist,
                    ratio=self.cfg.matcher.nn_ratio_localmap,
                    n_levels=self.cfg.extractor.n_levels,
                    radius_tight=self.cfg.matcher.radius_view_cos_tight,
                    radius_wide=self.cfg.matcher.radius_view_cos_wide)
                r = pose_opt.optimize_pose(
                    R, t, assoc.pos, fd.xy_und, fd.inv_sigma2,
                    assoc.valid, self.cam, self.cfg.solver)
                return assoc, r

            # escalation rounds (Tracking.cc:984-1021): wide projection
            # search first; if the result lands in the 30..50 band, a
            # narrow search at the refined pose with a tighter descriptor
            # gate decides acceptance.
            mcfg = self.cfg.matcher
            need = self.cfg.tracker.min_localmap_inliers_reloc
            assoc2, r2 = match_round(r1.R, r1.t, mcfg.reloc_proj_th_wide,
                                     mcfg.th_high)
            n_inl = int(r2.n_inliers)
            if (self.cfg.tracker.min_localmap_inliers <= n_inl < need):
                assoc2, r2 = match_round(r2.R, r2.t,
                                         mcfg.reloc_proj_th_narrow,
                                         mcfg.reloc_orb_dist)
                n_inl = int(r2.n_inliers)
            metrics["reloc_inliers"] = n_inl
            if n_inl < need:
                continue

            # recovered
            R_cur = se3.orthonormalize(r2.R)
            t_cur = r2.t
            self.last_R, self.last_t = R_cur, t_cur
            self.last_frame = fd
            pid_local = np.asarray(assoc2.point_idx)
            inl = np.asarray(r2.inliers)
            pid_global = np.where(
                np.asarray(assoc2.valid) & inl, mp["ids"][pid_local], -1
            ).astype(np.int32)
            self.last_assoc_pid = pid_global
            self.last_assoc_valid = jnp.asarray(pid_global >= 0)
            self.last_assoc_pos = self.slam_map.state.mp_pos[
                jnp.clip(jnp.asarray(pid_global), 0, None)]
            self.vel_R, self.vel_t = None, None
            self._prev_localmap_matches = n_inl
            self.state = TrackState.WORKING
            self.last_reloc_frame_id = self.frame_id
            metrics["event"] = "relocalized"
            metrics["reloc_kf"] = cand
            self.trajectory.append(FrameRecord(
                self.frame_id, timestamp, np.asarray(R_cur),
                np.asarray(t_cur), True))
            return

        # every attempted frame leaves a record (trajectory completeness:
        # a live consumer sees an explicit untracked pose, not a gap);
        # last known pose is the best available estimate while LOST
        if self.last_R is not None:
            self.trajectory.append(FrameRecord(
                self.frame_id, timestamp, np.asarray(self.last_R),
                np.asarray(self.last_t), False))

    # ------------------------------------------------------------------
    def _local_points(self, seed_pids: Optional[np.ndarray] = None) -> dict:
        """Covisibility-limited local map (UpdateReference/
        UpdateReferenceKeyFrames, src/Tracking.cc:754-865): keyframes are
        voted by the last frame's tracked landmarks (or by seed_pids during
        relocalisation), capped at max_local_keyframes; the local points are
        their observations."""
        smap = self.slam_map
        cap = self.cfg.map.local_ba_max_points
        st = smap.state
        ids = self._select_local_point_ids(cap, seed_pids)
        pad = cap - len(ids)
        sel = jnp.asarray(np.concatenate([ids, np.zeros(pad, np.int64)]))
        return {
            "ids": np.concatenate([ids, np.full(pad, -1)]).astype(np.int32),
            "pos": st.mp_pos[sel],
            "desc": st.mp_desc[sel],
            "normal": st.mp_normal[sel],
            "min_d": st.mp_min_dist[sel],
            "max_d": st.mp_max_dist[sel],
            "valid": jnp.asarray(np.concatenate(
                [np.ones(len(ids), bool), np.zeros(pad, bool)])),
        }

    def _host_kf_obs(self) -> np.ndarray:
        # the SlamMap maintains its own authoritative host observation
        # mirror (mapstore.SlamMap.obs_np) — zero device fetches here
        return self.slam_map.obs_np

    def _host_mp_valid(self) -> np.ndarray:
        # maintained mirror (mapstore.SlamMap.mp_valid_np) — no fetch
        return self.slam_map.mp_valid_np

    def _select_local_point_ids(self, cap: int,
                                seed_pids: Optional[np.ndarray] = None
                                ) -> np.ndarray:
        n_kf = self.slam_map.n_kf
        mp_valid = self._host_mp_valid()
        tracked = seed_pids if seed_pids is not None else self.last_assoc_pid
        if tracked is None or n_kf == 0:
            return np.where(mp_valid)[0][:cap]
        tracked = tracked[tracked >= 0]
        if len(tracked) == 0:
            return np.where(mp_valid)[0][:cap]
        # vote keyframes by how many tracked landmarks they observe
        # (native host op; runs every frame)
        P = self.cfg.map.max_points
        seen = np.zeros(P + 1, bool)
        seen[tracked] = True
        obs = self._host_kf_obs()[:n_kf]
        votes = native.vote_keyframes(obs, seen)
        order = np.argsort(-votes)
        local_kfs = [int(k) for k in order[: self.cfg.tracker.max_local_keyframes]
                     if votes[k] > 0]
        if not local_kfs:
            return np.where(mp_valid)[0][:cap]
        sel_obs = obs[local_kfs]
        ids = np.unique(sel_obs[sel_obs >= 0])
        ids = ids[mp_valid[ids]]
        return ids[:cap]

    def _bump_point_stats(self, ids, pid_local, matched, inlier, visible):
        st = self.slam_map.state
        vis_ids = ids[visible]
        found_ids = ids[pid_local[matched & inlier]]
        vis_ids = vis_ids[vis_ids >= 0]
        found_ids = found_ids[found_ids >= 0]
        self.slam_map.state = st._replace(
            mp_visible=st.mp_visible.at[jnp.asarray(vis_ids)].add(1),
            mp_found=st.mp_found.at[jnp.asarray(found_ids)].add(1),
        )

    def _create_keyframe(self, fd, timestamp, pid_global, metrics,
                         frame_id: Optional[int] = None, stacked=None):
        if frame_id is None:
            frame_id = self.frame_id
        smap = self.slam_map

        # keyframe-pool compaction at the insertion boundary: pack the holes
        # culling left and remap every keyframe-indexed consumer BEFORE the
        # old ref_kf id is used as the new keyframe's parent.  (smap.cfg, not
        # self.cfg.map: the pool may have grown past the configured size)
        if smap.n_kf >= smap.cfg.max_keyframes:
            smap.last_kf_compaction_lut = None
            freed = smap.compact_keyframes()
            if freed > 0:
                lut = smap.last_kf_compaction_lut
                smap.last_kf_compaction_lut = None
                if self.ref_kf >= 0:
                    self.ref_kf = int(lut[self.ref_kf])
                self._sel_dirty = True
                if self.loop_closer is not None:
                    self.loop_closer.remap_keyframes(lut)
                metrics["kf_compaction_freed"] = freed

        if stacked is not None:
            out, b = stacked
            kf = smap.add_keyframe(
                self.last_R, self.last_t,
                out.xy_und, out.level, out.angle, out.desc, out.kp_valid,
                np.asarray(pid_global, np.int32),
                frame_id, timestamp, parent=self.ref_kf, batch_index=b,
            )
        else:
            kf = smap.add_keyframe(
                self.last_R, self.last_t,
                fd.xy_und, fd.feats.level, fd.feats.angle, fd.feats.desc,
                fd.feats.valid, np.asarray(pid_global, np.int32),
                frame_id, timestamp, parent=self.ref_kf,
            )
        self.ref_kf = kf
        self.n_ref_tracked = int((pid_global >= 0).sum())
        self.last_kf_frame_id = frame_id
        self._sel_dirty = True
        metrics["event"] = "keyframe_inserted"
        metrics["kf_id"] = kf

        if self.async_mapper is not None:
            # keyframe-rate work runs on the worker over a snapshot; the
            # result is committed at a later frame boundary (_poll_mapper)
            self.async_mapper.submit(smap, kf)
            return

        # keyframe-rate map building (synchronous)
        lm_metrics = self.local_mapper.process_keyframe(smap, kf)
        metrics.update(lm_metrics)

        # culled keyframes leave the place-recognition database too
        if self.loop_closer is not None and self.loop_closer.db is not None:
            for ck in (self.local_mapper.last_culled_kfs or []):
                self.loop_closer.db = self.loop_closer.db.remove(ck)
                self.loop_closer.kf_bow.pop(ck, None)

        # loop detection/correction at keyframe rate
        if self.loop_closer is not None and self.loop_closer.voc is not None:
            lc_metrics = self.loop_closer.process_keyframe(smap, kf)
            metrics.update(lc_metrics)
            if lc_metrics.get("loop_closed"):
                # the whole map moved: refresh stats and re-anchor tracking
                self.local_mapper.refresh_point_stats(smap)
                self.vel_R, self.vel_t = None, None

        # keyframe poses may have moved in local BA: refresh cached pose
        st = smap.state
        self.last_R = st.kf_R[kf]
        self.last_t = st.kf_t[kf]
        pid = smap.obs_np[kf].copy()
        self.last_assoc_pid = pid
        self.last_assoc_valid = jnp.asarray(pid >= 0)
        self.last_assoc_pos = st.mp_pos[jnp.clip(jnp.asarray(pid), 0, None)]

    # ------------------------------------------------------------------
    def keyframe_trajectory(self):
        """TUM-format keyframe trajectory (src/main.cc:160-185): camera-to-
        world poses of all keyframes."""
        self.finish()  # commit any in-flight mapping work first
        smap = self.slam_map
        rows = []
        st = smap.state
        kf_valid = smap.kf_valid_np
        for k in range(smap.n_kf):
            if not kf_valid[k]:
                continue  # culled KFs keep stale poses (main.cc:169 isBad skip)
            R = np.asarray(st.kf_R[k])
            t = np.asarray(st.kf_t[k])
            Rwc = R.T
            twc = -R.T @ t
            q = np.asarray(se3.to_quaternion(jnp.asarray(Rwc)))
            rows.append((self.kf_timestamp(k), twc, q))
        return rows

    def kf_timestamp(self, k):
        return float(self.slam_map.kf_timestamp[k])
