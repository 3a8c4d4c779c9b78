"""Loop detection and correction: host orchestration of the batched
place-recognition + Sim3 + pose-graph kernels.

Replaces the LoopClosing thread (src/LoopClosing.cc).  Per new keyframe:
  1. DetectLoop (:99-229): BoW candidates gated by a minimum-score vs the
     covisible neighborhood and by covisibility-consistency across 3
     consecutive keyframes;
  2. ComputeSim3 (:231-406): descriptor matching against each candidate's
     landmarks, batched Sim3 RANSAC, acceptance by inlier and total-match
     counts;
  3. CorrectLoop (:408-570): new loop edge, essential-graph Sim3
     optimization over all keyframes (fixed = loop match), landmark
     re-mapping through reference keyframes, duplicate fusion across the
     loop, spanning-tree/loop-edge bookkeeping.  (ORB-SLAM v1 runs no
     global BA after loops — neither do we.)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geometry import se3, sim3, camera as cam_mod
from ..mapping import mapstore
from .. import native
from ..utils.timing import GLOBAL_TIMER as _timer
from ..ops import match as m
from ..place import vocabulary as voc_mod
from ..place import database as db_mod
from ..solvers import sim3_solver, sim3_opt, pose_graph


@dataclass
class LoopCloser:
    cfg: SystemConfig
    cam: cam_mod.CameraParams
    voc: Optional[voc_mod.Vocabulary] = None
    db: Optional[db_mod.BowDatabase] = None
    kf_bow: dict = field(default_factory=dict)
    last_loop_kf: int = -(10 ** 9)
    consistent_groups: List = field(default_factory=list)
    # covisibility-matrix cache keyed by the kf_obs array generation
    _covis_cache: tuple = None

    def remap_keyframes(self, lut: np.ndarray):
        """Apply a keyframe-pool compaction LUT (old id -> new id, -1 =
        dropped) to every keyframe-indexed structure this stage owns."""
        if self.db is not None:
            ids, w, has = self.db.ids, self.db.w, self.db.has_row
            new_ids = np.full_like(ids, 2**30)
            new_w = np.zeros_like(w)
            new_has = np.zeros_like(has)
            old = np.where(has & (lut[: len(has)] >= 0))[0]
            nk = lut[old]
            new_ids[nk] = ids[old]
            new_w[nk] = w[old]
            new_has[nk] = True
            self.db = type(self.db)(ids=new_ids, w=new_w, has_row=new_has)
        self.kf_bow = {int(lut[k]): v for k, v in self.kf_bow.items()
                       if lut[k] >= 0}
        self.consistent_groups = [
            ({int(lut[k]) for k in group if lut[k] >= 0}, count)
            for group, count in self.consistent_groups]
        self.consistent_groups = [(g, c) for g, c in self.consistent_groups
                                  if g]
        if self.last_loop_kf >= 0:
            nk = int(lut[self.last_loop_kf])
            # if compaction dropped the anchor, a stale index would make the
            # min_kfs_between_loops gate count from an unrelated keyframe
            self.last_loop_kf = nk if nk >= 0 else -(10**9)
        self._covis_cache = None

    def _covis_np(self, smap) -> np.ndarray:
        # cached per kf_obs generation; sparse point->keyframe counting in
        # the C extension (native.covisibility_counts) — cost follows the
        # observation count, not K x max_points, so loop detection stays
        # flat as the map grows (round-1 [K,P] incidence BLAS removed).
        # obs comes from the maintained host mirror — no device fetch.
        st = smap.state
        ent = self._covis_cache
        if ent is not None and ent[0] is st.kf_obs:
            return ent[1]
        obs = smap.obs_np
        kf_valid = smap.kf_valid_np
        W = native.covisibility_counts(
            obs, kf_valid, self.cfg.map.max_points).astype(np.int64)
        # edge rule: weight >= 15 or best-edge fallback (KeyFrame.cc:378-421)
        W = mapstore.connected_weights(
            W, self.cfg.loop.covisibility_weight_min)
        self._covis_cache = (st.kf_obs, W)
        return W
    rng_key: jax.Array = field(default_factory=lambda: jax.random.PRNGKey(7))
    n_loops_closed: int = 0

    def ensure_vocabulary(self, descriptors: np.ndarray):
        """Vocabulary priority (TemplatedVocabulary::loadFromTextFile role):
        explicit ORBvoc.txt path > shipped pre-trained 10^4-word vocabulary
        (data/vocab10k.npz) > in-situ training on the init frames (tiny
        fallback for synthetic worlds)."""
        if self.voc is None:
            if self.cfg.loop.vocab_path:
                p = self.cfg.loop.vocab_path
                self.voc = (voc_mod.load_npz(p) if p.endswith(".npz")
                            else voc_mod.load_orbvoc_text(p))
            elif self.cfg.loop.vocab_use_prebuilt and \
                    voc_mod.prebuilt() is not None:
                self.voc = voc_mod.prebuilt()
            else:
                self.voc = voc_mod.train(
                    descriptors, k=self.cfg.loop.vocab_branching,
                    depth=self.cfg.loop.vocab_depth)
            self.db = db_mod.BowDatabase.create(
                self.cfg.map.max_keyframes, self.cfg.extractor.max_keypoints)

    def ensure_capacity(self, max_kf: int):
        """Re-pad the place-recognition rows after keyframe-pool growth
        (mapstore.grow_keyframes: ids stable, capacity doubled)."""
        if self.db is not None and len(self.db.has_row) < max_kf:
            self.db = self.db.grown(max_kf)

    def add_keyframe(self, smap: mapstore.SlamMap, kf: int):
        """BoW transform fully on the HOST: descriptors and validity come
        from the maintained row mirrors (mapstore insertion fetched them in
        one packed round trip), the tree descent/scoring is numpy — ZERO
        device interactions per keyframe here (see place/database.py)."""
        self.ensure_capacity(smap.cfg.max_keyframes)
        with _timer.stage("loopclosing", "bowTransform"):
            bow = voc_mod.transform_np(
                self.voc, smap.host["kf_desc"][kf],
                smap.host["kf_kp_valid"][kf])
        self.kf_bow[kf] = bow
        self.db = self.db.add(kf, bow)

    # ------------------------------------------------------------------
    def process_keyframe(self, smap: mapstore.SlamMap, kf: int) -> dict:
        metrics = {}
        if self.voc is None:
            return metrics
        self.add_keyframe(smap, kf)
        if kf - self.last_loop_kf < self.cfg.loop.min_kfs_between_loops \
                or smap.n_kf < self.cfg.loop.min_kfs_between_loops:
            return metrics

        with _timer.stage("loopclosing", "detect"):
            cand = self._detect(smap, kf)
        metrics["loop_candidates"] = len(cand)
        if not len(cand):
            return metrics

        with _timer.stage("loopclosing", "computeSim3"):
            hit = self._compute_sim3(smap, kf, cand)
        if hit is None:
            return metrics
        loop_kf, g12 = hit
        metrics["loop_with"] = loop_kf
        with _timer.stage("loopclosing", "correctLoop"):
            self._correct(smap, kf, loop_kf, g12)
        self.last_loop_kf = kf
        self.n_loops_closed += 1
        metrics["loop_closed"] = True
        return metrics

    # ------------------------------------------------------------------
    def _detect(self, smap: mapstore.SlamMap, kf: int) -> np.ndarray:
        st = smap.state
        P = self.cfg.map.max_points
        weights_row = self._covis_np(smap)[kf]
        neighbors = np.where(weights_row > 0)[0]

        # minScore = min BoW similarity vs the covisible neighborhood
        # (LoopClosing.cc:119-136)
        bow = self.kf_bow[kf]
        # The reference's minScore is the min BoW similarity over the
        # keyframe's covisible neighborhood, which is non-empty by
        # construction there (every inserted KF shares points with its
        # parent; LoopClosing.cc:119-136 iterates a non-empty vpConnected).
        # A neighbor-free keyframe has no data-derived score floor, so any
        # constant here would be invented — skip detection for this KF
        # instead (the candidate gate would be meaningless without a floor,
        # and such a KF is degenerate: it shares no landmarks with the map).
        scores = [voc_mod.score_l1_np(bow, self.kf_bow[int(nb)])
                  for nb in neighbors if int(nb) in self.kf_bow]
        if not scores:
            # the reference clears mvConsistentGroups whenever detection
            # yields no candidates (LoopClosing.cc:146-150); keeping stale
            # groups here would let the consecutive-consistency gate pass
            # across skipped keyframes (advisor r4)
            self.consistent_groups = []
            return np.zeros(0, np.int64)
        min_score = min(scores)

        exclude = np.zeros(len(self.db.has_row), bool)
        exclude[kf] = True
        exclude[neighbors] = True
        covis = self._covis_np(smap).astype(np.float64)
        cand = db_mod.detect_candidates(
            self.db, bow, exclude, covis,
            min_score=max(min_score, 1e-3),
            shared_ratio=self.cfg.loop.shared_word_ratio,
            acc_ratio=self.cfg.loop.acc_score_ratio,
            top_group=self.cfg.loop.covisibility_group_top,
        )

        # covisibility-consistency over consecutive keyframes
        # (LoopClosing.cc:152-228): a candidate must reappear (sharing a
        # covisibility group) for `consistency_threshold` keyframes.
        enough = []
        new_groups = []
        for c in cand:
            group = set(np.where(covis[c] > 0)[0].tolist()) | {int(c)}
            matched = False
            for prev_group, count in self.consistent_groups:
                if group & prev_group:
                    new_groups.append((group, count + 1))
                    if count + 1 >= self.cfg.loop.consistency_threshold:
                        enough.append(int(c))
                    matched = True
                    break
            if not matched:
                new_groups.append((group, 1))
        self.consistent_groups = new_groups
        return np.asarray(enough, np.int64)

    # ------------------------------------------------------------------
    def _compute_sim3(self, smap: mapstore.SlamMap, kf: int, cands):
        st = smap.state
        K = jnp.asarray(self.cfg.camera.K)
        scale2 = self.cfg.extractor.sigma2

        for cand in cands:
            cand = int(cand)
            # landmark-to-landmark descriptor matching (SearchByBoW analog;
            # on TPU a full dense match needs no BoW gating)
            obs1 = smap.obs_np[kf]
            obs2 = smap.obs_np[cand]
            s1 = np.where(obs1 >= 0)[0]
            s2 = np.where(obs2 >= 0)[0]
            if len(s1) < self.cfg.loop.min_bow_matches or \
               len(s2) < self.cfg.loop.min_bow_matches:
                continue
            d1 = st.kf_desc[kf]
            d2 = st.kf_desc[cand]
            dist = m.hamming_matrix(d1, d2)
            mask = m.valid_mask(jnp.asarray(obs1 >= 0), jnp.asarray(obs2 >= 0))
            mm = m.match_nn(m.apply_masks(dist, mask),
                            max_dist=self.cfg.matcher.th_low, ratio=0.75)
            mm = m.resolve_duplicates(mm, d2.shape[0])
            n_matches = int(jnp.sum(mm.valid))
            if n_matches < self.cfg.loop.min_bow_matches:
                continue

            # 3D-3D pairs in each keyframe's camera frame
            idx2 = np.asarray(jnp.clip(mm.idx, 0, None))
            vm = np.asarray(mm.valid)
            pid1 = obs1
            pid2 = obs2[idx2]
            pv = vm & (pid1 >= 0) & (pid2 >= 0)
            Xw1 = st.mp_pos[jnp.asarray(np.clip(pid1, 0, None))]
            Xw2 = st.mp_pos[jnp.asarray(np.clip(pid2, 0, None))]
            X1 = se3.transform(st.kf_R[kf], st.kf_t[kf], Xw1)
            X2 = se3.transform(st.kf_R[cand], st.kf_t[cand], Xw2)
            lv1 = np.asarray(st.kf_level[kf])
            lv2 = np.asarray(st.kf_level[cand])[idx2]
            me1 = jnp.asarray(9.21 * scale2[np.clip(lv1, 0, len(scale2) - 1)])
            me2 = jnp.asarray(9.21 * scale2[np.clip(lv2, 0, len(scale2) - 1)])

            self.rng_key, sub = jax.random.split(self.rng_key)
            # RANSAC budget from the adaptive formula the reference seeds
            # with SetRansacParameters(0.99, 20, 300) (Sim3Solver.cc:59-83):
            # eps = minInliers/N, iters = log(1-p)/log(1-eps^3), capped at
            # max_iters.  Rounded up to a power of two: n_samples is a
            # static arg, so buckets bound recompiles.
            scfg = self.cfg.solver
            n_corr = int(np.asarray(pv).sum())
            eps = min(1.0 - 1e-6,
                      scfg.sim3_min_inliers / max(n_corr, 1))
            n_samp = int(np.ceil(np.log(max(1e-9, 1.0 - scfg.sim3_prob))
                                 / np.log(1.0 - eps ** 3)))
            n_samp = max(32, min(n_samp, scfg.sim3_max_iters))
            n_samp = 1 << (n_samp - 1).bit_length()
            res = sim3_solver.sim3_ransac(
                sub, X1, X2,
                st.kf_xy[kf], st.kf_xy[cand][jnp.asarray(idx2)],
                me1, me2, jnp.asarray(pv), K,
                n_samples=n_samp,
                min_inliers=self.cfg.loop.min_sim3_inliers)
            if not bool(res.ok):
                continue
            # GN refinement with bidirectional reprojection edges
            # (Optimizer::OptimizeSim3, LoopClosing.cc:328)
            isig1 = 1.0 / jnp.maximum(me1 / 9.21, 1e-9)
            isig2 = 1.0 / jnp.maximum(me2 / 9.21, 1e-9)
            # same accuracy contract as BA (BA_PRECISION_r05.json): the
            # TPU default bf16 matmul passes degrade GN convergence
            with jax.default_matmul_precision(
                    self.cfg.solver.ba_matmul_precision):
                ref = sim3_opt.optimize_sim3(
                    res.s, res.R, res.t, X1, X2,
                    st.kf_xy[kf], st.kf_xy[cand][jnp.asarray(idx2)],
                    isig1, isig2, res.inliers, K,
                    chi2_th=self.cfg.solver.sim3_chi2,
                    iters1=self.cfg.solver.sim3_iters1,
                    iters2=self.cfg.solver.sim3_iters2)
            if int(ref.n_inliers) < self.cfg.loop.min_sim3_inliers:
                continue
            # guided projection matching through the refined Sim3
            # (SearchBySim3 / SearchByProjection via Scw,
            # LoopClosing.cc:324,379; ORBmatcher.cc:286,1267): the final
            # accept requires enough TOTAL matches, not just RANSAC inliers
            n_total = self._count_guided_matches(
                smap, kf, cand, (ref.s, ref.R, ref.t))
            if n_total >= self.cfg.loop.min_total_matches:
                return cand, (ref.s, ref.R, ref.t)
        return None

    def _count_guided_matches(self, smap, kf: int, cand: int, g12) -> int:
        """Project the loop candidate's neighborhood landmarks through g12
        into the current keyframe and count descriptor-consistent matches."""
        st = smap.state
        P = self.cfg.map.max_points
        s, R, t = g12
        w2 = self._covis_np(smap)[cand]
        group = [cand] + [int(k) for k in np.argsort(-w2)[:5] if w2[k] > 0]
        obs_g = smap.obs_np[group]
        pid = np.unique(obs_g[obs_g >= 0])
        if len(pid) == 0:
            return 0
        cap = self.cfg.map.local_ba_max_points
        pid = pid[:cap]
        pad = cap - len(pid)
        sel = jnp.asarray(np.concatenate([pid, np.zeros(pad, np.int64)]))
        pvalid = jnp.asarray(np.concatenate(
            [np.ones(len(pid), bool), np.zeros(pad, bool)])) & st.mp_valid[sel]

        # landmark -> current-KF camera frame through the corrected Sim3
        Xw = st.mp_pos[sel]
        Xc = sim3.transform(s, R, t, se3.transform(st.kf_R[cand],
                                                   st.kf_t[cand], Xw))
        z = Xc[:, 2]
        Kc = self.cfg.camera.K
        uv = jnp.stack([Xc[:, 0] / jnp.maximum(z, 1e-6) * Kc[0, 0] + Kc[0, 2],
                        Xc[:, 1] / jnp.maximum(z, 1e-6) * Kc[1, 1] + Kc[1, 2]],
                       axis=1)
        ok = pvalid & (z > 0) \
            & (uv[:, 0] >= self.cam.min_x) & (uv[:, 0] < self.cam.max_x) \
            & (uv[:, 1] >= self.cam.min_y) & (uv[:, 1] < self.cam.max_y)

        dist = m.hamming_matrix(st.mp_desc[sel], st.kf_desc[kf])
        mask = m.window_mask(uv, st.kf_xy[kf], 12.0) \
            & m.valid_mask(ok, st.kf_kp_valid[kf])
        mm = m.match_nn(m.apply_masks(dist, mask),
                        max_dist=self.cfg.matcher.th_low)
        mm = m.resolve_duplicates(mm, st.kf_desc[kf].shape[0])
        return int(jnp.sum(mm.valid))

    # ------------------------------------------------------------------
    def _correct(self, smap: mapstore.SlamMap, kf: int, loop_kf: int, g12):
        """CorrectLoop in the reference's order (LoopClosing.cc:408-570):

        1. propagate the corrected Sim3 to the current covisibility group
           and correct the group's landmarks (:425-479, CorrectedSim3 /
           NonCorrectedSim3 maps);
        2. SearchAndFuse the loop-side landmarks into the corrected group
           (:505-527) and collect the NEW covisibility links the fusion
           created — the LoopConnections (:529-546);
        3. essential-graph optimization seeded with the corrected poses,
           edges measured from the pre-correction estimates (:548), then
           re-map every landmark through its (possibly propagated)
           reference pose (Optimizer.cc:746-779).
        """
        st = smap.state
        n_kf = smap.n_kf
        P = self.cfg.map.max_points

        # pre-correction snapshot (NonCorrectedSim3; s=1 embeddings of SE3)
        s_snap = np.ones(n_kf, np.float32)
        R_snap = np.asarray(st.kf_R[:n_kf])
        t_snap = np.asarray(st.kf_t[:n_kf])
        covis = self._covis_np(smap)[:n_kf, :n_kf]

        # ---- 1. propagation to the current group --------------------------
        gs, gR, gt = g12
        # S_kf_corrected = g12 o S_loop  (mg2oScw = gScm * Smw)
        s_kfc, R_kfc, t_kfc = sim3.compose(
            gs, gR, gt, jnp.float32(1.0),
            jnp.asarray(R_snap[loop_kf]), jnp.asarray(t_snap[loop_kf]))
        group = [kf] + [int(g) for g in np.where(covis[kf] > 0)[0]
                        if g != kf]
        s_corr = np.ones(n_kf, np.float32)
        R_corr = R_snap.copy()
        t_corr = t_snap.copy()
        for i in group:
            if i == kf:
                si, Ri, ti = s_kfc, R_kfc, t_kfc
            else:
                # CorrectedSiw = (Siw o Swk) o S_kf_corrected
                inv = sim3.inverse(jnp.float32(1.0),
                                   jnp.asarray(R_snap[kf]),
                                   jnp.asarray(t_snap[kf]))
                sik, Rik, tik = sim3.compose(
                    jnp.float32(1.0), jnp.asarray(R_snap[i]),
                    jnp.asarray(t_snap[i]), *inv)
                si, Ri, ti = sim3.compose(sik, Rik, tik, s_kfc, R_kfc, t_kfc)
            s_corr[i] = float(si)
            R_corr[i] = np.asarray(Ri)
            t_corr[i] = np.asarray(ti)

        # each group-observed landmark is corrected once, by its first
        # observing group member (mnCorrectedByKF, LoopClosing.cc:443-461)
        corrected_by = np.full(self.cfg.map.max_points, -1, np.int32)
        obs = smap.obs_np
        for i in group:
            pid = obs[i]
            pid = pid[pid >= 0]
            fresh = pid[corrected_by[pid] < 0]
            corrected_by[fresh] = i
        touched = corrected_by >= 0
        ref_prop = jnp.asarray(np.where(touched, corrected_by, 0))
        prop_pos = pose_graph.correct_points(
            st.mp_pos, ref_prop,
            jnp.asarray(s_snap), jnp.asarray(R_snap), jnp.asarray(t_snap),
            jnp.asarray(s_corr), jnp.asarray(R_corr), jnp.asarray(t_corr))
        mask = jnp.asarray(touched) & st.mp_valid
        new_pos = jnp.where(mask[:, None], prop_pos, st.mp_pos)

        # write the propagated poses (scale folded: Tiw = [R, t/s],
        # LoopClosing.cc:470-477) so the fusion projects with them
        R_se3, t_se3 = sim3.to_se3(
            jnp.asarray(s_corr), jnp.asarray(R_corr), jnp.asarray(t_corr))
        smap.state = st._replace(
            kf_R=st.kf_R.at[:n_kf].set(se3.orthonormalize(R_se3)),
            kf_t=st.kf_t.at[:n_kf].set(t_se3),
            mp_pos=new_pos,
        )
        # loop-rate whole-map write: re-fetch the pose/position mirrors
        smap.refresh_host("kf_R", "kf_t", "mp_pos")

        # ---- 2. fuse across the loop, then collect LoopConnections --------
        self._search_and_fuse(smap, kf, loop_kf)
        st = smap.state
        covis_after = self._covis_np(smap)[:n_kf, :n_kf]
        strong_th = self.cfg.loop.covisibility_weight_strong
        loop_pairs = set()
        group_set = set(group)
        for i in group:
            before = set(np.where(covis[i] > 0)[0].tolist())
            now = np.where(covis_after[i] >= strong_th)[0]
            for j in now:
                j = int(j)
                if j != i and j not in group_set and j not in before:
                    loop_pairs.add((i, j))

        # ---- 3. essential graph -------------------------------------------
        # vertices seeded with the propagated Sim3 (scale kept) for the
        # group, the snapshot pose elsewhere (Optimizer.cc:567-597)
        s_all = jnp.asarray(s_corr)
        R_all = jnp.asarray(R_corr)
        t_all = jnp.asarray(t_corr)

        # graph edges (spanning tree + strong covisibility + old loop
        # edges) measured from the PRE-correction snapshot
        pairs = set()
        for k in range(1, n_kf):
            p = int(smap.parent[k])
            if p >= 0:
                pairs.add((min(k, p), max(k, p)))
        strong = np.argwhere(covis >= strong_th)
        for a, b in strong:
            if a < b:
                pairs.add((int(a), int(b)))
        for a, b in smap.loop_edges:
            pairs.add((min(a, b), max(a, b)))

        def rel(a, b, s, R, t):
            # Shat_ab = S_a o S_b^-1
            inv = sim3.inverse(s[b], jnp.asarray(R[b]), jnp.asarray(t[b]))
            return sim3.compose(s[a], jnp.asarray(R[a]), jnp.asarray(t[a]),
                                *inv)

        ei, ej, sm, Rm, tm = [], [], [], [], []
        s_snap_j = jnp.asarray(s_snap)
        for a, b in sorted(pairs):
            meas = rel(a, b, s_snap_j, R_snap, t_snap)
            ei.append(a); ej.append(b)
            sm.append(meas[0]); Rm.append(meas[1]); tm.append(meas[2])
        # LoopConnections measured from the CORRECTED poses
        # (Optimizer.cc:604-631 uses vScw, i.e. CorrectedSim3 for the group)
        for a, b in sorted(loop_pairs):
            meas = rel(a, b, s_all, np.asarray(R_all), np.asarray(t_all))
            ei.append(a); ej.append(b)
            sm.append(meas[0]); Rm.append(meas[1]); tm.append(meas[2])
        # the new loop edge: S_kf_corrected o S_loop^-1 = g12
        ei.append(kf); ej.append(loop_kf)
        sm.append(jnp.asarray(gs)); Rm.append(jnp.asarray(gR))
        tm.append(jnp.asarray(gt))

        edges = pose_graph.Sim3Edges(
            i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
            s_meas=jnp.stack(sm), R_meas=jnp.stack(Rm), t_meas=jnp.stack(tm),
            valid=jnp.ones(len(ei), bool),
        )
        fixed = jnp.asarray(np.arange(n_kf) == loop_kf)
        n_shards = self.cfg.mesh.model_parallel
        # accuracy contract shared with BA (BA_PRECISION_r05.json): trace
        # the graph GN under the configured f32 matmul precision — the
        # reference solves this in g2o's f64 (Optimizer.cc:540-789)
        with jax.default_matmul_precision(
                self.cfg.solver.ba_matmul_precision):
            if n_shards > 1 and len(jax.devices()) >= n_shards:
                # keyframe-block-sharded edges + psum'd reduced system
                # (parallel/dist_pose_graph.py, BASELINE config 5)
                from ..parallel import dist_pose_graph
                s_new, R_new, t_new, _ = \
                    dist_pose_graph.optimize_essential_graph_dist(
                        s_all, R_all, t_all, fixed, edges,
                        n_iters=self.cfg.solver.essential_graph_iters,
                        n_shards=n_shards, axis=self.cfg.mesh.model_axis)
            else:
                s_new, R_new, t_new, _ = pose_graph.optimize_essential_graph(
                    s_all, R_all, t_all, fixed, edges,
                    n_iters=self.cfg.solver.essential_graph_iters)

        # re-map landmarks through their reference keyframes: points the
        # propagation corrected use their correcting member's PROPAGATED
        # pose as "old" (mnCorrectedReference, Optimizer.cc:752-767), the
        # rest their reference keyframe's snapshot pose
        ref_kf_pt = np.asarray(jnp.clip(st.mp_ref_kf, 0, n_kf - 1))
        ref = jnp.asarray(np.where(touched, corrected_by, ref_kf_pt))
        s_old = jnp.where(jnp.asarray(touched),
                          jnp.asarray(s_corr)[ref], s_snap_j[ref])
        R_old = jnp.where(jnp.asarray(touched)[:, None, None],
                          jnp.asarray(R_corr)[ref], jnp.asarray(R_snap)[ref])
        t_old = jnp.where(jnp.asarray(touched)[:, None],
                          jnp.asarray(t_corr)[ref], jnp.asarray(t_snap)[ref])
        Xc = sim3.transform(s_old, R_old, t_old, st.mp_pos)
        sni, Rni, tni = sim3.inverse(s_new[ref], R_new[ref], t_new[ref])
        new_pos = sim3.transform(sni, Rni, tni, Xc)
        new_pos = jnp.where(st.mp_valid[:, None], new_pos, st.mp_pos)

        R_se3, t_se3 = sim3.to_se3(s_new, R_new, t_new)
        smap.state = st._replace(
            kf_R=st.kf_R.at[:n_kf].set(se3.orthonormalize(R_se3)),
            kf_t=st.kf_t.at[:n_kf].set(t_se3),
            mp_pos=new_pos,
        )
        smap.refresh_host("kf_R", "kf_t", "mp_pos")
        smap.loop_edges.append((kf, loop_kf))

    def _search_and_fuse(self, smap: mapstore.SlamMap, kf: int, loop_kf: int):
        """SearchAndFuse (LoopClosing.cc:505-527, :572-586): after the
        correction, project the loop neighborhood's landmarks into the
        current neighborhood's keyframes and merge duplicates — the revisit
        mapped the region twice; fusing stitches the two sheets together."""
        from .local_mapper import LocalMapper
        lm = LocalMapper(cfg=self.cfg, cam=self.cam)
        st = smap.state
        # current-side keyframes: kf + covisible; loop-side landmark pool
        weights = lm._covis_row_np(smap, kf)
        cur_side = [kf] + [int(k) for k in np.argsort(-weights)[:5]
                           if weights[k] > 0]
        w2 = lm._covis_row_np(smap, loop_kf)
        loop_side = [loop_kf] + [int(k) for k in np.argsort(-w2)[:5]
                                 if w2[k] > 0]
        obs_l = smap.obs_np[loop_side]
        cand = np.unique(obs_l[obs_l >= 0])
        ctx = dict(obs=smap.obs_np.copy(),
                   mp_valid=smap.mp_valid_np.copy(),
                   changed=False)
        for tgt in cur_side:
            lm._fuse_candidates_into(smap, tgt, cand, ctx)
        if ctx["changed"]:
            smap.set_kf_obs(ctx["obs"])
            smap.set_mp_valid(ctx["mp_valid"])
