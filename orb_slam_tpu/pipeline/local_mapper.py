"""Keyframe-rate map building: the LocalMapping stage as host orchestration
of batched kernels (replaces src/LocalMapping.cc's thread loop).

Per new keyframe (process_keyframe):
  1. refresh derived point statistics (normals, scale bands),
  2. triangulate new landmarks against the top covisible neighbors
     (CreateNewMapPoints, src/LocalMapping.cc:220-386),
  3. local bundle adjustment over the covisible window with fixed boundary
     keyframes (Optimizer::LocalBundleAdjustment, src/Optimizer.cc:287-536),
  4. landmark culling (MapPointCulling, src/LocalMapping.cc:190-218).

All problems are padded to the static capacities in MapConfig so each kernel
compiles exactly once.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geometry import camera as cam_mod
from ..mapping import mapstore
from ..solvers import bundle_adjust as ba
from .. import native
from . import mapping_kernels as mk


@dataclass
class LocalMapper:
    cfg: SystemConfig
    cam: cam_mod.CameraParams
    last_culled_kfs: list = None

    # ------------------------------------------------------------------
    def process_keyframe(self, smap: mapstore.SlamMap, kf: int) -> dict:
        """Reference stage order (LocalMapping::Run, src/LocalMapping.cc:46-119):
        process -> cull points -> triangulate -> fuse neighbors -> local BA."""
        metrics = {}
        self.refresh_point_stats(smap)
        metrics["culled_points"] = self.cull_points(smap, kf)
        metrics["new_points"] = self.triangulate_new_points(smap, kf)
        self.refresh_point_stats(smap)
        metrics["fused"] = self.fuse_neighbors(smap, kf)
        self.refresh_point_stats(smap)
        self.update_descriptors(smap, kf)
        self.local_ba(smap, kf)
        metrics["culled_kfs"] = self.cull_keyframes(smap, kf)
        return metrics

    # ------------------------------------------------------------------
    def update_descriptors(self, smap: mapstore.SlamMap, kf: int,
                           max_obs: int = 8, cap: int = 2048):
        """Refresh representative descriptors of the landmarks around kf:
        min-median-Hamming medoid over each point's observations
        (MapPoint::ComputeDistinctiveDescriptors)."""
        st = smap.state
        obs_kf = np.asarray(st.kf_obs[kf])
        pids = np.unique(obs_kf[obs_kf >= 0])[:cap]
        if len(pids) == 0:
            return
        # host gather of per-point observation descriptor sets
        K, N = st.kf_obs.shape
        all_obs = np.asarray(st.kf_obs)
        flat = all_obs.reshape(-1)
        order = np.argsort(flat, kind="stable")
        sorted_pid = flat[order]
        lo = np.searchsorted(sorted_pid, pids, side="left")
        hi = np.searchsorted(sorted_pid, pids, side="right")

        all_desc = np.asarray(st.kf_desc).reshape(K * N, 8)
        Pl = len(pids)
        sets = np.zeros((cap, max_obs, 8), np.uint32)
        valid = np.zeros((cap, max_obs), bool)
        for i in range(Pl):
            idx = order[lo[i]:hi[i]][:max_obs]
            sets[i, : len(idx)] = all_desc[idx]
            valid[i, : len(idx)] = True

        best, has = mk.medoid_descriptors(jnp.asarray(sets), jnp.asarray(valid))
        from ..ops import scatter as scatter_ops
        sel = jnp.asarray(np.concatenate(
            [pids, np.zeros(cap - Pl, np.int64)]))
        active = jnp.asarray(np.concatenate(
            [np.ones(Pl, bool), np.zeros(cap - Pl, bool)])) & has
        smap.state = st._replace(
            mp_desc=scatter_ops.scatter_set_rows(
                st.mp_desc, sel, best, active=active))

    # ------------------------------------------------------------------
    def refresh_point_stats(self, smap: mapstore.SlamMap):
        st = smap.state
        normal, min_d, max_d = mk.point_stats(
            st.kf_obs, st.kf_R, st.kf_t, st.kf_level, st.kf_valid,
            st.mp_pos, st.mp_valid, st.mp_ref_kf,
            n_levels=self.cfg.extractor.n_levels,
            scale_factor=self.cfg.extractor.scale_factor,
        )
        smap.state = st._replace(
            mp_normal=normal, mp_min_dist=min_d, mp_max_dist=max_d
        )

    # ------------------------------------------------------------------
    def triangulate_new_points(self, smap: mapstore.SlamMap, kf: int,
                               max_neighbors: int | None = None) -> int:
        if max_neighbors is None:
            # 20 covisible KFs searched (src/LocalMapping.cc:227)
            max_neighbors = self.cfg.local_mapping.triangulation_neighbor_kfs
        st = smap.state
        P = self.cfg.map.max_points
        weights = np.asarray(
            mapstore.covisibility_row(st, kf, P)
        )
        order = np.argsort(-weights)
        neighbors = [int(k) for k in order[:max_neighbors] if weights[k] > 0]
        if not neighbors:
            # bootstrap: use the parent (initial two keyframes)
            p = int(smap.parent[kf])
            if p >= 0:
                neighbors = [p]
        K = jnp.asarray(self.cfg.camera.K)

        scale2 = self.cfg.extractor.sigma2
        lv1 = np.asarray(st.kf_level[kf])
        s2_1 = jnp.asarray(scale2[np.clip(lv1, 0, len(scale2) - 1)])
        n_added = 0

        # baseline gate: reject neighbors with baseline/median-depth < 0.01
        # (src/LocalMapping.cc:255-266)
        c_kf = -np.asarray(st.kf_R[kf]).T @ np.asarray(st.kf_t[kf])
        med_depth = self._median_depth(smap, kf)

        for nb in neighbors:
            c_nb = -np.asarray(st.kf_R[nb]).T @ np.asarray(st.kf_t[nb])
            baseline = np.linalg.norm(c_kf - c_nb)
            if med_depth > 0 and baseline / med_depth < \
                    self.cfg.local_mapping.min_baseline_depth_ratio:
                continue
            st = smap.state  # re-read (obs updated each iteration)
            free1 = np.asarray(st.kf_kp_valid[kf]) & (np.asarray(st.kf_obs[kf]) < 0)
            free2 = np.asarray(st.kf_kp_valid[nb]) & (np.asarray(st.kf_obs[nb]) < 0)
            lv2 = np.asarray(st.kf_level[nb])
            s2_2 = jnp.asarray(scale2[np.clip(lv2, 0, len(scale2) - 1)])
            res = mk.triangulate_between(
                st.kf_xy[kf], st.kf_desc[kf], st.kf_level[kf], st.kf_angle[kf],
                jnp.asarray(free1),
                st.kf_xy[nb], st.kf_desc[nb], st.kf_level[nb], st.kf_angle[nb],
                jnp.asarray(free2),
                st.kf_R[kf], st.kf_t[kf], st.kf_R[nb], st.kf_t[nb],
                s2_1, s2_2, K, self.cam,
                max_dist=self.cfg.matcher.th_low,
                epipolar_chi2=self.cfg.local_mapping.epipolar_chi2,
                reproj_chi2=self.cfg.local_mapping.reproj_chi2,
                scale_factor=self.cfg.extractor.scale_factor,
            )
            ok = np.asarray(res.ok)
            if not ok.any():
                continue
            if smap.n_mp + int(ok.sum()) > self.cfg.map.max_points:
                ok = ok & (np.cumsum(ok) <= self.cfg.map.max_points - smap.n_mp)
            ids = smap.add_points(
                res.X, st.kf_desc[kf], jnp.zeros_like(res.X),
                jnp.zeros(ok.shape[0]), jnp.full(ok.shape[0], np.inf),
                kf, ok,
            )
            slots1 = np.where(ok)[0]
            slots2 = np.asarray(res.slot2)[slots1]
            smap.set_observations(kf, jnp.asarray(slots1), jnp.asarray(ids[slots1]))
            smap.set_observations(nb, jnp.asarray(slots2), jnp.asarray(ids[slots1]))
            n_added += int(ok.sum())
        return n_added

    def fuse_neighbors(self, smap: mapstore.SlamMap, kf: int,
                       max_neighbors: int | None = None) -> int:
        """SearchInNeighbors (src/LocalMapping.cc:388-465): project neighbor
        keyframes' landmarks into the new keyframe and vice versa; add the
        missing observations and merge duplicate landmarks.

        This is the step that re-attaches landmarks whose tracking residuals
        were gated out (their depth is stale) so local BA gains the edges it
        needs to repair them — without it bad points are frozen forever.
        """
        st = smap.state
        P = self.cfg.map.max_points
        lcfg = self.cfg.local_mapping
        if max_neighbors is None:
            max_neighbors = lcfg.fuse_neighbor_kfs
        weights = np.asarray(mapstore.covisibility_row(st, kf, P))
        order = np.argsort(-weights)
        neighbors = [int(k) for k in order[:max_neighbors] if weights[k] > 0]
        # extend with second neighbors (src/LocalMapping.cc:402-409)
        seen = set(neighbors) | {kf}
        for nb in list(neighbors):
            w2 = np.asarray(mapstore.covisibility_row(smap.state, nb, P))
            order2 = np.argsort(-w2)
            for k2 in order2[: lcfg.fuse_second_neighbor_kfs]:
                k2 = int(k2)
                if w2[k2] > 0 and k2 not in seen:
                    neighbors.append(k2)
                    seen.add(k2)
        if not neighbors:
            return 0
        n_fused = 0
        fuse_points_into = lambda tgt, cand: self._fuse_candidates_into(
            smap, tgt, cand)

        # neighbors' landmarks -> new keyframe
        st = smap.state
        obs_nb = np.asarray(st.kf_obs)[neighbors]
        cand = np.unique(obs_nb[obs_nb >= 0])
        own = set(np.asarray(st.kf_obs[kf])[np.asarray(st.kf_obs[kf]) >= 0].tolist())
        cand = np.asarray([c for c in cand if c not in own], np.int64)
        n_fused += fuse_points_into(kf, cand)

        # new keyframe's landmarks -> each neighbor
        for nb in neighbors:
            st = smap.state
            own_kf = np.asarray(st.kf_obs[kf])
            own_ids = np.unique(own_kf[own_kf >= 0])
            nb_obs = np.asarray(st.kf_obs[nb])
            nb_own = set(nb_obs[nb_obs >= 0].tolist())
            cand = np.asarray([c for c in own_ids if c not in nb_own], np.int64)
            n_fused += fuse_points_into(nb, cand)
        return n_fused

    def _fuse_candidates_into(self, smap: mapstore.SlamMap, target_kf: int,
                              cand_ids: np.ndarray) -> int:
        """Project candidate landmarks into target_kf, add missing
        observations, merge duplicates (ORBmatcher::Fuse + MapPoint::Replace
        host side)."""
        if len(cand_ids) == 0:
            return 0
        st = smap.state
        P = self.cfg.map.max_points
        scale2 = self.cfg.extractor.sigma2
        cap = self.cfg.map.local_ba_max_points
        cand_ids = cand_ids[:cap]
        pad = cap - len(cand_ids)
        sel = jnp.asarray(np.concatenate([cand_ids, np.zeros(pad, np.int64)]))
        cvalid = jnp.asarray(
            np.concatenate([np.ones(len(cand_ids), bool), np.zeros(pad, bool)]))
        lv = np.asarray(st.kf_level[target_kf])
        s2 = jnp.asarray(scale2[np.clip(lv, 0, len(scale2) - 1)])
        slot, ok = mk.fuse_into_keyframe(
            st.kf_xy[target_kf], st.kf_desc[target_kf],
            st.kf_level[target_kf], st.kf_kp_valid[target_kf],
            st.kf_obs[target_kf],
            st.kf_R[target_kf], st.kf_t[target_kf],
            st.mp_pos[sel], st.mp_desc[sel],
            st.mp_valid[sel] & cvalid, sel,
            s2, self.cam,
            radius=3.0, max_dist=self.cfg.matcher.th_low,
        )
        slot = np.asarray(slot)
        ok = np.asarray(ok)
        obs_t = np.array(st.kf_obs[target_kf])  # writable copy
        obs_counts = np.asarray(mapstore.point_observation_counts(st))
        kf_obs_all = st.kf_obs
        mp_valid = st.mp_valid
        fused = 0
        replace_map = {}
        for ci in np.where(ok)[0]:
            pid = int(cand_ids[ci]) if ci < len(cand_ids) else -1
            if pid < 0 or not bool(np.asarray(mp_valid)[pid]):
                continue
            s_ = int(slot[ci])
            cur = int(obs_t[s_])
            if cur == pid:
                continue
            if cur < 0:
                kf_obs_all = kf_obs_all.at[target_kf, s_].set(pid)
                obs_t[s_] = pid
                fused += 1
            else:
                # duplicate landmarks: keep the better-observed one
                # (MapPoint::Replace semantics, src/MapPoint.cc:124-158)
                keep, drop = (cur, pid) if obs_counts[cur] >= obs_counts[pid] \
                    else (pid, cur)
                replace_map[drop] = keep
                fused += 1
        if replace_map:
            drops = np.fromiter(replace_map.keys(), np.int64)
            keeps = np.fromiter((replace_map[d] for d in drops), np.int64)
            lut = np.arange(P + 1, dtype=np.int32)
            lut[drops] = keeps.astype(np.int32)
            # native merge-remap with per-keyframe dedup (explicit copy:
            # jax buffers are read-only)
            obs_np = np.array(np.asarray(kf_obs_all), np.int32, copy=True)
            native.remap_observations(obs_np, lut)
            kf_obs_all = jnp.asarray(obs_np)
            mp_valid = mp_valid.at[jnp.asarray(drops)].set(False)
        smap.state = smap.state._replace(kf_obs=kf_obs_all, mp_valid=mp_valid)
        return fused

    def _median_depth(self, smap, kf) -> float:
        """ComputeSceneMedianDepth (src/KeyFrame.cc:659-689)."""
        st = smap.state
        obs = np.asarray(st.kf_obs[kf])
        pid = obs[obs >= 0]
        if len(pid) == 0:
            return -1.0
        X = np.asarray(st.mp_pos)[pid]
        R = np.asarray(st.kf_R[kf])
        t = np.asarray(st.kf_t[kf])
        z = (X @ R.T + t)[:, 2]
        return float(np.median(z)) if len(z) else -1.0

    # ------------------------------------------------------------------
    def _build_ba_problem(self, smap: mapstore.SlamMap, window, fixed_kfs,
                          point_ids):
        """Pad a (window, fixed, points) selection into the static-capacity
        BA arrays.  Returns (Rs, ts, Xs, fixed_mask, edges, bookkeeping)."""
        mc = self.cfg.map
        st = smap.state
        N = st.kf_obs.shape[1]
        K_cap = mc.local_ba_max_kfs + mc.local_ba_max_fixed
        P_cap = mc.local_ba_max_points

        window = list(window)[: mc.local_ba_max_kfs]
        fixed_kfs = list(fixed_kfs)[: mc.local_ba_max_fixed]
        cams = window + fixed_kfs
        n_cam = len(cams)

        point_ids = np.asarray(point_ids)[:P_cap]
        n_pt = len(point_ids)

        # local index lookup over global point ids; edge packing runs in the
        # native extension (the per-keyframe host hot path)
        lut = np.full(mc.max_points + 1, -1, np.int32)
        lut[point_ids] = np.arange(n_pt, dtype=np.int32)

        obs = np.asarray(st.kf_obs)[cams]          # [n_cam, N]
        kpv = np.asarray(st.kf_kp_valid)[cams]
        cam_idx, pt_idx, slot_idx, ev = native.pack_ba_edges(obs, kpv, lut)

        O_cap = K_cap * N
        pad = O_cap - len(cam_idx)
        cam_idx = np.concatenate([cam_idx, np.zeros(pad, np.int32)])
        pt_idx = np.concatenate([pt_idx, np.zeros(pad, np.int32)])
        slot_idx = np.concatenate([slot_idx, np.zeros(pad, np.int32)])
        ev = np.concatenate([ev, np.zeros(pad, bool)])

        uv = np.asarray(st.kf_xy)[cams].reshape(-1, 2)
        uv = np.concatenate([uv, np.zeros((pad, 2), np.float32)])
        lev = np.asarray(st.kf_level)[cams].reshape(-1)
        lev = np.concatenate([lev, np.zeros(pad, np.int64)])
        s2 = self.cfg.extractor.sigma2
        inv_s2 = 1.0 / s2[np.clip(lev, 0, len(s2) - 1)]

        edges = ba.BAEdges(
            cam_idx=jnp.asarray(cam_idx),
            pt_idx=jnp.asarray(pt_idx),
            uv=jnp.asarray(uv.astype(np.float32)),
            inv_sigma2=jnp.asarray(inv_s2.astype(np.float32)),
            valid=jnp.asarray(ev),
        )

        cam_pad = K_cap - n_cam
        Rs = jnp.concatenate([
            st.kf_R[jnp.asarray(cams)],
            jnp.tile(jnp.eye(3, dtype=jnp.float32), (cam_pad, 1, 1)),
        ])
        ts = jnp.concatenate([
            st.kf_t[jnp.asarray(cams)], jnp.zeros((cam_pad, 3), jnp.float32)])
        fixed_mask = np.zeros(K_cap, bool)
        fixed_mask[len(window):] = True  # fixed kfs + padding
        pt_pad = P_cap - n_pt
        Xs = jnp.concatenate([
            st.mp_pos[jnp.asarray(point_ids.astype(np.int64))]
            if n_pt else jnp.zeros((0, 3), jnp.float32),
            jnp.zeros((pt_pad, 3), jnp.float32),
        ])
        book = dict(window=window, fixed=fixed_kfs, point_ids=point_ids,
                    cams=cams, slot_idx=slot_idx, cam_idx=cam_idx, ev=ev)
        return Rs, ts, Xs, jnp.asarray(fixed_mask), edges, book

    def _write_back(self, smap: mapstore.SlamMap, res: ba.BAResult, book):
        st = smap.state
        window = book["window"]
        point_ids = book["point_ids"]
        n_pt = len(point_ids)
        kf_R = st.kf_R
        kf_t = st.kf_t
        for c, k in enumerate(window):
            kf_R = kf_R.at[k].set(res.R[c])
            kf_t = kf_t.at[k].set(res.t[c])
        mp_pos = st.mp_pos
        if n_pt:
            from ..ops import scatter as scatter_ops
            mp_pos = scatter_ops.scatter_set_rows(
                mp_pos, jnp.asarray(point_ids.astype(np.int64)),
                res.points[:n_pt])
        # erase outlier observations (Optimizer.cc:496-521); add-only flat
        # scatter (axon fast path, ops/scatter.py)
        inl = np.asarray(res.edge_inliers)
        bad = book["ev"] & ~inl
        kf_obs = st.kf_obs
        if bad.any():
            from ..ops import scatter as scatter_ops
            cams = np.asarray(book["cams"])
            bad_cam = cams[book["cam_idx"][bad]]
            bad_slot = book["slot_idx"][bad]
            K_all, N = kf_obs.shape
            flat = kf_obs.reshape(-1, 1)
            fidx = jnp.asarray(bad_cam.astype(np.int64) * N
                               + bad_slot.astype(np.int64))
            vals = jnp.full((len(bad_cam), 1), -1, kf_obs.dtype)
            kf_obs = scatter_ops.scatter_set_rows(flat, fidx, vals
                                                  ).reshape(K_all, N)
        smap.state = st._replace(kf_R=kf_R, kf_t=kf_t, mp_pos=mp_pos,
                                 kf_obs=kf_obs)

    def local_ba(self, smap: mapstore.SlamMap, center_kf: int):
        """Covisible window + its points + fixed boundary observers."""
        mc = self.cfg.map
        st = smap.state
        weights = np.asarray(
            mapstore.covisibility_row(st, center_kf, mc.max_points))
        covis = np.argsort(-weights)
        window = [center_kf] + [
            int(k) for k in covis[: mc.local_ba_max_kfs - 1] if weights[k] > 0
        ]
        # gauge: keyframe 0 is always fixed (g2o setFixed(pKF->mnId==0),
        # src/Optimizer.cc:357) — without it the window drifts freely
        if 0 in window:
            window.remove(0)
        obs_w = np.asarray(st.kf_obs)[window]
        point_ids = np.unique(obs_w[obs_w >= 0])
        mp_valid = np.asarray(st.mp_valid)
        point_ids = point_ids[mp_valid[point_ids]]

        # fixed boundary: keyframes outside the window observing those points
        lut = np.zeros(mc.max_points + 1, bool)
        lut[point_ids] = True
        all_obs = np.asarray(st.kf_obs)
        observes_local = lut[np.clip(all_obs, 0, mc.max_points)] & (all_obs >= 0)
        kf_hits = observes_local.any(axis=1)
        fixed_kfs = [
            int(k) for k in np.where(kf_hits)[0]
            if k not in window and bool(np.asarray(st.kf_valid)[k])
        ]
        if not fixed_kfs:
            fixed_kfs = [0]

        Rs, ts, Xs, fixed, edges, book = self._build_ba_problem(
            smap, window, fixed_kfs, point_ids)
        if len(window) <= 1 and not point_ids.size:
            return
        res = self._run_ba(Rs, ts, Xs, fixed, edges, two_phase=True)
        self._write_back(smap, res, book)

    def global_ba(self, smap: mapstore.SlamMap):
        """All keyframes, first fixed (GlobalBundleAdjustemnt,
        src/Optimizer.cc:38-43)."""
        st = smap.state
        window = [k for k in range(smap.n_kf)
                  if bool(np.asarray(st.kf_valid)[k])]
        if len(window) < 2:
            return
        all_obs = np.asarray(st.kf_obs)[window]
        point_ids = np.unique(all_obs[all_obs >= 0])
        # gauge: fix the first keyframe by listing it in the fixed group
        Rs, ts, Xs, fixed, edges, book = self._build_ba_problem(
            smap, window[1:], [window[0]], point_ids)
        res = self._run_ba(Rs, ts, Xs, fixed, edges, two_phase=False)
        self._write_back(smap, res, book)

    def _run_ba(self, Rs, ts, Xs, fixed, edges, two_phase: bool):
        """Dispatch BA to the distributed landmark-sharded solver when the
        mesh config requests >1 device (BASELINE configs 4-5: the system's
        BA, not a side demo), else the single-device solver."""
        n_shards = self.cfg.mesh.data_parallel
        if n_shards > 1 and len(jax.devices()) >= n_shards:
            from ..parallel import dist_ba
            return dist_ba.bundle_adjust_dist(
                Rs, ts, Xs, fixed, edges, self.cam, self.cfg.solver,
                two_phase=two_phase, n_shards=n_shards)
        return ba.bundle_adjust(Rs, ts, Xs, fixed, edges, self.cam,
                                self.cfg.solver, two_phase=two_phase)

    # ------------------------------------------------------------------
    def cull_keyframes(self, smap: mapstore.SlamMap, current_kf: int) -> int:
        """KeyFrameCulling (src/LocalMapping.cc:539-593): drop a covisible
        keyframe when >= 90% of its landmarks are observed by >= 3 other
        keyframes at the same or finer octave (scaleLevel_i <= scaleLevel+1,
        LocalMapping.cc:573-575).

        Never culls keyframe 0 (gauge anchor), the current keyframe, or
        keyframes holding loop edges (KeyFrame::SetNotErase semantics)."""
        lm_cfg = self.cfg.local_mapping
        n_levels = self.cfg.extractor.n_levels
        st = smap.state
        P = self.cfg.map.max_points
        weights = np.asarray(mapstore.covisibility_row(st, current_kf, P))
        candidates = [int(k) for k in np.where(weights > 0)[0]]
        protected = {0, current_kf}
        for a, b in (smap.loop_edges or []):
            protected |= {a, b}

        counts_le = np.asarray(
            mapstore.point_observation_counts_by_level(st, n_levels))
        self.last_culled_kfs = []
        for k in candidates:
            if k in protected or not bool(np.asarray(st.kf_valid[k])):
                continue
            obs = np.asarray(st.kf_obs[k])
            sel = obs >= 0
            pid = obs[sel]
            if len(pid) < 10:
                continue
            lvl = np.clip(np.asarray(st.kf_level[k])[sel] + 1, 0,
                          n_levels - 1)
            # own observation is at octave <= level+1, so subtract it
            redundant = counts_le[pid, lvl] - 1 >= lm_cfg.kf_culling_min_obs
            if redundant.mean() >= lm_cfg.kf_culling_redundancy:
                self._erase_keyframe(smap, k)
                counts_le = np.asarray(
                    mapstore.point_observation_counts_by_level(
                        smap.state, n_levels))
                self.last_culled_kfs.append(k)
        return len(self.last_culled_kfs)

    def _erase_keyframe(self, smap: mapstore.SlamMap, k: int):
        """Remove keyframe k: clear observations, invalidate, and greedily
        re-parent its spanning-tree children (KeyFrame.cc:519-588): repeat
        picking the (child, candidate-parent) pair with the highest
        covisibility weight, where candidates start at k's parent and grow
        by each re-parented child; children with no covisible candidate
        fall back to k's original parent."""
        # covisibility BEFORE clearing k's observations (the reference
        # computes child weights from the still-connected graph)
        P = self.cfg.map.max_points
        children = [c for c in range(smap.n_kf) if int(smap.parent[c]) == k]
        p = int(smap.parent[k])
        W = None
        if children:
            W = np.asarray(mapstore.covisibility_matrix(smap.state, P))

        st = smap.state
        N = st.kf_obs.shape[1]
        smap.state = st._replace(
            kf_valid=st.kf_valid.at[k].set(False),
            kf_obs=st.kf_obs.at[k].set(jnp.full((N,), -1, jnp.int32)),
            kf_kp_valid=st.kf_kp_valid.at[k].set(False),
        )

        candidates = {p} if p >= 0 else set()
        pending = set(children)
        while pending and candidates:
            best_w, best_c, best_p = 0, -1, -1
            for c in pending:
                for q in candidates:
                    if W[c, q] > best_w:
                        best_w, best_c, best_p = int(W[c, q]), c, q
            if best_c < 0:
                break
            smap.parent[best_c] = best_p
            candidates.add(best_c)
            pending.discard(best_c)
        for c in pending:  # no covisible candidate: original parent
            smap.parent[c] = p
        smap.parent[k] = -1

    # ------------------------------------------------------------------
    def cull_points(self, smap: mapstore.SlamMap, current_kf: int) -> int:
        """MapPointCulling (src/LocalMapping.cc:190-218): drop weak points —
        found/visible ratio < 0.25, or too few observations after a 2-KF
        grace window."""
        lm_cfg = self.cfg.local_mapping
        st = smap.state
        counts = np.asarray(mapstore.point_observation_counts(st))
        found = np.asarray(st.mp_found)
        visible = np.asarray(st.mp_visible)
        first = np.asarray(st.mp_first_kf)
        valid = np.asarray(st.mp_valid)

        # Only *recently created* points are candidates (the reference walks
        # mlpRecentAddedMapPoints, src/LocalMapping.cc:190-218; points older
        # than 3 keyframes graduate out of the culling list).
        age = current_kf - first
        recent = age <= 3
        ratio_bad = (found / np.maximum(visible, 1)) < lm_cfg.culling_min_found_ratio
        obs_bad = (age >= lm_cfg.culling_obs_window_kfs) & (
            counts <= lm_cfg.culling_min_obs)
        bad = valid & recent & (ratio_bad | obs_bad)
        if not bad.any():
            return 0
        mp_valid = jnp.asarray(valid & ~bad)
        # scrub dangling observations
        obs = st.kf_obs
        P = self.cfg.map.max_points
        dangling = jnp.asarray(bad)[jnp.clip(obs, 0, P - 1)] & (obs >= 0)
        obs = jnp.where(dangling, -1, obs)
        smap.state = st._replace(mp_valid=mp_valid, kf_obs=obs)
        return int(bad.sum())
