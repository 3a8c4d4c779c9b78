"""Jitted compute kernels for the per-frame tracking hot path.

Each kernel fuses a whole reference stage into one XLA program so the host
orchestrator dispatches only a handful of device calls per frame
(SURVEY.md §7 "hard parts" #3: host<->device latency).

 - match_last_frame: TrackWithMotionModel's SearchByProjection vs the last
   frame (src/ORBmatcher.cc:1507-1620) — project last frame's landmarks with
   the motion-model pose, window+level-gated Hamming matching.
 - match_local_map: TrackLocalMap's frustum filter + SearchByProjection
   (src/Frame.cc:136-197 isInFrustum, src/ORBmatcher.cc:49-125) — frustum
   check with distance band, viewing-cone and scale prediction, then gated
   matching against all local map points at once.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import CameraParams, in_image
from ..ops import match as m
from ..ops import scatter as scatter_ops


class Association(NamedTuple):
    """Per-keypoint-slot landmark association of the current frame."""

    point_idx: jnp.ndarray  # [N] int32 index into the supplied point table
    pos: jnp.ndarray        # [N, 3] world position of the associated point
    valid: jnp.ndarray      # [N] bool


@partial(jax.jit, static_argnames=("scale_factor", "ratio", "histo_length",
                                   "check_orientation"))
def match_last_frame(
    cur_xy, cur_desc, cur_level, cur_angle, cur_valid,
    last_pos, last_desc, last_level, last_angle, last_pt_valid,
    R_pred, t_pred, cam: CameraParams,
    radius: float = 15.0, max_dist: int = 100, scale_factor: float = 1.2,
    ratio: float = 1.0, histo_length: int = 30,
    check_orientation: bool = True,
) -> Association:
    """Rows = last frame's landmark-bearing slots, cols = current keypoints."""
    xc = se3.transform(R_pred, t_pred, last_pos)
    z = xc[:, 2]
    uv = jnp.stack(
        [xc[:, 0] / jnp.maximum(z, 1e-6) * cam.fx + cam.cx,
         xc[:, 1] / jnp.maximum(z, 1e-6) * cam.fy + cam.cy], axis=1)
    proj_ok = last_pt_valid & (z > 0) & in_image(uv, cam)

    dist = m.hamming_matrix(last_desc, cur_desc)
    r = radius * scale_factor ** last_level.astype(jnp.float32)
    mask = (
        m.window_mask(uv, cur_xy, r)
        & m.level_mask(last_level, cur_level, lo=1, hi=1)
        & m.valid_mask(proj_ok, cur_valid)
    )
    gated = m.apply_masks(dist, mask)
    mm = m.match_nn(gated, max_dist=max_dist, ratio=ratio)
    mm = m.Matches(idx=mm.idx, dist=mm.dist, valid=mm.valid)
    if check_orientation:   # mbCheckOrientation (ORBmatcher.cc ctor)
        keep = m.rotation_consistency(last_angle, cur_angle, mm,
                                      histo_length=histo_length)
        mm = m.Matches(idx=jnp.where(keep, mm.idx, -1), dist=mm.dist,
                       valid=keep)
    mm = m.resolve_duplicates(mm, cur_xy.shape[0])

    # invert: per current slot -> source last-slot landmark (1:1 after
    # duplicate resolution; add-scatter formulation, see ops/scatter.py)
    inv = scatter_ops.invert_matches(mm.idx, mm.valid, cur_xy.shape[0])
    avalid = inv >= 0
    src = jnp.clip(inv, 0, None)
    return Association(
        point_idx=src,
        pos=last_pos[src],
        valid=avalid,
    )


@partial(jax.jit, static_argnames=("scale_factor", "n_levels", "ratio",
                                   "radius_tight", "radius_wide"))
def match_local_map(
    cur_xy, cur_desc, cur_level, cur_angle, cur_valid,
    mp_pos, mp_desc, mp_normal, mp_min_dist, mp_max_dist, mp_valid,
    R, t, cam: CameraParams,
    th: float = 1.0, max_dist: int = 100, ratio: float = 0.8,
    view_cos_limit: float = 0.5, scale_factor: float = 1.2, n_levels: int = 8,
    radius_tight: float = 2.5, radius_wide: float = 4.0,
):
    """Frustum-gated projection matching of local map points (rows) against
    current keypoints (cols).  Returns (Association, n_visible).

    The search radius per point is RadiusByViewingCos (2.5 px head-on,
    4.0 px oblique, ORBmatcher.cc:127-134) x th x scale of the predicted
    level, matching SearchByProjection (ORBmatcher.cc:64-76)."""
    xc = se3.transform(R, t, mp_pos)
    z = xc[:, 2]
    uv = jnp.stack(
        [xc[:, 0] / jnp.maximum(z, 1e-6) * cam.fx + cam.cx,
         xc[:, 1] / jnp.maximum(z, 1e-6) * cam.fy + cam.cy], axis=1)

    # frustum: in image, positive depth, distance band, viewing cone
    cam_center = -jnp.einsum("ji,j->i", R, t)  # -R^T t
    rays = mp_pos - cam_center[None, :]
    d = jnp.linalg.norm(rays, axis=1)
    view_cos = jnp.sum(rays * mp_normal, axis=1) / jnp.maximum(
        d * jnp.linalg.norm(mp_normal, axis=1), 1e-9
    )
    # distance band with the reference's margins (Frame::isInFrustum checks
    # [0.8 * minDist, 1.2 * maxDist], src/Frame.cc:170-173)
    visible = (
        mp_valid & (z > 0) & in_image(uv, cam)
        & (d >= 0.8 * mp_min_dist) & (d <= 1.2 * mp_max_dist)
        & (view_cos > view_cos_limit)
    )

    # scale prediction from distance (KeyFrame::PredictScale semantics)
    ratio_d = jnp.log(jnp.maximum(mp_max_dist, 1e-9) / jnp.maximum(d, 1e-9))
    pred_level = jnp.clip(
        jnp.ceil(ratio_d / jnp.log(scale_factor)).astype(jnp.int32), 0, n_levels - 1
    )

    dist = m.hamming_matrix(mp_desc, cur_desc)
    base_r = jnp.where(view_cos > 0.998, radius_tight, radius_wide)
    r = base_r * th * scale_factor ** pred_level.astype(jnp.float32)
    # level gate [pred-1, pred] (GetFeaturesInArea call, ORBmatcher.cc:75-76)
    mask = (
        m.window_mask(uv, cur_xy, r)
        & m.level_mask(pred_level, cur_level, lo=1, hi=0)
        & m.valid_mask(visible, cur_valid)
    )
    gated = m.apply_masks(dist, mask)
    mm = m.match_nn(gated, max_dist=max_dist, ratio=ratio)
    mm = m.resolve_duplicates(mm, cur_xy.shape[0])

    inv = scatter_ops.invert_matches(mm.idx, mm.valid, cur_xy.shape[0])
    avalid = inv >= 0
    src = jnp.clip(inv, 0, None)
    assoc = Association(point_idx=src, pos=mp_pos[src], valid=avalid)
    return assoc, visible


@partial(jax.jit, static_argnames=("scale_factor", "n_levels", "solver_cfg",
                                   "min_track_inliers", "matcher_cfg"))
def tracking_megastep(
    cur_xy, cur_desc, cur_level, cur_angle, cur_valid, cur_inv_sigma2,
    last_pos, last_desc, last_level, last_angle, last_pt_valid,
    mp_pos, mp_desc, mp_normal, mp_min_dist, mp_max_dist, mp_valid,
    R_pred, t_pred, cam: CameraParams, solver_cfg,
    min_track_inliers: int = 10,
    prev_localmap_matches=0,
    scale_factor: float = 1.2, n_levels: int = 8,
    matcher_cfg=None,
):
    """The whole per-frame hot path as ONE program (SURVEY.md §7 hard part 3:
    host<->device round trips): frame-to-frame projection matching with
    wide-window fallback, motion-only pose LM, frustum-gated local-map
    matching with fallback, final pose LM.

    Returns (R, t, assoc: Association into the local-map table,
    inliers [N] bool, stats dict of scalars).
    """
    from ..config import MatcherConfig
    from ..solvers import pose_opt as po

    mcfg = matcher_cfg if matcher_cfg is not None else MatcherConfig()

    # --- frame-to-frame with traced wide-window fallback ------------------
    # narrow = SearchByProjection(cur, last, 15) (Tracking.cc:584); wide =
    # the last-opportunity th=50 pass (Tracking.cc:548), with the tracking
    # matcher's 0.9 ratio test for safety at that window size
    def f2f(radius, ratio):
        return match_last_frame(
            cur_xy, cur_desc, cur_level, cur_angle, cur_valid,
            last_pos, last_desc, last_level, last_angle, last_pt_valid,
            R_pred, t_pred, cam, radius=radius, max_dist=mcfg.th_high,
            scale_factor=scale_factor, ratio=ratio,
            histo_length=mcfg.histo_length,
            check_orientation=mcfg.check_orientation)

    a_narrow = f2f(jnp.float32(mcfg.radius_f2f), 1.0)
    n_narrow = jnp.sum(a_narrow.valid)
    # fallback executes only when taken (lax.cond, not where-blend)
    assoc1 = jax.lax.cond(
        n_narrow < 2 * min_track_inliers,
        lambda _: f2f(jnp.float32(mcfg.radius_f2f_fallback),
                      mcfg.nn_ratio_tracking),
        lambda _: a_narrow,
        operand=None)
    n_f2f = jnp.sum(assoc1.valid)

    r1 = po.optimize_pose(R_pred, t_pred, assoc1.pos, cur_xy, cur_inv_sigma2,
                          assoc1.valid, cam, solver_cfg)
    ok1 = r1.n_inliers >= min_track_inliers
    R_cur = jnp.where(ok1, r1.R, R_pred)
    t_cur = jnp.where(ok1, r1.t, t_pred)

    # --- local map with traced fallback -----------------------------------
    # narrow = th 1 (Tracking.cc:737); wide = the coarse th used after
    # relocalisation (Tracking.cc:739-740), triggered here when the narrow
    # pass under-yields
    def lmm(th):
        return match_local_map(
            cur_xy, cur_desc, cur_level, cur_angle, cur_valid,
            mp_pos, mp_desc, mp_normal, mp_min_dist, mp_max_dist, mp_valid,
            R_cur, t_cur, cam, th=th,
            max_dist=mcfg.th_high, ratio=mcfg.nn_ratio_localmap,
            scale_factor=scale_factor, n_levels=n_levels,
            radius_tight=mcfg.radius_view_cos_tight,
            radius_wide=mcfg.radius_view_cos_wide)

    a2n, vis_n = lmm(jnp.float32(mcfg.localmap_th))
    n2n = jnp.sum(a2n.valid)
    need_wide = n2n < jnp.maximum(
        jnp.int32(min_track_inliers * 6),
        jnp.asarray(0.6 * prev_localmap_matches, jnp.float32).astype(jnp.int32))
    assoc2, visible = jax.lax.cond(
        need_wide,
        lambda _: lmm(jnp.float32(mcfg.localmap_th_coarse)),
        lambda _: (a2n, vis_n),
        operand=None)

    r2 = po.optimize_pose(R_cur, t_cur, assoc2.pos, cur_xy, cur_inv_sigma2,
                          assoc2.valid, cam, solver_cfg)
    R_fin = se3.orthonormalize(r2.R)
    stats = {
        "f2f_matches": n_f2f,
        "localmap_matches": jnp.sum(assoc2.valid),
        "n_visible": jnp.sum(visible),
        "n_inliers": r2.n_inliers,
    }
    return R_fin, r2.t, assoc2, r2.inliers, visible, stats


@partial(jax.jit, static_argnames=("max_dist", "ratio", "histo_length",
                                   "check_orientation"))
def init_window_match(
    xy1, desc1, level1, angle1, valid1,
    xy2, desc2, level2, angle2, valid2,
    radius: float = 100.0, max_dist: int = 50, ratio: float = 0.9,
    histo_length: int = 30, check_orientation: bool = True,
):
    """SearchForInitialization (src/ORBmatcher.cc:598-713): window search at
    level 0, mutual best, ratio test, rotation consistency.  Returns Matches
    rows=frame1."""
    dist = m.hamming_matrix(desc1, desc2)
    mask = (
        m.window_mask(xy1, xy2, radius)
        & m.valid_mask(valid1 & (level1 == 0), valid2 & (level2 == 0))
    )
    gated = m.apply_masks(dist, mask)
    mm = m.match_nn(gated, max_dist=max_dist, ratio=ratio, mutual=True)
    if check_orientation:
        keep = m.rotation_consistency(angle1, angle2, mm,
                                      histo_length=histo_length)
        mm = m.Matches(idx=jnp.where(keep, mm.idx, -1), dist=mm.dist,
                       valid=keep)
    return m.resolve_duplicates(mm, xy2.shape[0])
