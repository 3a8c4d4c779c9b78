"""The ENTIRE tracked-frame hot path as ONE device program.

Fuses what the reference spreads over the Frame constructor and the Tracking
thread body (src/Frame.cc:55-127 extract+undistort, src/Tracking.cc:170-323
TrackWithMotionModel/TrackLocalMap/pose optimization) into a single jitted
XLA program:

    image -> pyramid ORB extraction (level-batched, optional Pallas fused
    FAST+NMS+blur) -> keypoint undistortion -> frame-to-frame projection
    matching (+fallback) -> pose LM -> local-map frustum matching
    (+fallback) -> pose LM -> landmark visibility/found stat scatter.

Why: on dispatch-latency-bound runtimes (the tunneled TPU; any multi-tenant
accelerator) per-frame wall clock is dominated by program count, not FLOPs
(SURVEY.md §7 hard part 3).  Round 1 dispatched ~10 programs/frame; this is
one, plus two small host fetches (a 16-float pose/stats blob and the per-slot
landmark ids the host needs for keyframe-rate bookkeeping).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..frontend.extractor_batched import extract_batched
from ..geometry.camera import CameraParams, undistort_pixels
from . import track_kernels as tk


class FrameStepOut(NamedTuple):
    # frame features (device-resident; host pulls only at keyframe rate)
    xy: jnp.ndarray          # [N, 2] raw (distorted) level-0 pixels
    xy_und: jnp.ndarray      # [N, 2] undistorted
    response: jnp.ndarray    # [N]
    angle: jnp.ndarray       # [N]
    level: jnp.ndarray       # [N] int32
    desc: jnp.ndarray        # [N, 8] uint32
    kp_valid: jnp.ndarray    # [N] bool
    inv_sigma2: jnp.ndarray  # [N]
    sigma2: jnp.ndarray      # [N]
    # tracking results
    R: jnp.ndarray           # [3, 3]
    t: jnp.ndarray           # [3]
    pid_global: jnp.ndarray  # [N] int32 global landmark id per slot (-1 none)
    next_last_pos: jnp.ndarray  # [N, 3] positions of associated landmarks
    next_last_valid: jnp.ndarray  # [N] bool (pid_global >= 0, device-side)
    inliers: jnp.ndarray     # [N] bool
    # updated landmark statistics (full-map arrays)
    mp_visible: jnp.ndarray  # [P] int32
    mp_found: jnp.ndarray    # [P] int32
    # device-chained scalars (feed the NEXT frame's dispatch without any
    # host round trip — the software-pipelining handles)
    lm_matches: jnp.ndarray  # [] int32 local-map match count
    # packed host readback (ONE fetch per frame):
    # [R(9), t(3), f2f, localmap, visible, inliers, pid_global(N)]
    host_blob: jnp.ndarray   # [16 + N] float32 (pids exact: < 2^24)


class FrameStepScanOut(NamedTuple):
    """Stacked per-frame outputs of frame_step_scan ([B, ...] leading axis
    on the feature/blob fields) plus the final chain for the next batch."""
    xy: jnp.ndarray          # [B, N, 2]
    xy_und: jnp.ndarray      # [B, N, 2]
    response: jnp.ndarray    # [B, N]
    angle: jnp.ndarray       # [B, N]
    level: jnp.ndarray       # [B, N]
    desc: jnp.ndarray        # [B, N, 8]
    kp_valid: jnp.ndarray    # [B, N]
    inv_sigma2: jnp.ndarray  # [B, N]
    sigma2: jnp.ndarray      # [B, N]
    R: jnp.ndarray           # [B, 3, 3]
    t: jnp.ndarray           # [B, 3]
    host_blob: jnp.ndarray   # [B, 16 + N] — ONE fetch per batch
    # final chain (last frame) for the next dispatch
    last_desc: jnp.ndarray        # [N, 8]
    last_level: jnp.ndarray       # [N]
    last_angle: jnp.ndarray       # [N]
    next_last_pos: jnp.ndarray    # [N, 3]
    next_last_valid: jnp.ndarray  # [N]
    R_last: jnp.ndarray
    t_last: jnp.ndarray
    R_prev: jnp.ndarray
    t_prev: jnp.ndarray
    lm_matches: jnp.ndarray
    mp_visible: jnp.ndarray  # [P]
    mp_found: jnp.ndarray    # [P]


@partial(jax.jit, static_argnames=(
    "ext_cfg", "matcher_cfg", "solver_cfg", "use_pallas",
    "min_track_inliers"))
def frame_step_scan(
    images, row_valid,
    last_desc, last_level, last_angle, last_pos, last_valid,
    mp_pos, mp_desc, mp_normal, mp_min_dist, mp_max_dist, mp_valid,
    sel,
    mp_visible, mp_found,
    R_last, t_last, R_prev, t_prev, prev_lm_matches, has_vel0,
    cam: CameraParams,
    *, ext_cfg, matcher_cfg, solver_cfg,
    use_pallas: bool = False, min_track_inliers: int = 10,
) -> FrameStepScanOut:
    """B tracked frames as ONE device program: lax.scan of the per-frame
    body (extraction + matching + pose LM + stats) over stacked images
    [B, H, W], chaining pose/feature state through the scan carry.

    Rationale: the runtime charges a fixed per-call cost once a process has
    done any device->host readback (the axon relay drops it to a ~25 ms/call
    slow path permanently).  One dispatch + one [B, 16+N] blob fetch per B
    frames amortizes that fixed cost B-fold; on bare TPU hardware the same
    structure amortizes dispatch overhead.  has_vel is a traced bool here
    (frames after the first always have velocity), unlike frame_step's
    static flag."""
    from . import track_kernels as tk

    scale2 = jnp.asarray(ext_cfg.sigma2)
    sel_valid = sel >= 0
    selc = jnp.clip(sel, 0, None)
    lpos = mp_pos[selc]
    ldesc = mp_desc[selc]
    lnorm = mp_normal[selc]
    lmin = mp_min_dist[selc]
    lmax = mp_max_dist[selc]

    def body(carry, xs):
        image, row_ok = xs
        (desc0, level0, angle0, pos0, valid0,
         R_l, t_l, R_p, t_p, lm_prev, vis, fnd, has_vel) = carry

        vel_R = R_l @ R_p.T
        vel_t = t_l - vel_R @ t_p
        R_pred = jnp.where(has_vel, vel_R @ R_l, R_l)
        t_pred = jnp.where(has_vel, vel_R @ t_l + vel_t, t_l)

        feats = extract_batched(
            image.astype(jnp.float32), ext_cfg, ext_cfg.n_features,
            ext_cfg.max_keypoints, use_pallas)
        xy_und = undistort_pixels(feats.xy, cam)
        s2 = scale2[jnp.clip(feats.level, 0, ext_cfg.n_levels - 1)]
        inv_s2 = 1.0 / s2

        lvalid = mp_valid[selc] & sel_valid
        R_fin, t_fin, assoc, inliers, visible, stats = tk.tracking_megastep(
            xy_und, feats.desc, feats.level, feats.angle, feats.valid,
            inv_s2,
            pos0, desc0, level0, angle0, valid0,
            lpos, ldesc, lnorm, lmin, lmax, lvalid,
            R_pred, t_pred, cam, solver_cfg,
            min_track_inliers=min_track_inliers,
            prev_localmap_matches=lm_prev.astype(jnp.int32),
            scale_factor=ext_cfg.scale_factor, n_levels=ext_cfg.n_levels,
            matcher_cfg=matcher_cfg)

        pid_global = jnp.where(
            assoc.valid & inliers, sel[assoc.point_idx], -1).astype(jnp.int32)
        next_pos = mp_pos[jnp.clip(pid_global, 0, None)]
        # padded rows (partial flush) must not bump landmark statistics
        vis = vis.at[selc].add(
            (visible & lvalid & row_ok).astype(jnp.int32))
        fnd = fnd.at[jnp.clip(pid_global, 0, None)].add(
            ((pid_global >= 0) & row_ok).astype(jnp.int32))

        blob = jnp.concatenate([
            R_fin.reshape(9), t_fin,
            jnp.stack([stats["f2f_matches"].astype(jnp.float32),
                       stats["localmap_matches"].astype(jnp.float32),
                       stats["n_visible"].astype(jnp.float32),
                       stats["n_inliers"].astype(jnp.float32)]),
            pid_global.astype(jnp.float32)])

        new_carry = (feats.desc, feats.level, feats.angle,
                     next_pos, pid_global >= 0,
                     R_fin, t_fin, R_l, t_l,
                     stats["localmap_matches"].astype(jnp.int32),
                     vis, fnd, jnp.bool_(True))
        per_frame = (feats.xy, xy_und, feats.response, feats.angle,
                     feats.level, feats.desc, feats.valid, inv_s2, s2,
                     R_fin, t_fin, blob)
        return new_carry, per_frame

    carry0 = (last_desc, last_level, last_angle, last_pos, last_valid,
              R_last, t_last, R_prev, t_prev,
              prev_lm_matches.astype(jnp.int32),
              mp_visible, mp_found, jnp.asarray(has_vel0))
    carry, stacked = jax.lax.scan(body, carry0, (images, row_valid))
    (xy, xy_und, response, angle, level, desc, kp_valid,
     inv_s2, s2, Rb, tb, blobs) = stacked
    return FrameStepScanOut(
        xy=xy, xy_und=xy_und, response=response, angle=angle, level=level,
        desc=desc, kp_valid=kp_valid, inv_sigma2=inv_s2, sigma2=s2,
        R=Rb, t=tb, host_blob=blobs,
        last_desc=carry[0], last_level=carry[1], last_angle=carry[2],
        next_last_pos=carry[3], next_last_valid=carry[4],
        R_last=carry[5], t_last=carry[6], R_prev=carry[7], t_prev=carry[8],
        lm_matches=carry[9], mp_visible=carry[10], mp_found=carry[11])


@jax.jit
def slice_frame(tree, b):
    """One-dispatch row slice of a stacked pytree (used at keyframe rate to
    pull one frame's features out of a batch without per-array eager ops)."""
    return jax.tree_util.tree_map(lambda x: x[b], tree)


@partial(jax.jit, static_argnames=(
    "ext_cfg", "matcher_cfg", "solver_cfg", "use_pallas",
    "min_track_inliers", "has_vel"))
def frame_step(
    image,
    last_desc, last_level, last_angle, last_pos, last_valid,
    mp_pos, mp_desc, mp_normal, mp_min_dist, mp_max_dist, mp_valid,
    sel,
    mp_visible, mp_found,
    R_last, t_last, R_prev, t_prev, prev_lm_matches,
    cam: CameraParams,
    *, ext_cfg, matcher_cfg, solver_cfg,
    use_pallas: bool = False, min_track_inliers: int = 10,
    has_vel: bool = True,
) -> FrameStepOut:
    """image: [H, W] grayscale (any numeric dtype, 0..255 range).
    sel: [cap] int32 indices of the local-map points (host-selected by
    covisibility voting; -1 = padding).  mp_* are the FULL map tables;
    gathering the local window inside the program saves dispatches.

    The motion model (Tracking.cc:130-139) runs IN-program from the last
    two poses — R_last/t_last/R_prev/t_prev and prev_lm_matches are device
    outputs of the previous frame_step, so consecutive frames chain on the
    device with zero host round trips between dispatches.  The host fetches
    frame i's host_blob AFTER dispatching frame i+1 (software pipelining:
    on dispatch-latency-bound runtimes the fetch overlaps the next frame's
    execution)."""
    if has_vel:
        vel_R = R_last @ R_prev.T
        vel_t = t_last - vel_R @ t_prev
        R_pred = vel_R @ R_last
        t_pred = vel_R @ t_last + vel_t
    else:
        R_pred, t_pred = R_last, t_last
    prev_localmap_matches = prev_lm_matches.astype(jnp.int32)

    feats = extract_batched(
        image.astype(jnp.float32), ext_cfg, ext_cfg.n_features,
        ext_cfg.max_keypoints, use_pallas)
    xy_und = undistort_pixels(feats.xy, cam)
    scale2 = jnp.asarray(ext_cfg.sigma2)
    s2 = scale2[jnp.clip(feats.level, 0, ext_cfg.n_levels - 1)]
    inv_s2 = 1.0 / s2

    # local-map window gather (UpdateReference's point set)
    sel_valid = sel >= 0
    sel = jnp.clip(sel, 0, None)
    lpos = mp_pos[sel]
    ldesc = mp_desc[sel]
    lnorm = mp_normal[sel]
    lmin = mp_min_dist[sel]
    lmax = mp_max_dist[sel]
    lvalid = mp_valid[sel] & sel_valid

    R_fin, t_fin, assoc, inliers, visible, stats = tk.tracking_megastep(
        xy_und, feats.desc, feats.level, feats.angle, feats.valid, inv_s2,
        last_pos, last_desc, last_level, last_angle, last_valid,
        lpos, ldesc, lnorm, lmin, lmax, lvalid,
        R_pred, t_pred, cam, solver_cfg,
        min_track_inliers=min_track_inliers,
        prev_localmap_matches=prev_localmap_matches,
        scale_factor=ext_cfg.scale_factor, n_levels=ext_cfg.n_levels,
        matcher_cfg=matcher_cfg)

    # global landmark id per keypoint slot (tracked inliers only — the next
    # frame's "last frame" associations, Tracking.cc outlier scrub :597-608)
    pid_global = jnp.where(
        assoc.valid & inliers, sel[assoc.point_idx], -1).astype(jnp.int32)
    next_last_pos = mp_pos[jnp.clip(pid_global, 0, None)]

    # landmark statistics (MapPoint::IncreaseVisible/IncreaseFound,
    # src/Tracking.cc:634-639,716-721) as scatter-adds
    mp_visible2 = mp_visible.at[sel].add((visible & lvalid).astype(jnp.int32))
    mp_found2 = mp_found.at[jnp.clip(pid_global, 0, None)].add(
        (pid_global >= 0).astype(jnp.int32))

    host_blob = jnp.concatenate([
        R_fin.reshape(9), t_fin,
        jnp.stack([stats["f2f_matches"].astype(jnp.float32),
                   stats["localmap_matches"].astype(jnp.float32),
                   stats["n_visible"].astype(jnp.float32),
                   stats["n_inliers"].astype(jnp.float32)]),
        pid_global.astype(jnp.float32)])

    return FrameStepOut(
        xy=feats.xy, xy_und=xy_und, response=feats.response,
        angle=feats.angle, level=feats.level, desc=feats.desc,
        kp_valid=feats.valid, inv_sigma2=inv_s2, sigma2=s2,
        R=R_fin, t=t_fin, pid_global=pid_global,
        next_last_pos=next_last_pos, next_last_valid=pid_global >= 0,
        inliers=inliers,
        mp_visible=mp_visible2, mp_found=mp_found2,
        lm_matches=stats["localmap_matches"].astype(jnp.int32),
        host_blob=host_blob)
