"""Jitted kernels for keyframe-rate map building (LocalMapping's compute).

 - triangulate_between: CreateNewMapPoints' per-neighbor epipolar search +
   triangulation (src/LocalMapping.cc:220-386, src/ORBmatcher.cc:852-1014)
   as one batched program per keyframe pair.
 - point_stats: UpdateNormalAndDepth (src/MapPoint.cc:273-312) batched over
   the whole observation table.
 - fuse_into_keyframe: ORBmatcher::Fuse (src/ORBmatcher.cc:1016-1134) —
   project map points into a keyframe and associate/merge duplicates.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3, triangulate
from ..geometry.camera import CameraParams, in_image
from ..ops import match as m


def fundamental_from_poses(R1, t1, R2, t2, K):
    """F12 such that x2^T F12 x1 = 0 for pixel coords (ComputeF12,
    src/LocalMapping.cc:467-484)."""
    # T12 = T1 o T2^-1 maps cam2 coords to cam1: x1 ~ K (R12 X2 + t12)
    R12 = R1 @ R2.T
    t12 = t1 - R12 @ t2
    E = se3.hat(t12) @ R12            # x1^T K^-T E K^-1 x2 = 0
    Ki = jnp.linalg.inv(K)
    F_a = Ki.T @ E @ Ki               # x1^T F_a x2 = 0
    return F_a.T                      # x2^T F12 x1 = 0


class TriangulationResult(NamedTuple):
    slot2: jnp.ndarray   # [N1] matched slot in kf2 (-1 none)
    X: jnp.ndarray       # [N1, 3] world points
    ok: jnp.ndarray      # [N1] all gates passed


@partial(jax.jit, static_argnames=("scale_factor", "histo_length",
                                   "check_orientation"))
def triangulate_between(
    xy1, desc1, level1, angle1, free1,
    xy2, desc2, level2, angle2, free2,
    R1, t1, R2, t2,
    sigma2_1, sigma2_2,
    K, cam: CameraParams,
    max_dist: int = 50,
    epipolar_chi2: float = 3.84,
    reproj_chi2: float = 5.991,
    scale_factor: float = 1.2,
    histo_length: int = 30,
    check_orientation: bool = True,
) -> TriangulationResult:
    """Epipolar-gated matching of unassociated keypoints between two
    keyframes + batched triangulation with the reference's acceptance gates."""
    F12 = fundamental_from_poses(R1, t1, R2, t2, K)

    dist = m.hamming_matrix(desc1, desc2)
    mask = (
        m.epipolar_mask(xy1, xy2, F12, sigma2_2, chi2=epipolar_chi2)
        & m.valid_mask(free1, free2)
    )
    gated = m.apply_masks(dist, mask)
    mm = m.match_nn(gated, max_dist=max_dist)
    if check_orientation:
        keep = m.rotation_consistency(angle1, angle2, mm,
                                      histo_length=histo_length)
        mm = m.Matches(idx=jnp.where(keep, mm.idx, -1), dist=mm.dist,
                       valid=keep)
    mm = m.resolve_duplicates(mm, xy2.shape[0])

    j = jnp.clip(mm.idx, 0, None)
    xy2m = xy2[j]

    # triangulate in world frame
    P1 = triangulate.projection_matrix(K, R1, t1)
    P2 = triangulate.projection_matrix(K, R2, t2)
    X = triangulate.triangulate_dlt(P1, P2, xy1, xy2m)
    finite = jnp.all(jnp.isfinite(X), axis=1)
    Xs = jnp.where(finite[:, None], X, 0.0)

    # parallax between rays (reference requires cosParallax < 0.9998)
    c1 = -R1.T @ t1
    c2 = -R2.T @ t2
    cosp = triangulate.parallax_cos(Xs, c1, c2)

    xc1 = se3.transform(R1, t1, Xs)
    xc2 = se3.transform(R2, t2, Xs)

    def reproj(xc, xy, s2):
        z = jnp.maximum(xc[:, 2], 1e-6)
        uv = jnp.stack(
            [xc[:, 0] / z * cam.fx + cam.cx, xc[:, 1] / z * cam.fy + cam.cy],
            axis=1,
        )
        return jnp.sum((uv - xy) ** 2, axis=1) / s2

    e1 = reproj(xc1, xy1, sigma2_1)
    e2 = reproj(xc2, xy2m, sigma2_2[j])

    # scale-consistency (LocalMapping.cc:352-366): distance ratio must agree
    # with the octave scale ratio within ratioFactor = 1.5 * scaleFactor
    d1 = jnp.linalg.norm(Xs - c1[None], axis=1)
    d2 = jnp.linalg.norm(Xs - c2[None], axis=1)
    ratio_dist = d2 / jnp.maximum(d1, 1e-9)
    ratio_octave = scale_factor ** (level1 - level2[j]).astype(jnp.float32)
    rf = 1.5 * scale_factor
    scale_ok = (ratio_dist < ratio_octave * rf) & (ratio_dist * rf > ratio_octave)

    ok = (
        mm.valid & finite
        & (cosp > 0) & (cosp < 0.9998)
        & (xc1[:, 2] > 0) & (xc2[:, 2] > 0)
        & (e1 < reproj_chi2) & (e2 < reproj_chi2)
        & scale_ok
    )
    return TriangulationResult(slot2=jnp.where(ok, mm.idx, -1), X=Xs, ok=ok)


@partial(jax.jit, static_argnames=("n_levels", "scale_factor"))
def point_stats(
    kf_obs, kf_R, kf_t, kf_level, kf_valid,
    mp_pos, mp_valid, mp_ref_kf,
    n_levels: int = 8, scale_factor: float = 1.2,
):
    """Batched UpdateNormalAndDepth over the whole map: mean viewing
    direction and the scale-invariance distance band from the reference
    keyframe's octave.  Returns (normal [P,3], min_dist [P], max_dist [P])."""
    K, N = kf_obs.shape
    P = mp_pos.shape[0]
    centers = -jnp.einsum("kji,kj->ki", kf_R, kf_t)  # [K, 3]

    obs_flat = kf_obs.reshape(-1)
    kf_of_obs = jnp.repeat(jnp.arange(K), N)
    valid_obs = (obs_flat >= 0) & kf_valid[kf_of_obs]
    pid = jnp.where(valid_obs, obs_flat, P)

    rays = mp_pos[jnp.clip(obs_flat, 0, P - 1)] - centers[kf_of_obs]
    rays = rays / jnp.maximum(jnp.linalg.norm(rays, axis=1, keepdims=True), 1e-9)
    rays = jnp.where(valid_obs[:, None], rays, 0.0)

    normal_sum = jnp.zeros((P + 1, 3), mp_pos.dtype).at[pid].add(rays)
    counts = jnp.zeros((P + 1,), mp_pos.dtype).at[pid].add(valid_obs.astype(mp_pos.dtype))
    normal = normal_sum[:P] / jnp.maximum(counts[:P, None], 1.0)

    # distance band from the reference keyframe
    ref = jnp.clip(mp_ref_kf, 0, K - 1)
    d_ref = jnp.linalg.norm(mp_pos - centers[ref], axis=1)
    # octave of the observation in the reference keyframe: find the slot
    # (first slot in ref KF observing this point)
    # build per-point level via scatter-min of (level) over obs in ref kf
    is_ref_obs = valid_obs & (kf_of_obs == ref[jnp.clip(obs_flat, 0, P - 1)])
    lev_flat = kf_level.reshape(-1)
    pid_ref = jnp.where(is_ref_obs, obs_flat, P)
    ref_level = jnp.full((P + 1,), n_levels, jnp.int32).at[pid_ref].min(lev_flat)
    ref_level = jnp.clip(ref_level[:P], 0, n_levels - 1)

    level_scale = scale_factor ** ref_level.astype(mp_pos.dtype)
    max_dist = d_ref * level_scale
    min_dist = max_dist / (scale_factor ** (n_levels - 1))
    return normal, min_dist, max_dist


@jax.jit
def medoid_descriptors(desc_sets: jnp.ndarray, valid: jnp.ndarray):
    """Representative landmark descriptors: for each point's observation
    descriptor set, pick the one with least MEDIAN Hamming distance to its
    siblings (MapPoint::ComputeDistinctiveDescriptors, src/MapPoint.cc:
    185-250), batched over points.

    desc_sets: [P, M, 8] uint32 (padded observation descriptors);
    valid: [P, M] bool.  Returns (best_desc [P, 8], has_any [P]).
    """
    P, M, _ = desc_sets.shape
    x = jnp.bitwise_xor(desc_sets[:, :, None, :], desc_sets[:, None, :, :])
    d = jnp.sum(jax.lax.population_count(x), axis=-1)      # [P, M, M]
    pair_ok = valid[:, :, None] & valid[:, None, :]
    big = jnp.int32(1 << 20)
    d = jnp.where(pair_ok, d, big)
    # median over valid siblings: sort ascending, index the middle of the
    # valid prefix (invalid sort to the end)
    d_sorted = jnp.sort(d, axis=-1)
    n_valid = jnp.sum(valid, axis=1)                        # [P]
    mid = jnp.clip((n_valid - 1) // 2, 0, M - 1)            # reference takes
    # 0.5*(N-1) index of sorted distances (MapPoint.cc:238)
    med = jnp.take_along_axis(
        d_sorted, mid[:, None, None].repeat(M, 1), axis=-1)[..., 0]  # [P, M]
    med = jnp.where(valid, med, big)
    best = jnp.argmin(med, axis=1)                          # [P]
    out = jnp.take_along_axis(
        desc_sets, best[:, None, None].repeat(8, 2), axis=1)[:, 0, :]
    return out, n_valid > 0


@jax.jit
def fuse_into_keyframe(
    kf_xy, kf_desc, kf_level, kf_kp_valid, kf_obs,
    R, t,
    mp_pos, mp_desc, mp_valid, mp_ids,
    sigma2_kf,
    cam: CameraParams,
    radius: float = 3.0, max_dist: int = 50,
):
    """Project candidate map points into a keyframe; match to its keypoints.

    Returns (slot [M], ok [M]) per candidate point: the keypoint slot each
    point should be associated with.  The caller merges: if the slot already
    observes another point, the two landmarks are duplicates -> host replaces
    the younger with the older (MapPoint::Replace, src/MapPoint.cc:124-158).
    """
    xc = se3.transform(R, t, mp_pos)
    z = xc[:, 2]
    uv = jnp.stack(
        [xc[:, 0] / jnp.maximum(z, 1e-6) * cam.fx + cam.cx,
         xc[:, 1] / jnp.maximum(z, 1e-6) * cam.fy + cam.cy], axis=1)
    proj_ok = mp_valid & (z > 0) & in_image(uv, cam)

    dist = m.hamming_matrix(mp_desc, kf_desc)
    # radius scaled by the keypoint's own octave; also chi2-gate the
    # reprojection distance like the reference (e < 5.99 sigma2)
    du = uv[:, None, 0] - kf_xy[None, :, 0]
    dv = uv[:, None, 1] - kf_xy[None, :, 1]
    e2 = du * du + dv * dv
    r_kp = radius * (1.2 ** kf_level.astype(jnp.float32))
    mask = (
        (e2 <= (r_kp * r_kp)[None, :])
        & (e2 / jnp.maximum(sigma2_kf, 1e-9)[None, :] < 5.99)
        & m.valid_mask(proj_ok, kf_kp_valid)
    )
    gated = m.apply_masks(dist, mask)
    mm = m.match_nn(gated, max_dist=max_dist)
    mm = m.resolve_duplicates(mm, kf_xy.shape[0])
    return jnp.where(mm.valid, mm.idx, -1), mm.valid


@partial(jax.jit, static_argnames=("max_obs", "cap"))
def refresh_medoid_descriptors(kf_obs, kf_desc, mp_desc, kf_row,
                               *, max_obs: int = 8, cap: int = 2048):
    """One-program replacement for the host-side observation gather of
    MapPoint::ComputeDistinctiveDescriptors: collect up to max_obs
    observation descriptors for every landmark seen by keyframe kf_row via
    a device sort + searchsorted over the flat observation table, take the
    min-median-Hamming medoid, scatter into mp_desc.  Zero host transfer
    (the previous formulation fetched the full [K,N,8] descriptor table
    through the device link per keyframe)."""
    K, N = kf_obs.shape
    BIG = jnp.int32(2**31 - 1)
    row = kf_obs[kf_row]
    pids = jnp.unique(jnp.where(row >= 0, row, BIG), size=cap,
                      fill_value=BIG)
    pid_valid = pids < BIG

    flat = kf_obs.reshape(-1)
    flat = jnp.where(flat >= 0, flat, BIG)
    order = jnp.argsort(flat)
    sorted_pid = flat[order]
    lo = jnp.searchsorted(sorted_pid, pids)
    idx = jnp.clip(lo[:, None] + jnp.arange(max_obs)[None, :], 0, K * N - 1)
    sel_pid = sorted_pid[idx]                               # [cap, max_obs]
    valid = (sel_pid == pids[:, None]) & pid_valid[:, None]
    sets = kf_desc.reshape(K * N, 8)[order[idx]]            # [cap, max_obs, 8]

    best, has = medoid_descriptors(sets, valid)
    active = pid_valid & has
    # inactive rows write to a scratch slot past the pool (a duplicate
    # scatter to slot 0 would race with point 0's real write)
    P = mp_desc.shape[0]
    tgt = jnp.where(active, jnp.clip(pids, 0, P - 1), P)
    padded = jnp.concatenate([mp_desc, mp_desc[:1]], axis=0)
    return padded.at[tgt].set(best)[:P]


class MultiTriangulation(NamedTuple):
    X: jnp.ndarray        # [N, 3] winning world point per kf slot
    ok: jnp.ndarray       # [N] any neighbor triangulated this slot
    slot2: jnp.ndarray    # [N] matched slot in the winning neighbor
    nb_of: jnp.ndarray    # [N] winning neighbor keyframe id
    blob: jnp.ndarray     # [N, 6] f32 [ok, X, slot2, nb_of] packed
    #                       in-program so the caller fetches ONCE


@partial(jax.jit, static_argnames=("scale_factor", "histo_length",
                                   "check_orientation"))
def triangulate_multi(
    kf_row, nb_idx, nb_valid,
    kf_xy, kf_desc, kf_level, kf_angle, kf_kp_valid, kf_obs,
    kf_R, kf_t,
    sigma2_table, K, cam: CameraParams,
    max_dist: int = 50,
    epipolar_chi2: float = 3.84,
    reproj_chi2: float = 5.991,
    scale_factor: float = 1.2,
    histo_length: int = 30,
    check_orientation: bool = True,
) -> MultiTriangulation:
    """CreateNewMapPoints over ALL covisible neighbors as ONE program
    (src/LocalMapping.cc:220-386 loops neighbors on the host; here the pair
    search is vmapped over a padded [Nn] neighbor axis and the first valid
    neighbor — neighbors are supplied in covisibility order — wins each
    keyframe slot, reproducing the reference's sequential first-association
    semantics)."""
    s2 = sigma2_table
    xy1 = kf_xy[kf_row]
    desc1 = kf_desc[kf_row]
    level1 = kf_level[kf_row]
    angle1 = kf_angle[kf_row]
    free1 = kf_kp_valid[kf_row] & (kf_obs[kf_row] < 0)
    s2_1 = s2[jnp.clip(level1, 0, s2.shape[0] - 1)]
    R1 = kf_R[kf_row]
    t1 = kf_t[kf_row]

    def one(nb, nbv):
        free2 = kf_kp_valid[nb] & (kf_obs[nb] < 0) & nbv
        lv2 = kf_level[nb]
        res = triangulate_between(
            xy1, desc1, level1, angle1, free1,
            kf_xy[nb], kf_desc[nb], lv2, kf_angle[nb], free2,
            R1, t1, kf_R[nb], kf_t[nb],
            s2_1, s2[jnp.clip(lv2, 0, s2.shape[0] - 1)],
            K, cam, max_dist=max_dist, epipolar_chi2=epipolar_chi2,
            reproj_chi2=reproj_chi2, scale_factor=scale_factor,
            histo_length=histo_length,
            check_orientation=check_orientation)
        return res.slot2, res.X, res.ok & nbv

    slot2s, Xs, oks = jax.vmap(one)(nb_idx, nb_valid)     # [Nn, N, ...]
    first = jnp.argmax(oks, axis=0)                        # first True
    any_ok = jnp.any(oks, axis=0)
    cols = jnp.arange(oks.shape[1])
    X_win = Xs[first, cols]
    slot2_win = slot2s[first, cols]
    nb_win = nb_idx[first]
    blob = jnp.concatenate([
        any_ok.astype(jnp.float32)[:, None], X_win,
        slot2_win.astype(jnp.float32)[:, None],
        nb_win.astype(jnp.float32)[:, None]], axis=1)
    return MultiTriangulation(
        X=X_win, ok=any_ok, slot2=slot2_win, nb_of=nb_win, blob=blob)


@partial(jax.jit, static_argnames=("n_levels", "scale_factor", "max_obs",
                                   "cap"))
def point_stats_and_medoid(kf_obs, kf_R, kf_t, kf_level, kf_valid,
                           mp_pos, mp_valid, mp_ref_kf, kf_desc, mp_desc,
                           kf_row, *, n_levels: int, scale_factor: float,
                           max_obs: int = 8, cap: int = 2048):
    """point_stats + refresh_medoid_descriptors fused into ONE program —
    they run back-to-back at keyframe rate and each dispatch is a full
    round trip on latency-bound runtimes."""
    normal, min_d, max_d = point_stats(
        kf_obs, kf_R, kf_t, kf_level, kf_valid, mp_pos, mp_valid, mp_ref_kf,
        n_levels=n_levels, scale_factor=scale_factor)
    new_desc = refresh_medoid_descriptors(
        kf_obs, kf_desc, mp_desc, kf_row, max_obs=max_obs, cap=cap)
    return normal, min_d, max_d, new_desc


@jax.jit
def fuse_into_keyframe_tables_multi(
    kf_xy, kf_desc, kf_level, kf_kp_valid, kf_R, kf_t,
    targets, obs_rows,
    mp_pos, mp_desc, sels, cand_valids,
    sigma2_table, cam: CameraParams,
    radius, max_dist,
):
    """fuse_into_keyframe_tables vmapped over fuse targets: ONE dispatch +
    ONE [T, M, 2] fetch for the whole neighbor set (the per-target loop cost
    T round trips on latency-bound runtimes).  targets/obs_rows/sels/
    cand_valids carry the leading [T] axis; the keyframe tables broadcast."""
    def one(target, obs_row, sel, cvalid):
        lv = kf_level[target]
        s2 = sigma2_table[jnp.clip(lv, 0, sigma2_table.shape[0] - 1)]
        selc = jnp.clip(sel, 0, None)
        slot, ok = fuse_into_keyframe(
            kf_xy[target], kf_desc[target], lv,
            kf_kp_valid[target],
            obs_row,
            kf_R[target], kf_t[target],
            mp_pos[selc], mp_desc[selc], cvalid, selc,
            s2, cam, radius=radius, max_dist=max_dist)
        return jnp.stack([slot, ok.astype(jnp.int32)], axis=1)

    return jax.vmap(one)(targets, obs_rows, sels, cand_valids)


@jax.jit
def fuse_into_keyframe_tables(
    kf_xy, kf_desc, kf_level, kf_kp_valid, kf_R, kf_t,
    target, obs_row,
    mp_pos, mp_desc, sel, cand_valid,
    sigma2_table, cam: CameraParams,
    radius, max_dist,
):
    """fuse_into_keyframe with the per-target gathers done in-program (one
    dispatch per fuse target instead of ~10 eager slices), returning a
    single [M, 2] (slot, ok) blob so the caller fetches once."""
    lv = kf_level[target]
    s2 = sigma2_table[jnp.clip(lv, 0, sigma2_table.shape[0] - 1)]
    selc = jnp.clip(sel, 0, None)
    slot, ok = fuse_into_keyframe(
        kf_xy[target], kf_desc[target], lv,
        kf_kp_valid[target],
        obs_row,
        kf_R[target], kf_t[target],
        mp_pos[selc], mp_desc[selc], cand_valid, selc,
        s2, cam, radius=radius, max_dist=max_dist)
    return jnp.stack([slot, ok.astype(jnp.int32)], axis=1)
