"""Multi-scale ORB extraction: pyramid -> FAST -> NMS -> spread-select ->
orientation -> blur -> steered BRIEF, all batched per level.

This is the TPU-native replacement of ORBextractor (src/ORBextractor.cc:718-779
operator(), :781-822 ComputePyramid, :522-707 ComputeKeyPoints).  Differences
by design, not oversight:
  * the per-cell quota redistribution loops become per-cell top-k + global
    top-k (see ops/detect.py docstring for the equivalence argument);
  * per-level results live in fixed-size slots concatenated to a single
    max_keypoints array with a validity mask (static shapes for XLA);
  * keypoint coordinates are stored in level-0 pixels (x * 1.2^level), with
    the level index kept for scale-aware matching, like the reference's
    cv::KeyPoint.octave.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ExtractorConfig
from ..ops import detect, fast, patches, brief, resize


class FrameFeatures(NamedTuple):
    """Fixed-capacity ORB features for one frame (SoA)."""

    xy: jnp.ndarray        # [N, 2] float32, level-0 (raw/distorted) pixels
    response: jnp.ndarray  # [N] float32
    angle: jnp.ndarray     # [N] float32 radians
    level: jnp.ndarray     # [N] int32 pyramid level
    desc: jnp.ndarray      # [N, 8] uint32 packed 256-bit descriptors
    valid: jnp.ndarray     # [N] bool

    @property
    def n(self) -> int:
        return self.xy.shape[0]


def level_shapes(cfg: ExtractorConfig, height: int, width: int) -> Tuple[Tuple[int, int], ...]:
    """Static per-level image shapes, mirroring ComputePyramid's rounding."""
    shapes = []
    for l in range(cfg.n_levels):
        s = 1.0 / (cfg.scale_factor ** l)
        shapes.append((int(round(height * s)), int(round(width * s))))
    return tuple(shapes)


def level_quotas(cfg: ExtractorConfig, n_features: int) -> Tuple[int, ...]:
    """Geometric per-level feature quotas (ORBextractor ctor :457-511)."""
    inv = 1.0 / cfg.scale_factor
    total = (1.0 - inv ** cfg.n_levels) / (1.0 - inv)
    base = n_features / total
    quotas = [int(round(base * inv ** l)) for l in range(cfg.n_levels - 1)]
    quotas.append(max(n_features - sum(quotas), 0))
    return tuple(quotas)


def _extract_impl(image: jnp.ndarray, cfg: ExtractorConfig, n_features: int,
                  max_keypoints: int) -> FrameFeatures:
    h, w = image.shape
    shapes = level_shapes(cfg, h, w)
    quotas = level_quotas(cfg, n_features)

    per_xy, per_resp, per_angle, per_level, per_desc, per_valid = [], [], [], [], [], []
    img_l = image.astype(jnp.float32)
    for l, (lh, lw) in enumerate(shapes):
        if l > 0:
            # integer intensities mirror the reference's 8-bit pyramid
            # (cv::resize, ORBextractor.cc:781-822)
            img_l = jnp.round(
                resize.resize_bilinear(image.astype(jnp.float32), lh, lw))
        score = fast.fast_score(img_l, float(cfg.fast_threshold_min))
        if cfg.score_harris:
            # re-score FAST corners with Harris response (nScoreType=0 path,
            # ORBextractor.cc:616-620); selection order changes, threshold
            # semantics (corner-ness) still come from FAST.
            harris = fast.harris_score(img_l)
            score = jnp.where(score > 0, harris - jnp.min(harris) + 1e-3, 0.0)
        score = fast.nms3x3(score)

        # keep clear of borders: IC_Angle patch and steered BRIEF need
        # edge_threshold margin (reference EDGE_THRESHOLD, ORBextractor.h)
        b = cfg.edge_threshold
        row = jnp.arange(lh)[:, None]
        col = jnp.arange(lw)[None, :]
        interior = (row >= b) & (row < lh - b) & (col >= b) & (col < lw - b)
        score = jnp.where(interior, score, 0.0)

        # two-threshold fallback: prefer threshold-20 corners per cell, use
        # threshold-7 ones only in starving cells (ORBextractor.cc:607-614)
        if cfg.fast_threshold > cfg.fast_threshold_min:
            score = detect.two_threshold_gate(
                score, float(cfg.fast_threshold), cfg.cells_y, cfg.cells_x)

        kp = detect.select_keypoints(
            score, quotas[l], cfg.cells_y, cfg.cells_x,
            per_cell=max(4, 4 * quotas[l] // (cfg.cells_x * cfg.cells_y)),
        )
        ang = patches.ic_angle(img_l, kp.xy)
        blurred = patches.gaussian_blur7(img_l)
        desc = brief.brief_descriptors(blurred, kp.xy, ang)

        scale = np.float32(cfg.scale_factor ** l)
        per_xy.append(kp.xy * scale)
        per_resp.append(kp.response)
        per_angle.append(ang)
        per_level.append(jnp.full((kp.xy.shape[0],), l, jnp.int32))
        per_desc.append(desc)
        per_valid.append(kp.valid)

    xy = jnp.concatenate(per_xy, axis=0)
    resp = jnp.concatenate(per_resp, axis=0)
    ang = jnp.concatenate(per_angle, axis=0)
    lev = jnp.concatenate(per_level, axis=0)
    desc = jnp.concatenate(per_desc, axis=0)
    valid = jnp.concatenate(per_valid, axis=0)

    n = xy.shape[0]
    if n < max_keypoints:
        pad = max_keypoints - n
        xy = jnp.pad(xy, ((0, pad), (0, 0)))
        resp = jnp.pad(resp, (0, pad))
        ang = jnp.pad(ang, (0, pad))
        lev = jnp.pad(lev, (0, pad))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    elif n > max_keypoints:
        # keep strongest overall (retainBest, ORBextractor.cc:683,699)
        resp_masked = jnp.where(valid, resp, -1.0)
        _, idx = jax.lax.top_k(resp_masked, max_keypoints)
        xy, resp, ang = xy[idx], resp[idx], ang[idx]
        lev, desc, valid = lev[idx], desc[idx], valid[idx]

    return FrameFeatures(xy=xy, response=resp, angle=ang, level=lev,
                         desc=desc, valid=valid)


@partial(jax.jit, static_argnums=(1, 2, 3))
def extract(image: jnp.ndarray, cfg: ExtractorConfig, n_features: int,
            max_keypoints: int) -> FrameFeatures:
    """Extract ORB features.  image: [H, W] float32 grayscale in [0, 255]."""
    return _extract_impl(image, cfg, n_features, max_keypoints)


def extract_default(image: jnp.ndarray, cfg: ExtractorConfig) -> FrameFeatures:
    return extract(image, cfg, cfg.n_features, cfg.max_keypoints)
