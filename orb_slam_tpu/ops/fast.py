"""FAST-9 corner detection as batched elementwise ops (VPU-friendly).

Replaces the per-cell cv::FAST calls of the reference extractor
(src/ORBextractor.cc:607-614).  We compute a dense *score map* at the low
threshold (7) once; the FAST score is the maximum threshold at which the
segment test still passes, so the per-cell 20->7 fallback becomes a cheap
cell-wise gate on this map (orb_slam_tpu.ops.detect.two_threshold_gate).

The segment test: a pixel is a corner if >= 9 contiguous pixels on the
16-pixel Bresenham circle are all brighter than c + t or all darker than
c - t.  We build the 16 shifted images with jnp.roll (borders are masked off
anyway) and evaluate all 16 contiguous arcs with cumulative minima.
"""
from __future__ import annotations

import jax.numpy as jnp

# OpenCV's 16-point Bresenham circle of radius 3, clockwise from 12 o'clock,
# as (dx, dy) offsets.
CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
ARC_LEN = 9  # FAST-9


def fast_score(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9 score map.

    img: [H, W] float32 grayscale (any range; thresholds in the same units).
    Returns [H, W] float32: 0 where the segment test fails at `threshold`,
    otherwise the largest t' >= threshold at which it still passes
    (max over arcs of the min arc-pixel margin) — identical semantics to
    OpenCV's FAST score used by the reference.
    Border pixels (3 px) score 0.
    """
    c = img
    # diffs[k] = I(p_k) - I(c) for the 16 circle pixels
    diffs = jnp.stack(
        [jnp.roll(img, shift=(-dy, -dx), axis=(0, 1)) - c for dx, dy in CIRCLE],
        axis=0,
    )  # [16, H, W]

    # bright margin: p - c; dark margin: c - p.  For an arc to pass at
    # threshold t, min over the arc of the margin must exceed t.
    # Score per start index i = min_{j<9} margin[(i+j) % 16]; final score =
    # max over i.  Sliding-window min via log-step doubling over the
    # circular axis (4 passes instead of 8 — less memory traffic).
    def arc_scores(margin):
        # margin: [16, H, W]; circular window-9 min = win8 ∘ extra step
        m = margin
        m = jnp.minimum(m, jnp.roll(m, -1, axis=0))   # window 2
        m = jnp.minimum(m, jnp.roll(m, -2, axis=0))   # window 4
        m = jnp.minimum(m, jnp.roll(m, -4, axis=0))   # window 8
        m = jnp.minimum(m, jnp.roll(margin, -8, axis=0))  # window 9
        return jnp.max(m, axis=0)  # best arc per pixel

    bright = arc_scores(diffs)
    dark = arc_scores(-diffs)
    score = jnp.maximum(bright, dark)
    score = jnp.where(score > threshold, score, 0.0)

    # mask 3-pixel border (roll wrap-around is invalid there)
    h, w = img.shape
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    interior = (row >= 3) & (row < h - 3) & (col >= 3) & (col < w - 3)
    return jnp.where(interior, score, 0.0)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression: keep score only at strict local maxima
    (ties broken toward the top-left, matching raster-order behavior)."""
    h, w = score.shape
    neg = -jnp.inf
    is_max = jnp.ones_like(score, dtype=bool)
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            n = jnp.roll(score, shift=(-dy, -dx), axis=(0, 1))
            # pad rolled-in borders with -inf
            valid = (
                (row + dy >= 0) & (row + dy < h) & (col + dx >= 0) & (col + dx < w)
            )
            n = jnp.where(valid, n, neg)
            if (dy, dx) < (0, 0) or (dy == 0 and dx < 0):
                # earlier raster neighbor wins ties
                is_max = is_max & (score > n)
            else:
                is_max = is_max & (score >= n)
    return jnp.where(is_max, score, 0.0)


def harris_score(img: jnp.ndarray, k: float = 0.04, block: int = 7) -> jnp.ndarray:
    """Harris corner response (reference's optional re-scoring,
    ORBextractor.cc:79-120, nScoreType=0).  Sobel gradients + box-summed
    structure tensor over a `block`x`block` window."""
    # Sobel via separable shifts
    def shift(a, dy, dx):
        return jnp.roll(a, shift=(-dy, -dx), axis=(0, 1))

    gx = (
        (shift(img, -1, 1) + 2 * shift(img, 0, 1) + shift(img, 1, 1))
        - (shift(img, -1, -1) + 2 * shift(img, 0, -1) + shift(img, 1, -1))
    ) * 0.125
    gy = (
        (shift(img, 1, -1) + 2 * shift(img, 1, 0) + shift(img, 1, 1))
        - (shift(img, -1, -1) + 2 * shift(img, -1, 0) + shift(img, -1, 1))
    ) * 0.125

    ixx, iyy, ixy = gx * gx, gy * gy, gx * gy

    def box(a):
        r = block // 2
        out = jnp.zeros_like(a)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                out = out + shift(a, dy, dx)
        return out

    sxx, syy, sxy = box(ixx), box(iyy), box(ixy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr
