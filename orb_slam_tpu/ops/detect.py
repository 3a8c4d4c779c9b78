"""Keypoint selection: per-cell top-k then global top-k, fully batched.

Replaces the reference's per-cell quota distribution with starving-cell
redistribution and retainBest (src/ORBextractor.cc:522-707).  The semantics
preserved:
  * spatial spread — each grid cell contributes at most `per_cell` keypoints,
  * threshold fallback — two_threshold_gate() reproduces the reference's
    per-cell 20->7 fallback population on the low-threshold score map
    (the FAST score *is* the max passing threshold),
  * retainBest — the final global top-k keeps the strongest `n_total`.

Everything is static-shape: selection returns fixed-size index arrays with a
validity mask (score > 0).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set for one pyramid level."""

    xy: jnp.ndarray        # [N, 2] float32 (x, y) in level coordinates
    response: jnp.ndarray  # [N] float32
    valid: jnp.ndarray     # [N] bool


def select_keypoints(
    score: jnp.ndarray,
    n_total: int,
    cells_y: int,
    cells_x: int,
    per_cell: int,
) -> Keypoints:
    """score: [H, W] NMS'd score map -> top keypoints with spatial spread."""
    h, w = score.shape
    ch = -(-h // cells_y)  # cell height (ceil)
    cw = -(-w // cells_x)
    ph, pw = ch * cells_y, cw * cells_x
    padded = jnp.pad(score, ((0, ph - h), (0, pw - w)))

    # [cells_y, ch, cells_x, cw] -> [n_cells, ch*cw]
    cells = padded.reshape(cells_y, ch, cells_x, cw).transpose(0, 2, 1, 3)
    cells = cells.reshape(cells_y * cells_x, ch * cw)

    k = min(per_cell, ch * cw)
    # top-k per cell by k iterative argmax passes instead of lax.top_k:
    # top_k lowers to a full per-row SORT of the [n_cells, ch*cw] matrix
    # (~1.4 ms/frame on the chip across 8 levels, FRAME_PROFILE r4); k is
    # tiny (4-6), so k max+mask sweeps are ~100x less work and exact
    cells_i = cells
    col = jax.lax.broadcasted_iota(jnp.int32, cells.shape, 1)
    sc, ix = [], []
    for _ in range(k):
        i = jnp.argmax(cells_i, axis=1)
        # clamp exhausted cells to 0.0 like top_k over the >=0 score map
        # (invalid slots stay score-0 -> valid mask False downstream)
        sc.append(jnp.maximum(jnp.max(cells_i, axis=1), 0.0))
        ix.append(i)
        cells_i = jnp.where(col == i[:, None], -jnp.inf, cells_i)
    cell_scores = jnp.stack(sc, axis=1)              # [n_cells, k] descending
    cell_idx = jnp.stack(ix, axis=1)

    # Recover global (y, x) from cell-local flat index.
    cell_ids = jnp.arange(cells_y * cells_x)
    cy = (cell_ids // cells_x)[:, None]
    cx = (cell_ids % cells_x)[:, None]
    ly = cell_idx // cw
    lx = cell_idx % cw
    gy = cy * ch + ly
    gx = cx * cw + lx

    flat_scores = cell_scores.reshape(-1)
    flat_y = gy.reshape(-1)
    flat_x = gx.reshape(-1)

    top_scores, top_i = jax.lax.top_k(flat_scores, min(n_total, flat_scores.shape[0]))
    ys = flat_y[top_i]
    xs = flat_x[top_i]
    valid = top_scores > 0.0

    xy = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
    if top_scores.shape[0] < n_total:
        pad = n_total - top_scores.shape[0]
        xy = jnp.pad(xy, ((0, pad), (0, 0)))
        top_scores = jnp.pad(top_scores, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return Keypoints(xy=xy, response=top_scores, valid=valid)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def select_keypoints_jit(score, n_total, cells_y, cells_x, per_cell):
    return select_keypoints(score, n_total, cells_y, cells_x, per_cell)


def two_threshold_gate(
    score: jnp.ndarray, hi_threshold: float, cells_y: int, cells_x: int
) -> jnp.ndarray:
    """Per-cell two-threshold FAST fallback (src/ORBextractor.cc:607-614):
    the reference detects at the high threshold (20) per grid cell and only
    re-detects at the low threshold (7) in cells that yielded nothing.

    Given an NMS'd score map computed at the LOW threshold (the FAST score is
    the maximum passing threshold), this zeroes every sub-`hi_threshold`
    corner in cells that contain at least one high-threshold corner — which
    reproduces the reference's per-cell corner population: NMS-at-low-then-
    filter equals NMS-at-high for the high set, because a corner scoring
    above `hi` can only be suppressed by a neighbor that also scores above.
    """
    h, w = score.shape
    ch = -(-h // cells_y)
    cw = -(-w // cells_x)
    padded = jnp.pad(score, ((0, ch * cells_y - h), (0, cw * cells_x - w)))
    cells = padded.reshape(cells_y, ch, cells_x, cw)
    has_hi = jnp.max(cells, axis=(1, 3)) > hi_threshold   # [cells_y, cells_x]
    has_hi_full = jnp.repeat(
        jnp.repeat(has_hi, ch, axis=0), cw, axis=1)[:h, :w]
    return jnp.where(has_hi_full & (score <= hi_threshold), 0.0, score)
