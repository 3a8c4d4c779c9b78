"""Pallas TPU kernel: fused FAST-9 score + 3x3 NMS + 7x7 Gaussian blur over
a pyramid stack.

Grid = (levels, row_tiles).  Each program DMAs its row tile plus a 4-row
halo from HBM into VMEM, then runs the entire detection stage —16 circle
taps, bright/dark arc-min chains (log-step sliding-window min), 3x3 NMS,
per-level interior masking, separable blur — register/VMEM-resident.  The
XLA formulation dispatches ~150 separate HBM-to-HBM elementwise passes for
the same math; this kernel reads each input byte once and writes each
output byte once.

Behavioral notes vs ops/fast.py (golden-tested in tests/test_fast_pallas.py):
  * identical scores/NMS on the interior (borders are masked by
    edge_threshold anyway);
  * blur uses clamped halos at tile seams instead of reflect-101 at image
    borders — differences are confined within 3 px of the level border,
    outside the keypoint margin.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import CIRCLE

_PAD = 8  # >= 4 needed (3 FAST/blur taps + 1 NMS); 8 keeps every tile
          # offset sublane-aligned (Mosaic requires dim-0 slices % 8 == 0)


def _roll2(x, dy, dx):
    # pltpu.roll requires non-negative shifts: roll(-d) == roll(size - d)
    if dy:
        x = pltpu.roll(x, (-dy) % x.shape[0], 0)
    if dx:
        x = pltpu.roll(x, (-dx) % x.shape[1], 1)
    return x


def _detect_tile(img, row0, lh, lw, threshold, border, gtaps):
    """img: [Th, W] f32 tile (with halo).  Returns (score, blur) [Th, W]."""
    H, W = img.shape
    diffs = [_roll2(img, dy, dx) - img for (dx, dy) in CIRCLE]

    def arc(margin):
        m1 = [jnp.minimum(margin[i], margin[(i + 1) % 16]) for i in range(16)]
        m2 = [jnp.minimum(m1[i], m1[(i + 2) % 16]) for i in range(16)]
        m4 = [jnp.minimum(m2[i], m2[(i + 4) % 16]) for i in range(16)]
        m9 = [jnp.minimum(m4[i], margin[(i + 8) % 16]) for i in range(16)]
        best = m9[0]
        for i in range(1, 16):
            best = jnp.maximum(best, m9[i])
        return best

    bright = arc(diffs)
    dark = arc([-x for x in diffs])
    score = jnp.maximum(bright, dark)
    score = jnp.where(score > threshold, score, 0.0)

    is_max = score > 0.0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            n = _roll2(score, dy, dx)
            if (dy, dx) < (0, 0) or (dy == 0 and dx < 0):
                is_max = jnp.logical_and(is_max, score > n)
            else:
                is_max = jnp.logical_and(is_max, score >= n)
    score = jnp.where(is_max, score, 0.0)

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = ((rows >= border) & (rows < lh - border)
                & (cols >= border) & (cols < lw - border))
    score = jnp.where(interior, score, 0.0)

    acc = jnp.zeros_like(img)
    for i, w in enumerate(gtaps):
        acc = acc + w * _roll2(img, i - 3, 0)
    blur = jnp.zeros_like(img)
    for i, w in enumerate(gtaps):
        blur = blur + w * _roll2(acc, 0, i - 3)
    return score, blur


@partial(jax.jit, static_argnames=("threshold", "border", "tile_rows",
                                   "interpret"))
def fast_nms_blur_stack(stack: jnp.ndarray, dims: jnp.ndarray,
                        threshold: float, border: int,
                        tile_rows: int = 48, interpret: bool = False):
    """stack: [L, H, W] float32 padded pyramid (H divisible by tile_rows,
    tile_rows a multiple of 8, W a multiple of 128); dims: [L, 2] int32 true
    (h, w) per level.  Returns (score [L, H, W], blurred [L, H, W])."""
    L, H, W = stack.shape
    assert H % tile_rows == 0 and tile_rows % 8 == 0, (H, tile_rows)
    n_tiles = H // tile_rows
    Th = tile_rows + 2 * _PAD
    d = np.arange(-3, 4, dtype=np.float32)
    g = np.exp(-0.5 * (d / 2.0) ** 2)
    g /= g.sum()
    gtaps = [float(v) for v in g]

    def kernel(dims_ref, hbm_ref, score_ref, blur_ref, scratch, s_tmp, b_tmp,
               sem):
        lvl = pl.program_id(0)
        t = pl.program_id(1)
        start = pl.multiple_of(jnp.clip(t * tile_rows - _PAD, 0, H - Th), 8)
        rel = pl.multiple_of(t * tile_rows - start, 8)
        cp = pltpu.make_async_copy(
            hbm_ref.at[lvl, pl.ds(start, Th), :], scratch, sem)
        cp.start()
        cp.wait()
        img = scratch[:]
        lh = dims_ref[lvl, 0]
        lw = dims_ref[lvl, 1]
        score, blur = _detect_tile(img, start, lh, lw, threshold, border,
                                   gtaps)
        # Mosaic has no value-level dynamic_slice: stage through VMEM refs
        s_tmp[:] = score
        b_tmp[:] = blur
        score_ref[0] = s_tmp[pl.ds(rel, tile_rows), :]
        blur_ref[0] = b_tmp[pl.ds(rel, tile_rows), :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, tile_rows, W), lambda l, t, dims: (l, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_rows, W), lambda l, t, dims: (l, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Th, W), jnp.float32),
            pltpu.VMEM((Th, W), jnp.float32),
            pltpu.VMEM((Th, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((L, H, W), jnp.float32),
            jax.ShapeDtypeStruct((L, H, W), jnp.float32),
        ),
        interpret=interpret,
    )(dims, stack)
