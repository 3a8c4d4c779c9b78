"""Pallas TPU kernel: fused IC-angle + steered-BRIEF for the whole pyramid.

Replaces the two large per-keypoint gathers of the XLA extractor path
(31x31 raw patches for the intensity-centroid orientation, 512 rotated
BRIEF samples from the blurred image — ORBextractor.cc:124-151 IC_Angle,
:155-194 computeOrbDescriptor).  XLA lowers those gathers to one-element-
at-a-time loops (~30 ms/frame measured); this kernel keeps each pyramid
level VMEM-resident and turns every patch access into one-hot MXU matmuls:

    grid = (levels,) — each program holds raw + blurred level in VMEM
    per keypoint (fori_loop over slot capacity):
      window     = dynamic [56, 256] VMEM slice around the keypoint
                   (56 rows cover the +-19 px reach of the rotated pattern,
                   256 lanes cover +-19 px at any 128-aligned offset)
      moments    = S_rows @ window  ⊙  W_moment @ S_cols   (two matmuls)
      cos/sin    = m10/|m|, m01/|m|          (≡ cos/sin of atan2(m01, m10))
      samples    = (S_rowsel @ blurred_window) ⊙ S_colsel, row-reduced,
                   both compare banks in one [512, WIN] selection
      descriptor = pair compares, bit-packed by two exact f32 matmuls
                   (16-bit halves — sums < 2^16 are exact in f32)

Everything inside the loop is 2D with static shapes derived from scalars,
because Mosaic does not lower 1D lane concats/reshapes/transposes; the
BRIEF pattern is baked in as [256, 1] compile-time constants per bank.

Outputs (m01, m10) instead of the angle so the caller computes atan2 once
outside (cheap; keeps transcendentals out of the kernel), plus the packed
256-bit descriptor as int32[8] (bit pattern identical to the XLA path's
uint32 words).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import brief, patches

WIN_R, WIN_C = 48, 256   # patch window (rows 8-aligned, cols 128-aligned)
# WIN_R derivation: ry = floor((cy-20)/8)*8 lands in [cy-27, cy-20], the
# rotated-pattern reach is +-19 px (+1 rounding), so rows [cy-20, cy+20]
# sit at local offsets [0..47] for every alignment case -> 48 rows (8-
# aligned).  The r3 kernel used 56 rows with a -24 anchor; the tighter
# anchor cuts the row-selection matmuls by 14%.


def _moment_weights() -> tuple[np.ndarray, np.ndarray]:
    """Two [32, 32] f32 circular-masked x / y moment filters, zero-padded
    from the 31x31 IC mask (identical weights to the XLA path)."""
    mask = np.asarray(patches._IC_MASK, np.float32)        # [31, 31]
    dx = np.asarray(patches._IC_DX, np.float32)            # [-15..15]
    w10 = np.zeros((32, 32), np.float32)
    w01 = np.zeros((32, 32), np.float32)
    w10[:31, :31] = mask * dx[None, :]                     # m10: weight by x
    w01[:31, :31] = mask * dx[:, None]                     # m01: weight by y
    return w10, w01


def _pattern_banks() -> tuple[np.ndarray, ...]:
    """(px, py), each [512, 1] f32 — BRIEF pair endpoints with the p bank
    in rows 0..255 and the q bank in rows 256..511, so ONE [512, WIN]
    selection matmul samples both compare operands."""
    pts = np.asarray(brief._POINTS, np.float32)            # [512, 2] pairs
    px = np.concatenate([pts[0::2, 0:1], pts[1::2, 0:1]]).copy()
    py = np.concatenate([pts[0::2, 1:2], pts[1::2, 1:2]]).copy()
    return px, py


def _pack_weights() -> tuple[np.ndarray, np.ndarray]:
    """[256, 8] f32 lo/hi packing matrices: bits.T @ W gives the low/high
    16-bit halves of the 8 descriptor words (exact in f32)."""
    lo = np.zeros((256, 8), np.float32)
    hi = np.zeros((256, 8), np.float32)
    for i in range(256):
        w, b = divmod(i, 32)
        if b < 16:
            lo[i, w] = float(1 << b)
        else:
            hi[i, w] = float(1 << (b - 16))
    return lo, hi


def _kernel(xy_ref, dims_ref, raw_ref, blur_ref, wmom_ref, banks_ref,
            pack_ref, mom_ref, desc_ref, *, cap, H0, W0):
    lh = dims_ref[0, 0, 0]
    lw = dims_ref[0, 0, 1]
    n_valid = dims_ref[0, 0, 2]
    # valid slots are a prefix (select_keypoints sorts scores descending,
    # quota masks by rank): loop over exactly the live keypoints instead of
    # the full slot capacity — levels carry 60..217 keypoints against a
    # 217-slot cap, so the fixed-cap loop wasted ~40% of the kernel's
    # iterations (FRAME_PROFILE r4: this kernel was 3.6 of the ~8 ms/frame
    # device budget).  Outputs are zero-initialized so skipped slots hold
    # deterministic zeros (angle atan2(0,0)=0; descriptors masked anyway).
    mom_ref[0] = jnp.zeros((cap, 2), jnp.float32)
    desc_ref[0] = jnp.zeros((cap, 8), jnp.int32)
    wm10 = wmom_ref[0]                                     # [32, 32]
    wm01 = wmom_ref[1]
    px = banks_ref[0]                                      # [512, 1] each
    py = banks_ref[1]
    wlo = pack_ref[0]                                      # [256, 8]
    whi = pack_ref[1]
    mom_sel0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 2), 1)
                == 0).astype(jnp.float32)                  # [[1, 0]]
    mom_sel1 = 1.0 - mom_sel0

    def body(j, carry):
        fx = xy_ref[0, 0, 2 * j]
        fy = xy_ref[0, 0, 2 * j + 1]
        cx = jnp.round(fx).astype(jnp.int32)
        cy = jnp.round(fy).astype(jnp.int32)
        ry = pl.multiple_of(jnp.clip(((cy - 20) // 8) * 8, 0, H0 - WIN_R), 8)
        cx0 = pl.multiple_of(
            jnp.clip(((cx - 19) // 128) * 128, 0, W0 - WIN_C), 128)
        raw = raw_ref[0, pl.ds(ry, WIN_R), pl.ds(cx0, WIN_C)]
        blr = blur_ref[0, pl.ds(ry, WIN_R), pl.ds(cx0, WIN_C)]

        # --- intensity-centroid moments over the 31x31 circular mask ----
        r0 = cy - 15 - ry                                  # local top row
        c0 = cx - 15 - cx0                                 # local left col
        # one-hot selection matmuls run in bf16: {0,1} selectors and
        # 8-bit pixel values are exactly representable, and each output
        # element sums exactly one nonzero product -> bit-exact vs f32,
        # at full MXU rate (f32 HIGHEST costs a 3-pass expansion)
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (32, WIN_R), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (32, WIN_R), 1)
        s31 = ((cols_i == r0 + rows_i) & (rows_i < 31)).astype(jnp.bfloat16)
        p31 = jnp.dot(s31, raw.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)   # [32, 256]
        k_i = jax.lax.broadcasted_iota(jnp.int32, (32, WIN_C), 0)
        cc_i = jax.lax.broadcasted_iota(jnp.int32, (32, WIN_C), 1)
        cplace = ((cc_i == c0 + k_i) & (k_i < 31)).astype(jnp.float32)
        # moment weights are +-15 integers: exact in bf16 too, but keep the
        # tiny [32, WIN_C] products in f32 HIGHEST for the masked moment sum
        w10c = jnp.dot(wm10, cplace, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        w01c = jnp.dot(wm01, cplace, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        m10 = jnp.sum(p31 * w10c)
        m01 = jnp.sum(p31 * w01c)
        hyp = jnp.sqrt(m10 * m10 + m01 * m01)
        ca = jnp.where(hyp > 0, m10 / hyp, 1.0)
        sa = jnp.where(hyp > 0, m01 / hyp, 0.0)

        # --- steered BRIEF: 2 x 256 rotated samples, one bank at a time -
        blr16 = blr.astype(jnp.bfloat16)

        # both compare banks sampled by ONE [512, WIN] selection matmul
        # (bit-exact in bf16: {0,1} selectors picking integer blurred
        # pixels — the blurred pyramid is 8-bit-quantized upstream)
        gx = jnp.round(px * ca - py * sa + fx)             # [512, 1]
        gy = jnp.round(px * sa + py * ca + fy)
        lx = jnp.clip(jnp.clip(gx.astype(jnp.int32), 0, lw - 1) - cx0,
                      0, WIN_C - 1)
        ly = jnp.clip(jnp.clip(gy.astype(jnp.int32), 0, lh - 1) - ry,
                      0, WIN_R - 1)
        srow_i = jax.lax.broadcasted_iota(jnp.int32, (512, WIN_R), 1)
        srow = (srow_i == ly).astype(jnp.bfloat16)
        rows = jnp.dot(srow, blr16,
                       preferred_element_type=jnp.float32)  # [512, WIN_C]
        scol_i = jax.lax.broadcasted_iota(jnp.int32, (512, WIN_C), 1)
        scol = (scol_i == lx).astype(jnp.float32)
        samples = jnp.sum(rows * scol, axis=1, keepdims=True)  # [512, 1]
        bits = (samples[:256] < samples[256:]).astype(jnp.float32)
        lo = jax.lax.dot_general(bits, wlo, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        hi = jax.lax.dot_general(bits, whi, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        # hi << 16 wraps into the int32 sign bit exactly as uint32 packing
        words = (hi.astype(jnp.int32) * jnp.int32(65536)
                 + lo.astype(jnp.int32))                   # [1, 8]

        mom_ref[0, pl.ds(j, 1), :] = m01 * mom_sel0 + m10 * mom_sel1
        desc_ref[0, pl.ds(j, 1), :] = words
        return carry

    jax.lax.fori_loop(0, jnp.minimum(n_valid, cap), body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def orient_describe(stack, blurred, kp_xy, dims, counts=None, *,
                    interpret=False):
    """stack/blurred: [L, H0, W0] f32 (padded pyramid + its blur).
    kp_xy: [L, cap, 2] f32 level-local pixel coords (invalid slots may hold
    arbitrary in-image values — mask downstream).  dims: [L, 2] int32 true
    (h, w) per level.  counts: optional [L] int32 number of VALID keypoints
    per level (valid slots must be a prefix — see _kernel); None processes
    every slot.  Returns (m01 [L, cap], m10 [L, cap],
    desc [L, cap, 8] uint32)."""
    L, H0, W0 = stack.shape
    cap = kp_xy.shape[1]
    # leading singleton: TPU block specs need the last two dims of each
    # block to tile the array; blocking [L, n] at (1, n) violates that,
    # [L, 1, n] at (1, 1, n) does not.
    xy_flat = kp_xy.reshape(L, 1, cap * 2)
    if counts is None:
        counts = jnp.full((L,), cap, jnp.int32)
    dims3 = jnp.concatenate(
        [dims, counts.reshape(L, 1).astype(jnp.int32)], axis=1
    ).reshape(L, 1, 3)
    wmom = jnp.asarray(np.stack(_moment_weights()))        # [2, 32, 32]
    banks = jnp.asarray(np.stack(_pattern_banks()))        # [2, 512, 1]
    pack = jnp.asarray(np.stack(_pack_weights()))          # [2, 256, 8]

    mom, desc = pl.pallas_call(
        partial(_kernel, cap=cap, H0=H0, W0=W0),
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, 1, cap * 2), lambda l: (l, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 3), lambda l: (l, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H0, W0), lambda l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H0, W0), lambda l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 32, 32), lambda l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 512, 1), lambda l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 256, 8), lambda l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cap, 2), lambda l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap, 8), lambda l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, cap, 2), jnp.float32),
            jax.ShapeDtypeStruct((L, cap, 8), jnp.int32),
        ],
        interpret=interpret,
    )(xy_flat, dims3, stack, blurred, wmom, banks, pack)
    return (mom[:, :, 0], mom[:, :, 1],
            jax.lax.bitcast_convert_type(desc, jnp.uint32))
