"""Level-batched ORB extraction: the whole pyramid as one [L, H, W] stack.

The per-level extractor (extractor.py) dispatches ~40 ops per level x 8
levels; on dispatch-overhead-bound runtimes that dominates the frame budget.
This variant pads every pyramid level to the level-0 shape and runs each
stage ONCE batched over the level axis:

    resize (8 small kernels) -> [L, H, W] stack
    FAST + NMS + border masks     vmapped elementwise, one fused pass
    per-cell/global top-k         vmapped over levels, one pass
    IC-angle patch gather         one gather for all levels' keypoints
    blur                          one separable conv pair over the stack
    steered BRIEF                 one gather + compare + pack

Padding wastes ~3x the summed pixel area of the true pyramid, a good trade
whenever kernel overhead, not FLOPs, binds (the VPU passes are microseconds).
Outputs are identical in layout to extractor.extract (FrameFeatures).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ExtractorConfig
from ..ops import detect, fast, patches, brief, resize
from .extractor import FrameFeatures, level_shapes, level_quotas


def _pad_shape(h, w, tile_rows=48):
    return (-(-h // tile_rows) * tile_rows, -(-w // 128) * 128)


_RESIZE_MATS: dict = {}


def _resize_mats(shapes, tile_rows=48):
    """Per-level row/column resize matrices, zero-padded to the padded
    stack shape ([L, H0, H] and [L, W0, W]) so resize + zero padding of
    every level is two batched matmuls."""
    key = (tuple(shapes), tile_rows)
    hit = _RESIZE_MATS.get(key)
    if hit is not None:
        return hit
    H, W = shapes[0]
    H0, W0 = _pad_shape(H, W, tile_rows)
    L = len(shapes)
    Ay = np.zeros((L, H0, H), np.float32)
    Ax = np.zeros((L, W0, W), np.float32)
    for li, (lh, lw) in enumerate(shapes):
        Ay[li, :lh] = resize.resize_matrix(H, lh)
        Ax[li, :lw] = resize.resize_matrix(W, lw)
    _RESIZE_MATS[key] = (Ay, Ax)
    return Ay, Ax


def _build_stack(image, shapes, tile_rows=48):
    """[L, Hp, Wp] stack: each level resized then zero-padded (padded dims
    rounded up for the Pallas kernel's tiling).  The resize runs as two
    MXU einsums over precomputed interpolation matrices — per-level
    jax.image.resize gathers took ~35 ms/frame on TPU; this is ~2 GFLOP
    of batched matmul."""
    Ay, Ax = _resize_mats(shapes, tile_rows)
    img = image.astype(jnp.float32)
    rows = jnp.einsum("lhH,HW->lhW", Ay, img,
                      precision=jax.lax.Precision.HIGHEST)
    stack = jnp.einsum("lhW,lwW->lhw", rows, Ax,
                       precision=jax.lax.Precision.HIGHEST)
    # resized levels are quantized to integer intensities, mirroring the
    # reference's 8-bit pyramid (cv::resize in ORBextractor.cc:781-822);
    # level 0 is the input image, passed through untouched
    return jnp.concatenate([stack[:1], jnp.round(stack[1:])], axis=0)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def extract_batched(image: jnp.ndarray, cfg: ExtractorConfig,
                    n_features: int, max_keypoints: int,
                    use_pallas: bool = False) -> FrameFeatures:
    if cfg.patch_size != 2 * patches.HALF_PATCH + 1:
        raise ValueError(
            f"patch_size={cfg.patch_size}: the IC-angle mask and BRIEF "
            f"pattern are generated for {2 * patches.HALF_PATCH + 1}")
    h, w = image.shape
    shapes = level_shapes(cfg, h, w)
    quotas = level_quotas(cfg, n_features)
    L = cfg.n_levels
    H0, W0 = _pad_shape(*shapes[0])
    lh = jnp.asarray([s[0] for s in shapes])
    lw = jnp.asarray([s[1] for s in shapes])

    stack = _build_stack(image, shapes)                  # [L, H0, W0]

    if use_pallas and not cfg.score_harris:
        # fused FAST + NMS + border mask + blur, one kernel for the whole
        # pyramid (ops/fast_pallas.py)
        from ..ops.fast_pallas import fast_nms_blur_stack
        dims = jnp.stack([lh, lw], axis=1).astype(jnp.int32)
        score, blurred_stack = fast_nms_blur_stack(
            stack, dims, float(cfg.fast_threshold_min), cfg.edge_threshold)
    else:
        score = jax.vmap(lambda im: fast.fast_score(
            im, float(cfg.fast_threshold_min)))(stack)
        if cfg.score_harris:
            harris = jax.vmap(fast.harris_score)(stack)
            hmin = jnp.min(harris, axis=(1, 2), keepdims=True)
            score = jnp.where(score > 0, harris - hmin + 1e-3, 0.0)
        score = jax.vmap(fast.nms3x3)(score)

        # mask per-level borders and padding
        b = cfg.edge_threshold
        row = jnp.arange(H0)[None, :, None]
        col = jnp.arange(W0)[None, None, :]
        interior = ((row >= b) & (row < lh[:, None, None] - b)
                    & (col >= b) & (col < lw[:, None, None] - b))
        score = jnp.where(interior, score, 0.0)
        blurred_stack = None

    # two-threshold fallback per cell (ORBextractor.cc:607-614), applied on
    # each level's TRUE extent: gating the padded canvas would grow the
    # effective cell size ~scale_factor^level and put most cells on padding.
    # `shapes` is static, so this unrolls into L static slices in one program.
    if cfg.fast_threshold > cfg.fast_threshold_min:
        gated = []
        for li, (h_l, w_l) in enumerate(shapes):
            g = detect.two_threshold_gate(
                score[li, :h_l, :w_l], float(cfg.fast_threshold),
                cfg.cells_y, cfg.cells_x)
            gated.append(jnp.pad(g, ((0, H0 - h_l), (0, W0 - w_l))))
        score = jnp.stack(gated)

    # per-level selection with a uniform slot count, then per-level quota by
    # rank masking (select_keypoints returns scores sorted descending)
    slot_cap = max(quotas)
    kp = jax.vmap(lambda s: detect.select_keypoints(
        s, slot_cap, cfg.cells_y, cfg.cells_x,
        per_cell=max(4, 4 * slot_cap // (cfg.cells_x * cfg.cells_y)),
    ))(score)                                            # fields [L, slot_cap, ...]
    rank = jnp.arange(slot_cap)[None, :]
    quota_arr = jnp.asarray(quotas)[:, None]
    valid = kp.valid & (rank < quota_arr)

    flat_xy = kp.xy.reshape(L * slot_cap, 2)
    lvl_of = jnp.repeat(jnp.arange(L), slot_cap)
    blurred = (blurred_stack if blurred_stack is not None
               else jax.vmap(patches.gaussian_blur7)(stack))
    # integer-quantized like the reference's 8-bit GaussianBlur output
    # (ORBextractor.cc:137: blur runs on CV_8U); integer pixels also keep
    # the Pallas descriptor kernel's bf16 selection matmuls bit-exact
    blurred = jnp.round(blurred)

    if use_pallas:
        # fused IC-angle + steered-BRIEF kernel: one-hot MXU matmuls on
        # VMEM-resident levels instead of per-keypoint gathers
        from ..ops.describe_pallas import orient_describe
        dims = jnp.stack([lh, lw], axis=1).astype(jnp.int32)
        # valid slots are a rank-ordered prefix: the kernel loops over only
        # the live keypoints of each level (counts), not the slot capacity
        m01, m10, desc = orient_describe(
            stack, blurred, kp.xy, dims,
            counts=jnp.sum(valid, axis=1).astype(jnp.int32))
        angle = jnp.arctan2(m01.reshape(-1), m10.reshape(-1))
        desc = desc.reshape(L * slot_cap, 8)
    else:
        # IC-angle: one gather over the stack for all levels' keypoints
        def gather_stack(stk, xy, size):
            r = size // 2
            cx = jnp.round(xy[:, 0]).astype(jnp.int32)
            cy = jnp.round(xy[:, 1]).astype(jnp.int32)
            d = jnp.arange(-r, r + 1)
            # clamp to the TRUE per-level extent, not the padded one
            ys = jnp.clip(cy[:, None] + d[None, :], 0, lh[lvl_of, None] - 1)
            xs = jnp.clip(cx[:, None] + d[None, :], 0, lw[lvl_of, None] - 1)
            # flattened single-axis take: ~8x faster than 3D advanced
            # indexing on TPU (XLA lowers multi-dim gathers poorly)
            flat = ((lvl_of[:, None, None] * H0 + ys[:, :, None]) * W0
                    + xs[:, None, :])
            return jnp.take(stk.reshape(-1), flat, mode="clip")

        pat = gather_stack(stack, flat_xy, 2 * patches.HALF_PATCH + 1)
        mask = jnp.asarray(patches._IC_MASK)
        pm = pat * mask
        dx = jnp.asarray(patches._IC_DX)
        m10 = jnp.sum(pm * dx[None, None, :], axis=(1, 2))
        m01 = jnp.sum(pm * dx[None, :, None], axis=(1, 2))
        angle = jnp.arctan2(m01, m10)                    # [L*slot_cap]

        # steered BRIEF via one gather over the blurred stack
        ca = jnp.cos(angle)[:, None]
        sa = jnp.sin(angle)[:, None]
        px = jnp.asarray(brief._POINTS[:, 0])[None, :]
        py = jnp.asarray(brief._POINTS[:, 1])[None, :]
        sx = jnp.round(px * ca - py * sa + flat_xy[:, 0:1])
        sy = jnp.round(px * sa + py * ca + flat_xy[:, 1:2])
        xi = jnp.clip(sx.astype(jnp.int32), 0, lw[lvl_of, None] - 1)
        yi = jnp.clip(sy.astype(jnp.int32), 0, lh[lvl_of, None] - 1)
        samples = jnp.take(blurred.reshape(-1),
                           (lvl_of[:, None] * H0 + yi) * W0 + xi,
                           mode="clip")                  # [L*slot_cap, 512]
        bits = (samples[:, 0::2] < samples[:, 1::2]).astype(jnp.uint32)
        weights = (jnp.uint32(1)
                   << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
        desc = jnp.sum(bits.reshape(-1, 8, 32) * weights, axis=-1,
                       dtype=jnp.uint32)

    # assemble level-0-scaled coordinates + fixed-capacity output
    scale = jnp.asarray(cfg.scale_factor ** np.arange(L, dtype=np.float32))
    xy0 = flat_xy * scale[lvl_of, None]
    resp = kp.response.reshape(-1)
    vflat = valid.reshape(-1)

    n = xy0.shape[0]
    if n < max_keypoints:
        pad = max_keypoints - n
        xy0 = jnp.pad(xy0, ((0, pad), (0, 0)))
        resp = jnp.pad(resp, (0, pad))
        angle = jnp.pad(angle, (0, pad))
        lvl_of = jnp.pad(lvl_of, (0, pad))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        vflat = jnp.pad(vflat, (0, pad))
    elif n > max_keypoints:
        resp_m = jnp.where(vflat, resp, -1.0)
        _, idx = jax.lax.top_k(resp_m, max_keypoints)
        xy0, resp, angle = xy0[idx], resp[idx], angle[idx]
        lvl_of, desc, vflat = lvl_of[idx], desc[idx], vflat[idx]

    return FrameFeatures(xy=xy0, response=resp, angle=angle,
                         level=lvl_of.astype(jnp.int32), desc=desc,
                         valid=vflat)


def extract_batched_default(image, cfg: ExtractorConfig,
                            use_pallas: bool = False) -> FrameFeatures:
    return extract_batched(image, cfg, cfg.n_features, cfg.max_keypoints,
                           use_pallas)
