"""Fused Pallas FAST+NMS+blur kernel vs the XLA reference (interpret mode)."""
import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.ops import fast, patches
from orb_slam_tpu.ops.fast_pallas import fast_nms_blur_stack
from test_extractor import synthetic_corners_image


def run_stack(imgs_np, dims, threshold=7.0, border=16):
    L = len(imgs_np)
    H = max(i.shape[0] for i in imgs_np)
    W = max(i.shape[1] for i in imgs_np)
    # pad H to a tile multiple
    tile = 64
    H = -(-H // tile) * tile
    W = -(-W // 128) * 128
    stack = np.zeros((L, H, W), np.float32)
    for l, im in enumerate(imgs_np):
        stack[l, : im.shape[0], : im.shape[1]] = im
    return fast_nms_blur_stack(
        jnp.asarray(stack), jnp.asarray(dims, jnp.int32), threshold, border,
        tile_rows=tile, interpret=True)


def test_matches_xla_reference(rng):
    img, _ = synthetic_corners_image(h=120, w=160, rng=rng, n_squares=12)
    img2 = rng.uniform(0, 255, (100, 130)).astype(np.float32)
    score, blur = run_stack([img, img2], [[120, 160], [100, 130]])
    score = np.asarray(score)
    blur = np.asarray(blur)

    b = 16
    for l, im in enumerate([img, img2]):
        h, w = im.shape
        ref = np.asarray(fast.nms3x3(fast.fast_score(jnp.asarray(im), 7.0)))
        # interior comparison (kernel masks the border itself)
        ref_int = ref[b:h - b, b:w - b]
        got_int = score[l, b:h - b, b:w - b]
        np.testing.assert_allclose(got_int, ref_int, atol=1e-4)
        # outside the true level extent the score must be zero
        assert score[l, h:, :].max(initial=0) == 0
        assert score[l, :, w:].max(initial=0) == 0

        ref_blur = np.asarray(patches.gaussian_blur7(jnp.asarray(im)))
        got_blur = blur[l, :h, :w]
        # identical away from borders/tile seams' halo-clamp region
        np.testing.assert_allclose(
            got_blur[8:h - 8, 8:w - 8], ref_blur[8:h - 8, 8:w - 8], atol=1e-3)
