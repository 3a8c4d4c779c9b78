"""Level-batched extractor must agree with the per-level reference path."""
import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.config import ExtractorConfig
from orb_slam_tpu.frontend import extractor, extractor_batched
from test_extractor import synthetic_corners_image


def keypoint_set(feats):
    v = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[v]
    lev = np.asarray(feats.level)[v]
    return {(round(float(x), 1), round(float(y), 1), int(l))
            for (x, y), l in zip(xy, lev)}


def test_batched_matches_per_level(rng):
    img, _ = synthetic_corners_image(h=240, w=320, rng=rng, n_squares=30)
    cfg = ExtractorConfig(n_features=200, max_keypoints=256, n_levels=4)
    a = extractor.extract_default(jnp.asarray(img), cfg)
    b = extractor_batched.extract_batched_default(jnp.asarray(img), cfg)
    sa, sb = keypoint_set(a), keypoint_set(b)
    inter = len(sa & sb)
    # selection order/per-cell ties may differ slightly; demand high overlap
    assert inter >= 0.9 * min(len(sa), len(sb)), (len(sa), len(sb), inter)


def test_batched_descriptors_match_for_common_keypoints(rng):
    img, _ = synthetic_corners_image(h=240, w=320, rng=rng, n_squares=30)
    cfg = ExtractorConfig(n_features=200, max_keypoints=256, n_levels=4)
    a = extractor.extract_default(jnp.asarray(img), cfg)
    b = extractor_batched.extract_batched_default(jnp.asarray(img), cfg)

    bk = {}
    vb = np.asarray(b.valid)
    for i in np.where(vb)[0]:
        key = (round(float(b.xy[i, 0]), 1), round(float(b.xy[i, 1]), 1),
               int(b.level[i]))
        bk[key] = np.asarray(b.desc[i])
    va = np.asarray(a.valid)
    n_checked = 0
    for i in np.where(va)[0]:
        key = (round(float(a.xy[i, 0]), 1), round(float(a.xy[i, 1]), 1),
               int(a.level[i]))
        if key in bk:
            da = np.asarray(a.desc[i])
            x = np.bitwise_xor(da, bk[key])
            ham = sum(bin(int(v)).count("1") for v in x)
            assert ham <= 8, f"descriptor mismatch {ham} bits at {key}"
            n_checked += 1
    assert n_checked > 30


def test_batched_full_size(rng):
    img = rng.uniform(0, 255, (480, 640)).astype(np.float32)
    cfg = ExtractorConfig()
    f = extractor_batched.extract_batched_default(jnp.asarray(img), cfg)
    assert int(f.valid.sum()) > 500
    v = np.asarray(f.valid)
    assert np.asarray(f.xy)[v][:, 0].max() < 640
    assert np.asarray(f.level)[v].max() >= 1


def test_matmul_resize_matches_jax_image_resize(rng):
    """The MXU-matmul pyramid build must reproduce jax.image.resize
    (linear, antialiased) to float tolerance at every level."""
    import jax
    from orb_slam_tpu.frontend.extractor_batched import _build_stack
    from orb_slam_tpu.ops.resize import resize_matrix
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    cfg = ExtractorConfig(n_levels=5)
    shapes = extractor.level_shapes(cfg, *img.shape)
    stack = np.asarray(_build_stack(jnp.asarray(img), shapes))
    for li, (lh, lw) in enumerate(shapes):
        want = np.asarray(jax.image.resize(jnp.asarray(img), (lh, lw),
                                           method="linear"))
        got = stack[li, :lh, :lw]
        # levels > 0 are quantized to integer intensities (8-bit pyramid
        # parity with the reference), so allow the 0.5 rounding step
        tol = 5e-3 if li == 0 else 0.5 + 5e-3
        assert np.max(np.abs(got - want)) < tol, li
        # padding region stays exactly zero
        assert np.all(stack[li, lh:, :] == 0) and np.all(stack[li, :, lw:] == 0)
    # weight rows are a partition of unity
    A = resize_matrix(120, 57)
    np.testing.assert_allclose(A.sum(axis=1), 1.0, atol=1e-6)
