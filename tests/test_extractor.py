import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.config import ExtractorConfig
from orb_slam_tpu.frontend import extractor
from orb_slam_tpu.ops import fast, patches, brief, detect


def synthetic_corners_image(h=120, w=160, rng=None, n_squares=12):
    """Image with bright axis-aligned squares on a non-overlapping grid ->
    strong, known corners."""
    rng = rng or np.random.default_rng(0)
    img = np.full((h, w), 30.0, np.float32)
    corners = []
    cell = 30
    count = 0
    for gy in range(20, h - cell, cell):
        for gx in range(20, w - cell, cell):
            if count >= n_squares:
                break
            s = int(rng.integers(10, 18))
            y = gy + int(rng.integers(0, cell - s - 1))
            x = gx + int(rng.integers(0, cell - s - 1))
            img[y : y + s, x : x + s] = 200.0
            corners += [(x, y), (x + s - 1, y), (x, y + s - 1), (x + s - 1, y + s - 1)]
            count += 1
    return img, corners


def test_fast_detects_square_corners(rng):
    img, corners = synthetic_corners_image(rng=rng)
    score = fast.nms3x3(fast.fast_score(jnp.asarray(img), 20.0))
    s = np.asarray(score)
    hits = 0
    for (x, y) in corners:
        if s[max(y - 2, 0) : y + 3, max(x - 2, 0) : x + 3].max() > 0:
            hits += 1
    assert hits >= len(corners) * 0.75, f"only {hits}/{len(corners)} corners found"


def test_fast_no_corners_on_flat():
    img = jnp.full((64, 64), 100.0)
    score = fast.fast_score(img, 7.0)
    assert float(jnp.max(score)) == 0.0


def test_fast_score_is_max_passing_threshold():
    img, _ = synthetic_corners_image()
    s20 = np.asarray(fast.fast_score(jnp.asarray(img), 20.0)) > 0
    s7 = np.asarray(fast.fast_score(jnp.asarray(img), 7.0))
    # every th-20 corner must appear in the th-7 map with score > 20
    assert np.all(s7[s20] > 20.0)


def test_nms_keeps_single_peak():
    img = np.zeros((32, 32), np.float32)
    img[10:14, 10:14] = [[1, 2, 3, 1], [2, 5, 9, 2], [3, 8, 4, 1], [1, 2, 1, 1]]
    out = np.asarray(fast.nms3x3(jnp.asarray(img)))
    assert (out[10:14, 10:14] > 0).sum() == 1


def test_select_keypoints_spatial_spread():
    score = np.zeros((100, 100), np.float32)
    # 50 strong corners all in one cell; 5 weak spread out
    rng = np.random.default_rng(1)
    for _ in range(50):
        score[rng.integers(0, 10), rng.integers(0, 10)] = 100.0
    weak = [(50, 50), (80, 20), (20, 80), (90, 90), (60, 10)]
    for (y, x) in weak:
        score[y, x] = 10.0
    kp = detect.select_keypoints(jnp.asarray(score), 20, 5, 5, per_cell=8)
    sel = np.asarray(kp.xy)[np.asarray(kp.valid)]
    # the weak-but-isolated corners must survive the per-cell cap
    for (y, x) in weak:
        assert any((abs(sel[:, 0] - x) < 1) & (abs(sel[:, 1] - y) < 1)), (y, x)


def test_ic_angle_gradient_direction():
    # bright half-plane to the right -> centroid along +x -> angle ~ 0
    img = np.zeros((64, 64), np.float32)
    img[:, 32:] = 200.0
    a = float(patches.ic_angle(jnp.asarray(img), jnp.asarray([[32.0, 32.0]]))[0])
    assert abs(a) < 0.1
    # bright half below -> angle ~ +pi/2 (y down)
    img2 = np.zeros((64, 64), np.float32)
    img2[32:, :] = 200.0
    a2 = float(patches.ic_angle(jnp.asarray(img2), jnp.asarray([[32.0, 32.0]]))[0])
    assert abs(a2 - np.pi / 2) < 0.1


def test_gaussian_blur_preserves_mean(rng):
    img = jnp.asarray(rng.uniform(0, 255, (64, 64)).astype(np.float32))
    out = patches.gaussian_blur7(img)
    assert abs(float(jnp.mean(out)) - float(jnp.mean(img))) < 1.0
    assert float(jnp.std(out)) < float(jnp.std(img))


def test_brief_rotation_invariance_with_steering(rng):
    """Descriptor of a pattern and its 90deg-rotated copy should be close when
    angles are supplied (steering compensates the rotation)."""
    img, _ = synthetic_corners_image(rng=rng)
    blurred = patches.gaussian_blur7(jnp.asarray(img))
    xy = jnp.asarray([[80.0, 60.0]])
    d0 = brief.brief_descriptors(blurred, xy, jnp.asarray([0.0]))
    # rotate image 90 deg about center, keypoint moves accordingly
    img_r = np.rot90(np.asarray(blurred), k=-1).copy()  # (x,y)->(H-1-y, x)
    h = img_r.shape[0]
    xy_r = jnp.asarray([[img.shape[0] - 1 - 60.0, 80.0]])
    d1 = brief.brief_descriptors(jnp.asarray(img_r), xy_r, jnp.asarray([np.pi / 2]))
    ham = bin(int(np.bitwise_xor(np.asarray(d0), np.asarray(d1)).astype(object).sum() and 0) or 0)
    # compute hamming properly
    x = np.bitwise_xor(np.asarray(d0, np.uint32), np.asarray(d1, np.uint32))
    dist = sum(bin(int(v)).count("1") for v in x.ravel())
    assert dist < 80, f"steered distance {dist} too high"
    # sanity: unsteered must be clearly worse
    d1u = brief.brief_descriptors(jnp.asarray(img_r), xy_r, jnp.asarray([0.0]))
    xu = np.bitwise_xor(np.asarray(d0, np.uint32), np.asarray(d1u, np.uint32))
    dist_u = sum(bin(int(v)).count("1") for v in xu.ravel())
    assert dist < dist_u


def test_extract_end_to_end(rng):
    img, _ = synthetic_corners_image(h=240, w=320, rng=rng, n_squares=30)
    cfg = ExtractorConfig(n_features=200, max_keypoints=256, n_levels=4)
    feats = extractor.extract_default(jnp.asarray(img), cfg)
    nv = int(jnp.sum(feats.valid))
    assert nv > 40, f"only {nv} keypoints"
    assert feats.xy.shape == (256, 2)
    assert feats.desc.shape == (256, 8)
    assert feats.desc.dtype == jnp.uint32
    sel = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[sel]
    assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240
    lev = np.asarray(feats.level)[sel]
    assert lev.max() >= 1, "no multi-scale detections"


def test_level_quotas_sum():
    cfg = ExtractorConfig()
    q = extractor.level_quotas(cfg, 1000)
    assert sum(q) == 1000
    assert q[0] > q[-1]


def test_fast_score_matches_numpy_golden(rng):
    """Independent exhaustive numpy FAST-9 (literal per-pixel arc scan, no
    shared code with ops/fast.py) must agree with the vectorized score map —
    stage-level golden check standing in for a reference binary."""
    from orb_slam_tpu.ops.fast import CIRCLE, ARC_LEN, fast_score

    img = rng.uniform(0, 255, (48, 56)).astype(np.float32)
    th = 12.0

    def golden(img, th):
        h, w = img.shape
        out = np.zeros((h, w), np.float32)
        for y in range(3, h - 3):
            for x in range(3, w - 3):
                c = img[y, x]
                margins_b = np.array(
                    [img[y + dy, x + dx] - c for dx, dy in CIRCLE])
                margins_d = -margins_b
                best = 0.0
                for margins in (margins_b, margins_d):
                    ext = np.concatenate([margins, margins])
                    for i in range(16):
                        m = ext[i:i + ARC_LEN].min()
                        if m > best:
                            best = m
                if best >= th:
                    out[y, x] = best
        return out

    ours = np.asarray(fast_score(jnp.asarray(img), th))
    ref = golden(img, th)
    # interior only (the vectorized map zeroes the 3 px border identically)
    np.testing.assert_allclose(ours[3:-3, 3:-3], ref[3:-3, 3:-3],
                               rtol=0, atol=1e-4)


def test_ic_angle_and_brief_match_numpy_golden(rng):
    """Literal per-keypoint numpy IC_Angle + steered-BRIEF (the reference's
    algorithm written independently: circular-mask moments, cvRound'd
    rotated pattern, little-endian bit packing) must agree with the batched
    kernels."""
    from orb_slam_tpu.ops import patches as pat
    from orb_slam_tpu.ops import brief as br

    img = rng.uniform(0, 255, (96, 128)).astype(np.float32)
    xy = np.stack([rng.uniform(20, 108, 12), rng.uniform(20, 76, 12)],
                  1).astype(np.float32)

    ours_ang = np.asarray(pat.ic_angle(jnp.asarray(img), jnp.asarray(xy)))
    ours_desc = np.asarray(br.brief_descriptors(
        jnp.asarray(img), jnp.asarray(xy), jnp.asarray(ours_ang)))

    r = pat.HALF_PATCH
    pts = np.asarray(br._POINTS, np.float64)
    for n in range(len(xy)):
        cx, cy = int(round(xy[n, 0])), int(round(xy[n, 1]))
        m10 = m01 = 0.0
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dx * dx + dy * dy <= r * r:
                    v = img[cy + dy, cx + dx]
                    m10 += dx * v
                    m01 += dy * v
        ang = np.arctan2(m01, m10)
        assert abs(np.angle(np.exp(1j * (ang - ours_ang[n])))) < 1e-4, n

        ca, sa = np.cos(ang), np.sin(ang)
        words = np.zeros(8, np.uint32)
        for j in range(256):
            def sample(p):
                sx = int(round(p[0] * ca - p[1] * sa + xy[n, 0]))
                sy = int(round(p[0] * sa + p[1] * ca + xy[n, 1]))
                return img[np.clip(sy, 0, 95), np.clip(sx, 0, 127)]
            bit = sample(pts[2 * j]) < sample(pts[2 * j + 1])
            if bit:
                words[j // 32] |= np.uint32(1) << np.uint32(j % 32)
        ham = sum(bin(int(v)).count("1")
                  for v in np.bitwise_xor(words, ours_desc[n]))
        # float rounding at .5 boundaries can flip an isolated sample
        assert ham <= 1, (n, ham)


def test_two_threshold_gate_matches_numpy_golden(rng):
    """Literal per-cell numpy reproduction of ORBextractor.cc:607-614:
    detect at hi per cell; cells with no hi corner keep their low-threshold
    corners."""
    from orb_slam_tpu.ops.detect import two_threshold_gate

    h, w, cy, cx = 40, 60, 4, 5
    score = np.zeros((h, w), np.float32)
    idx = rng.choice(h * w, 120, replace=False)
    score.flat[idx] = rng.uniform(5, 40, 120)
    hi = 20.0

    ours = np.asarray(two_threshold_gate(jnp.asarray(score), hi, cy, cx))

    ch, cw = -(-h // cy), -(-w // cx)
    ref = score.copy()
    for iy in range(cy):
        for ix in range(cx):
            blk = score[iy*ch:(iy+1)*ch, ix*cw:(ix+1)*cw]
            if (blk > hi).any():
                out = np.where(blk <= hi, 0.0, blk)
                ref[iy*ch:(iy+1)*ch, ix*cw:(ix+1)*cw] = out
    np.testing.assert_array_equal(ours, ref)
