"""Coverage for secondary paths: Harris scoring, KITTI reader, frame viz."""
import os

import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.config import ExtractorConfig
from orb_slam_tpu.frontend import extractor
from orb_slam_tpu.ops import fast
from test_extractor import synthetic_corners_image


def test_harris_rescoring_path(rng):
    """nScoreType=0 (Harris) re-scores FAST corners (ORBextractor.cc:79-120,
    616-620): detection set stays similar, ordering changes."""
    img, corners = synthetic_corners_image(h=240, w=320, rng=rng, n_squares=20)
    cfg = ExtractorConfig(n_features=150, max_keypoints=256, n_levels=3,
                          score_harris=True)
    feats = extractor.extract_default(jnp.asarray(img), cfg)
    nv = int(feats.valid.sum())
    assert nv > 30
    sel = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[sel]
    # detected keypoints still land near the true square corners
    hits = 0
    for (x, y) in corners:
        if np.any((np.abs(xy[:, 0] - x) < 3) & (np.abs(xy[:, 1] - y) < 3)):
            hits += 1
    assert hits >= len(corners) * 0.4


def test_harris_response_shape(rng):
    img = jnp.asarray(rng.uniform(0, 255, (64, 64)).astype(np.float32))
    h = fast.harris_score(img)
    assert h.shape == (64, 64)
    # corner-free flat image: response ~ 0
    flat = fast.harris_score(jnp.full((64, 64), 100.0))
    assert float(jnp.abs(flat).max()) < 1e-2


def test_kitti_reader(tmp_path):
    from PIL import Image
    from orb_slam_tpu.dataio.datasets import KittiSequence
    root = tmp_path / "00"
    (root / "image_0").mkdir(parents=True)
    for i in range(4):
        Image.new("L", (40, 30), color=i * 20).save(
            root / "image_0" / f"{i:06d}.png")
    (root / "times.txt").write_text("\n".join(str(0.1 * i) for i in range(4)))
    poses = np.tile(np.eye(3, 4).reshape(-1), (4, 1))
    np.savetxt(root / "poses.txt", poses)

    seq = KittiSequence.open(str(root))
    assert len(seq) == 4
    ts, img = next(iter(seq.frames()))
    assert img.shape == (30, 40)
    gt = seq.groundtruth_poses()
    assert gt.shape == (4, 3, 4)


def test_frame_debug_export(tmp_path, rng):
    from orb_slam_tpu.utils.viz import export_frame_png
    img, _ = synthetic_corners_image(h=120, w=160, rng=rng)
    cfg = ExtractorConfig(n_features=80, max_keypoints=128, n_levels=2)
    feats = extractor.extract_default(jnp.asarray(img), cfg)
    p = str(tmp_path / "frame.png")
    tracked = np.asarray(feats.valid) & (rng.uniform(size=feats.n) > 0.5)
    export_frame_png(p, img, feats, assoc_valid=tracked, status="WORKING")
    assert os.path.getsize(p) > 5000
