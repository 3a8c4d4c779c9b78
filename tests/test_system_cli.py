"""System CLI end-to-end: a TUM-format dataset on disk -> main() -> TUM
trajectory + ATE evaluation + map visualization."""
import os

import numpy as np
import pytest

from synthetic import rotmat
from test_image_e2e import render_image


@pytest.fixture(scope="module")
def tum_dataset(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("tum_seq")
    (root / "rgb").mkdir()
    rng = np.random.default_rng(7)
    n_pts = 500
    X = np.stack([
        rng.uniform(-6, 6, n_pts),
        rng.uniform(-3.5, 3.5, n_pts),
        rng.uniform(4, 10, n_pts),
    ], 1).astype(np.float32)
    patches = rng.uniform(0, 255, (n_pts, 9, 9)).astype(np.float32)
    K = np.array([[517.3, 0, 318.6], [0, 516.5, 255.3], [0, 0, 1]], np.float32)

    rgb_lines, gt_lines = [], []
    for i in range(16):
        R = rotmat([0, 1, 0], np.radians(0.3 * i))
        t = np.array([-0.09 * i, 0.0, 0.01 * i], np.float32)
        img = render_image(X, patches, R, t, K)
        name = f"rgb/{i:04d}.png"
        Image.fromarray(img.astype(np.uint8)).save(root / name)
        ts = i / 30.0
        rgb_lines.append(f"{ts:.4f} {name}")
        C = -R.T @ t
        gt_lines.append(f"{ts:.4f} {C[0]:.6f} {C[1]:.6f} {C[2]:.6f} 0 0 0 1")
    (root / "rgb.txt").write_text("# ts path\n" + "\n".join(rgb_lines) + "\n")
    (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    return str(root)


def test_cli_main_runs_end_to_end(tum_dataset, tmp_path, capsys):
    from orb_slam_tpu.pipeline import system

    out_dir = str(tmp_path / "results")
    system.main([
        "--dataset", "tum", "--root", tum_dataset, "--calib", "fr1",
        "--out-dir", out_dir, "--viz",
    ])
    captured = capsys.readouterr().out
    assert "map_initialized" in captured
    traj_path = os.path.join(out_dir, "KeyFrameTrajectory.txt")
    assert os.path.exists(traj_path)
    rows = open(traj_path).read().strip().split("\n")
    assert len(rows) >= 2 and len(rows[0].split()) == 8
    assert os.path.getsize(os.path.join(out_dir, "map.png")) > 1000
    assert "fps" in captured
