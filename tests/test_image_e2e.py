"""Full-stack integration: images in -> trajectory out (extractor + tracker
+ mapper, no feature injection).  Renders a synthetic textured scene: each
landmark is a fixed random patch stamped at its projected location, so the
real FAST/BRIEF front end must re-detect and re-match it across frames."""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam_tpu.config import (
    CameraConfig, ExtractorConfig, MapConfig, MatcherConfig, SystemConfig,
)
from orb_slam_tpu.pipeline.system import System
from orb_slam_tpu.pipeline.tracker import TrackState
from synthetic import rotmat


def render_image(X, patches, R, t, K, width=640, height=480, patch=9):
    img = np.full((height, width), 90.0, np.float32)
    xc = X @ R.T + t
    z = xc[:, 2]
    uv = np.stack([K[0, 0] * xc[:, 0] / np.maximum(z, 1e-6) + K[0, 2],
                   K[1, 1] * xc[:, 1] / np.maximum(z, 1e-6) + K[1, 2]], 1)
    r = patch // 2
    order = np.argsort(-z)  # painter's algorithm: far first
    for i in order:
        if z[i] < 0.5:
            continue
        u, v = int(round(uv[i, 0])), int(round(uv[i, 1]))
        if r <= u < width - r and r <= v < height - r:
            img[v - r:v + r + 1, u - r:u + r + 1] = patches[i]
    return img


@pytest.fixture(scope="module")
def image_run():
    rng = np.random.default_rng(5)
    n_pts = 500
    X = np.stack([
        rng.uniform(-6, 6, n_pts),
        rng.uniform(-3.5, 3.5, n_pts),
        rng.uniform(4, 10, n_pts),
    ], 1).astype(np.float32)
    patches = rng.uniform(0, 255, (n_pts, 9, 9)).astype(np.float32)

    cfg = SystemConfig(
        camera=CameraConfig(fx=500, fy=500, cx=320, cy=240,
                            k1=0, k2=0, p1=0, p2=0, k3=0,
                            width=640, height=480),
        extractor=ExtractorConfig(n_features=600, max_keypoints=640,
                                  n_levels=4),
        matcher=MatcherConfig(window_init=120),
        map=MapConfig(max_keyframes=32, max_points=4096,
                      local_ba_max_kfs=8, local_ba_max_fixed=8,
                      local_ba_max_points=2048),
    )
    system = System.create(cfg)
    K = cfg.camera.K
    logs = []
    n_frames = 20
    for i in range(n_frames):
        R = rotmat([0, 1, 0], np.radians(0.3 * i))
        t = np.array([-0.08 * i, 0.0, 0.01 * i], np.float32)
        img = render_image(X, patches, R, t, K)
        logs.append(system.process_image(img, timestamp=i / 30.0))
    return dict(system=system, logs=logs)


def test_image_pipeline_initializes(image_run):
    events = [l.get("event") for l in image_run["logs"]]
    assert "map_initialized" in events, f"events: {events}"


def test_image_pipeline_tracks(image_run):
    system = image_run["system"]
    assert system.tracker.state == TrackState.WORKING
    tracked = [r for r in system.tracker.trajectory if r.tracked]
    assert len(tracked) >= 12, f"tracked {len(tracked)} frames"
    assert system.tracker.slam_map.n_mp > 50


def test_image_pipeline_trajectory_direction(image_run):
    """t_cw = [-0.08 i, ...] means the camera CENTER -R^T t moves along +x:
    the recovered (scaled) trajectory must agree in direction."""
    system = image_run["system"]
    centers = [(-r.R.T @ r.t) for r in system.tracker.trajectory if r.tracked]
    d = centers[-1] - centers[0]
    d = d / np.linalg.norm(d)
    assert d[0] > 0.9, f"direction {d}"
