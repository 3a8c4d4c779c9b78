import jax.numpy as jnp
import numpy as np

from orb_slam_tpu.config import CameraConfig, tum_freiburg1_config
from orb_slam_tpu.geometry import camera


def make_cam(**kw):
    return camera.make_camera(CameraConfig(**kw))


def test_project_unproject_roundtrip(rng):
    cam = make_cam()
    uv = jnp.asarray(rng.uniform([50, 50], [700, 430], size=(128, 2)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0.5, 10.0, size=(128,)), jnp.float32)
    xc = camera.unproject(uv, depth, cam)
    uv2 = camera.project(xc, cam)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)


def test_distort_undistort_roundtrip(rng):
    cfg = tum_freiburg1_config()
    cam = camera.make_camera(cfg.camera)
    xn = jnp.asarray(rng.uniform(-0.4, 0.4, size=(256, 2)), jnp.float32)
    xd = camera.distort_normalized(xn, cam.dist)
    xu = camera.undistort_normalized(xd, cam.dist)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(xn), atol=1e-4)


def test_undistort_pixels_identity_when_no_distortion(rng):
    cam = make_cam(k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0)
    uv = jnp.asarray(rng.uniform(0, 400, size=(64, 2)), jnp.float32)
    und = camera.undistort_pixels(uv, cam)
    np.testing.assert_allclose(np.asarray(und), np.asarray(uv), atol=1e-4)


def test_bounds_widen_with_barrel_distortion():
    cfg = tum_freiburg1_config()
    cam = camera.make_camera(cfg.camera)
    # fr1 has strong distortion: undistorted bounds differ from raw image
    assert float(cam.min_x) != 0.0 or float(cam.max_x) != cfg.camera.width


def test_in_image():
    cam = make_cam(k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0)
    uv = jnp.asarray([[10.0, 10.0], [-1.0, 5.0], [800.0, 100.0], [100.0, 100.0]])
    m = camera.in_image(uv, cam)
    assert list(np.asarray(m)) == [True, False, False, True]


def test_bearings_unit_z():
    cam = make_cam()
    uv = jnp.asarray([[float(cam.cx), float(cam.cy)]])
    b = camera.bearings(uv, cam)
    np.testing.assert_allclose(np.asarray(b), [[0.0, 0.0, 1.0]], atol=1e-6)
