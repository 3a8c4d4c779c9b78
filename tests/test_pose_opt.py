import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.config import CameraConfig, SolverConfig
from orb_slam_tpu.geometry import camera, se3
from orb_slam_tpu.solvers import pose_opt
from synthetic import make_scene, rotmat


def make_cam():
    return camera.make_camera(
        CameraConfig(fx=500, fy=500, cx=320, cy=240,
                     k1=0, k2=0, p1=0, p2=0, k3=0, width=640, height=480)
    )


def setup(rng, n=300, noise=0.5, outlier_frac=0.0):
    X = make_scene(rng, n)
    cam = make_cam()
    R_gt = rotmat([0.2, 1.0, 0.1], np.radians(8.0))
    t_gt = np.array([0.4, -0.1, 0.3], np.float32)
    xc = X @ R_gt.T + t_gt
    uv = np.stack(
        [500 * xc[:, 0] / xc[:, 2] + 320, 500 * xc[:, 1] / xc[:, 2] + 240], axis=1
    )
    uv += rng.normal(0, noise, uv.shape)
    is_out = np.zeros(n, bool)
    k = int(outlier_frac * n)
    if k:
        idx = rng.choice(n, k, replace=False)
        uv[idx] += rng.uniform(20, 120, (k, 2)) * rng.choice([-1, 1], (k, 2))
        is_out[idx] = True
    return X, uv.astype(np.float32), R_gt, t_gt, cam, is_out


def pose_err(R, t, R_gt, t_gt):
    dR = np.asarray(R) @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    return ang, np.linalg.norm(np.asarray(t) - t_gt)


def test_converges_from_perturbed_pose(rng):
    X, uv, R_gt, t_gt, cam, _ = setup(rng, noise=0.3)
    # perturb ground truth by a motion-model-sized error
    dxi = jnp.asarray([0.05, -0.03, 0.08, 0.02, -0.015, 0.01])
    R0, t0 = se3.retract(jnp.asarray(R_gt), jnp.asarray(t_gt), dxi)
    res = pose_opt.optimize_pose(
        R0, t0, jnp.asarray(X), jnp.asarray(uv),
        jnp.ones(X.shape[0]), jnp.ones(X.shape[0], bool), cam,
    )
    ang, terr = pose_err(res.R, res.t, R_gt, t_gt)
    assert ang < 0.1, f"rot err {ang} deg"
    assert terr < 0.01, f"trans err {terr}"
    assert int(res.n_inliers) > 280


def test_rejects_outliers(rng):
    X, uv, R_gt, t_gt, cam, is_out = setup(rng, noise=0.4, outlier_frac=0.3)
    dxi = jnp.asarray([0.03, 0.02, -0.04, 0.01, 0.02, -0.01])
    R0, t0 = se3.retract(jnp.asarray(R_gt), jnp.asarray(t_gt), dxi)
    res = pose_opt.optimize_pose(
        R0, t0, jnp.asarray(X), jnp.asarray(uv),
        jnp.ones(X.shape[0]), jnp.ones(X.shape[0], bool), cam,
    )
    ang, terr = pose_err(res.R, res.t, R_gt, t_gt)
    assert ang < 0.15, f"rot err {ang} deg with outliers"
    assert terr < 0.02, f"trans err {terr} with outliers"
    inl = np.asarray(res.inliers)
    # outliers classified out
    assert inl[is_out].sum() <= 2
    assert inl[~is_out].sum() > 0.9 * (~is_out).sum()


def test_respects_valid_mask(rng):
    X, uv, R_gt, t_gt, cam, _ = setup(rng, noise=0.3)
    # corrupt half the observations but mask them invalid
    n = X.shape[0]
    uv2 = uv.copy()
    uv2[: n // 2] += 500.0
    valid = np.arange(n) >= n // 2
    res = pose_opt.optimize_pose(
        jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.asarray(X), jnp.asarray(uv2),
        jnp.ones(n), jnp.asarray(valid), cam,
    )
    ang, terr = pose_err(res.R, res.t, R_gt, t_gt)
    assert ang < 0.1 and terr < 0.01
    assert not np.any(np.asarray(res.inliers)[: n // 2])


def test_few_points_no_nan(rng):
    """Degenerate: 4 points only — must stay finite."""
    X, uv, R_gt, t_gt, cam, _ = setup(rng, n=300, noise=0.1)
    valid = np.arange(300) < 4
    res = pose_opt.optimize_pose(
        jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.asarray(X), jnp.asarray(uv),
        jnp.ones(300), jnp.asarray(valid), cam,
    )
    assert np.all(np.isfinite(np.asarray(res.R)))
    assert np.all(np.isfinite(np.asarray(res.t)))
