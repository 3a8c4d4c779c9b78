import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_tpu.solvers import pnp
from synthetic import make_scene, default_K, rotmat


def setup(rng, n=200, noise=0.5, outlier_frac=0.3):
    X = make_scene(rng, n)
    K = default_K()
    R_gt = rotmat([0.3, 1.0, -0.2], np.radians(25.0))
    t_gt = np.array([0.5, -0.3, 1.0], np.float32)
    xc = X @ R_gt.T + t_gt
    uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
                   500 * xc[:, 1] / xc[:, 2] + 240], 1)
    uv += rng.normal(0, noise, uv.shape)
    k = int(outlier_frac * n)
    out = rng.choice(n, k, replace=False)
    uv[out] = rng.uniform([0, 0], [640, 480], (k, 2))
    is_out = np.zeros(n, bool)
    is_out[out] = True
    return X, uv.astype(np.float32), R_gt, t_gt, K, is_out


def test_recovers_pose_with_outliers(rng):
    X, uv, R_gt, t_gt, K, is_out = setup(rng)
    res = pnp.pnp_ransac(
        jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(uv),
        jnp.ones(len(X)), jnp.ones(len(X), bool), jnp.asarray(K))
    assert bool(res.ok)
    dR = np.asarray(res.R) @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0, f"rot err {ang}"
    assert np.linalg.norm(np.asarray(res.t) - t_gt) < 0.05
    inl = np.asarray(res.inliers)
    assert inl[is_out].mean() < 0.05
    assert inl[~is_out].mean() > 0.8


def test_fails_gracefully_all_outliers(rng):
    X, uv, R_gt, t_gt, K, _ = setup(rng, outlier_frac=1.0)
    res = pnp.pnp_ransac(
        jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(uv),
        jnp.ones(len(X)), jnp.ones(len(X), bool), jnp.asarray(K),
        min_inliers=20)
    assert not bool(res.ok)


def test_respects_valid_mask(rng):
    X, uv, R_gt, t_gt, K, _ = setup(rng, outlier_frac=0.0)
    valid = np.arange(len(X)) < 30
    res = pnp.pnp_ransac(
        jax.random.PRNGKey(1), jnp.asarray(X), jnp.asarray(uv),
        jnp.ones(len(X)), jnp.asarray(valid), jnp.asarray(K))
    inl = np.asarray(res.inliers)
    assert not inl[~valid].any()
    assert bool(res.ok)
