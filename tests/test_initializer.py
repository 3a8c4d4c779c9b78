import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_tpu.config import InitializerConfig
from orb_slam_tpu.solvers import initializer
from synthetic import two_view_pair


def run_init(rng, planar=False, **kw):
    pair = two_view_pair(rng, **kw, planar=planar)
    key = jax.random.PRNGKey(7)
    res = initializer.initialize(
        key,
        jnp.asarray(pair["uv1"]),
        jnp.asarray(pair["uv2"]),
        jnp.asarray(pair["valid"]),
        jnp.asarray(pair["K"]),
        InitializerConfig(),
    )
    return pair, res


def check_pose(pair, res, rot_tol_deg=1.0, t_tol=0.08):
    R_est = np.asarray(res.R)
    t_est = np.asarray(res.t)
    R_gt, t_gt = pair["R"], pair["t"]
    dR = R_est @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    t_dir_gt = t_gt / np.linalg.norm(t_gt)
    # translation is up to scale and sign-resolved by cheirality
    cos_t = abs(np.dot(t_est, t_dir_gt))
    assert ang < rot_tol_deg, f"rotation error {ang} deg"
    assert cos_t > 1 - t_tol, f"translation direction cos {cos_t}"


def test_general_scene_uses_fundamental(rng):
    pair, res = run_init(rng, n_points=400, outlier_frac=0.1)
    assert bool(res.ok)
    assert not bool(res.used_homography)
    check_pose(pair, res)
    assert int(res.n_good) > 200


def test_planar_scene_uses_homography(rng):
    pair, res = run_init(rng, planar=True, n_points=400, outlier_frac=0.05)
    assert bool(res.ok)
    assert bool(res.used_homography)
    check_pose(pair, res, rot_tol_deg=1.5)


def test_triangulated_points_match_scene(rng):
    pair, res = run_init(rng, n_points=400, outlier_frac=0.0, noise=0.2)
    assert bool(res.ok)
    good = np.asarray(res.good)
    X_est = np.asarray(res.points)[good]
    X_gt = pair["X"][good]
    # estimated map is scaled; normalize both by median depth
    s = np.median(X_gt[:, 2]) / np.median(X_est[:, 2])
    err = np.linalg.norm(X_est * s - X_gt, axis=1)
    assert np.median(err) < 0.15, f"median point error {np.median(err)}"


def test_pure_rotation_rejected(rng):
    """No parallax -> initializer must refuse (reference parallax gate)."""
    pair = two_view_pair(rng, baseline=0.0, rot_deg=5.0, noise=0.3,
                         outlier_frac=0.0)
    res = initializer.initialize(
        jax.random.PRNGKey(3),
        jnp.asarray(pair["uv1"]),
        jnp.asarray(pair["uv2"]),
        jnp.asarray(pair["valid"]),
        jnp.asarray(pair["K"]),
        InitializerConfig(),
    )
    assert not bool(res.ok)


def test_too_few_matches_rejected(rng):
    pair = two_view_pair(rng, n_points=60, outlier_frac=0.5)
    res = initializer.initialize(
        jax.random.PRNGKey(3),
        jnp.asarray(pair["uv1"]),
        jnp.asarray(pair["uv2"]),
        jnp.asarray(pair["valid"] & ~pair["is_outlier"] & (np.arange(60) < 30)),
        jnp.asarray(pair["K"]),
        InitializerConfig(),
    )
    # 30 clean matches < min_triangulated 50 -> reject
    assert not bool(res.ok)
