import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_tpu.solvers import pnp
from orb_slam_tpu.solvers.epnp import epnp
from synthetic import make_scene, default_K, rotmat


def make_problem(rng, n=20, noise=0.0):
    X = make_scene(rng, n)
    K = default_K()
    R_gt = rotmat([0.4, 0.8, -0.3], np.radians(30.0))
    t_gt = np.array([0.3, -0.5, 1.2], np.float32)
    xc = X @ R_gt.T + t_gt
    uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
                   500 * xc[:, 1] / xc[:, 2] + 240], 1)
    uv += rng.normal(0, noise, uv.shape)
    return X, uv.astype(np.float32), R_gt, t_gt, K


def pose_err(R, t, R_gt, t_gt):
    dR = np.asarray(R) @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    return ang, np.linalg.norm(np.asarray(t) - t_gt)


def test_epnp_exact_six_points():
    """From n=6 the M^T M null space is effectively 1-dimensional and the
    beta-case machinery recovers the exact pose.  (At the minimal n=4 the
    null space is 4-dimensional and EPnP is only a hypothesis generator —
    same as the reference, which feeds 4-point sets to RANSAC and lets
    consensus arbitrate, PnPsolver.cc:137-231.)"""
    rng = np.random.default_rng(0)
    X, uv, R_gt, t_gt, K = make_problem(rng, n=6, noise=0.0)
    R, t = epnp(jnp.asarray(X), jnp.asarray(uv), jnp.asarray(K))
    ang, terr = pose_err(R, t, R_gt, t_gt)
    assert ang < 0.2, f"rot err {ang}"
    assert terr < 0.02, f"trans err {terr}"


def test_epnp_overdetermined_noisy():
    rng = np.random.default_rng(1)
    X, uv, R_gt, t_gt, K = make_problem(rng, n=50, noise=0.5)
    R, t = epnp(jnp.asarray(X), jnp.asarray(uv), jnp.asarray(K))
    ang, terr = pose_err(R, t, R_gt, t_gt)
    assert ang < 0.5
    assert terr < 0.05


def test_epnp_vmaps():
    rng = np.random.default_rng(2)
    X, uv, R_gt, t_gt, K = make_problem(rng, n=40, noise=0.2)
    idx = jnp.asarray(rng.integers(0, 40, (8, 4)))
    Rs, ts = jax.vmap(lambda s: epnp(jnp.asarray(X)[s], jnp.asarray(uv)[s],
                                     jnp.asarray(K)))(idx)
    assert Rs.shape == (8, 3, 3)
    assert np.all(np.isfinite(np.asarray(Rs)))


def test_pnp_ransac_with_epnp_minimal_sets():
    rng = np.random.default_rng(3)
    X, uv, R_gt, t_gt, K = make_problem(rng, n=150, noise=0.4)
    k = 45
    out = rng.choice(150, k, replace=False)
    uv2 = uv.copy()
    uv2[out] = rng.uniform([0, 0], [640, 480], (k, 2)).astype(np.float32)
    res = pnp.pnp_ransac(
        jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(uv2),
        jnp.ones(150), jnp.ones(150, bool), jnp.asarray(K),
        min_set=4, solver="epnp", n_samples=256)
    assert bool(res.ok)
    ang, terr = pose_err(res.R, res.t, R_gt, t_gt)
    assert ang < 1.0
    assert terr < 0.06
