"""Extra coverage: fix-scale Sim3 RANSAC, covisibility consistency,
Umeyama edge cases, BA cost monotonicity."""
import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_tpu.dataio import trajectory as traj
from orb_slam_tpu.geometry import sim3
from orb_slam_tpu.mapping import mapstore
from orb_slam_tpu.solvers import sim3_solver
from synthetic import default_K


def test_sim3_ransac_fix_scale(rng):
    """Stereo/RGBD mode of the reference fixes scale (Sim3Solver ctor flag);
    the estimate must come back with s == 1."""
    n = 80
    X2 = jnp.asarray(np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 8, n)
    ], 1).astype(np.float32))
    zeta = jnp.asarray([0.2, -0.1, 0.3, 0.03, -0.05, 0.02, 0.0])  # s = 1
    s_gt, R_gt, t_gt = sim3.exp(zeta)
    X1 = sim3.transform(s_gt, R_gt, t_gt, X2)

    def proj(X):
        z = X[:, 2]
        return jnp.stack([500 * X[:, 0] / z + 320, 500 * X[:, 1] / z + 240], 1)

    res = sim3_solver.sim3_ransac(
        jax.random.PRNGKey(1), X1, X2, proj(X1), proj(X2),
        jnp.full(n, 9.21), jnp.full(n, 9.21), jnp.ones(n, bool),
        jnp.asarray(default_K()), fix_scale=True)
    assert bool(res.ok)
    assert float(res.s) == 1.0


def test_covisibility_row_matches_matrix(rng):
    cfg = mapstore.MapConfig(max_keyframes=6, max_points=64)
    smap = mapstore.SlamMap.create(cfg, n_slots=16)
    for k in range(3):
        obs = np.full(16, -1, np.int32)
        obs[: 8 + k * 2] = np.arange(8 + k * 2)  # increasing overlap
        smap.add_keyframe(
            jnp.eye(3), jnp.zeros(3), jnp.zeros((16, 2)),
            jnp.zeros(16, jnp.int32), jnp.zeros(16),
            jnp.zeros((16, 8), jnp.uint32), jnp.ones(16, bool),
            jnp.asarray(obs), frame_id=k, timestamp=float(k))
    st = smap.state
    W = np.asarray(mapstore.covisibility_matrix(st, 64))
    for k in range(3):
        row = np.asarray(mapstore.covisibility_row(st, k, 64))
        np.testing.assert_array_equal(row[:3], W[k, :3])
    assert W[0, 1] == 8 and W[1, 2] == 10 and W[0, 2] == 8


def test_umeyama_reflection_safe(rng):
    """Alignment must return a proper rotation even for near-degenerate or
    reflected configurations."""
    src = rng.normal(0, 1, (30, 3))
    R = np.diag([1.0, 1.0, -1.0])  # improper transform applied to data
    dst = src @ R.T * 2.0
    s, Ra, t = traj.umeyama_alignment(src, dst)
    assert np.linalg.det(Ra) > 0.99  # proper rotation enforced


def test_umeyama_without_scale(rng):
    src = rng.normal(0, 1, (20, 3))
    from synthetic import rotmat
    Rg = rotmat([0, 0, 1], 0.4)
    dst = src @ Rg.T + np.array([1.0, 2.0, 3.0])
    s, Ra, t = traj.umeyama_alignment(src, dst, with_scale=False)
    assert s == 1.0
    np.testing.assert_allclose(Ra, Rg, atol=1e-6)


def test_ba_cost_decreases(rng):
    """LM accept/reject must make reported costs non-increasing overall."""
    import sys
    sys.path.insert(0, "tests")
    from test_bundle_adjust import build_problem
    from orb_slam_tpu.solvers import bundle_adjust as ba
    from orb_slam_tpu.config import SolverConfig

    p = build_problem(rng, n_kf=4, n_pts=100, noise=0.3)
    res1 = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                            p["edges"], p["cam"], SolverConfig(),
                            two_phase=False)
    # a second solve from the first solution cannot be worse
    res2 = ba.bundle_adjust(res1.R, res1.t, res1.points, p["fixed"],
                            p["edges"], p["cam"], SolverConfig(),
                            two_phase=False)
    assert float(res2.cost) <= float(res1.cost) * 1.01
