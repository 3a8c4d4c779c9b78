import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_tpu.geometry import sim3
from orb_slam_tpu.solvers import sim3_solver, pose_graph
from synthetic import make_scene, default_K, rotmat


def test_umeyama_sim3_exact(rng):
    P2 = jnp.asarray(rng.normal(0, 2, (30, 3)))
    s_gt, R_gt, t_gt = sim3.exp(jnp.asarray(rng.normal(0, 0.4, 7)))
    P1 = sim3.transform(s_gt, R_gt, t_gt, P2)
    s, R, t = sim3_solver.umeyama_sim3(P2, P1)
    np.testing.assert_allclose(float(s), float(s_gt), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-4)


def test_sim3_ransac_with_outliers(rng):
    n = 120
    K = jnp.asarray(default_K())
    # landmarks in KF2's camera frame (in front of camera)
    X2 = jnp.asarray(np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 8, n)
    ], 1).astype(np.float32))
    zeta = jnp.asarray([0.2, -0.1, 0.3, 0.03, -0.05, 0.02, 0.1])
    s_gt, R_gt, t_gt = sim3.exp(zeta)
    X1 = sim3.transform(s_gt, R_gt, t_gt, X2)

    def project(X):
        z = X[:, 2]
        return jnp.stack([500 * X[:, 0] / z + 320, 500 * X[:, 1] / z + 240], 1)

    uv1 = project(X1) + jnp.asarray(rng.normal(0, 0.3, (n, 2)))
    uv2 = project(X2) + jnp.asarray(rng.normal(0, 0.3, (n, 2)))

    # corrupt 30% of the X2 side (wrong associations)
    k = int(0.3 * n)
    out = rng.choice(n, k, replace=False)
    X2c = np.asarray(X2).copy()
    X2c[out] += rng.uniform(1, 3, (k, 3))
    is_out = np.zeros(n, bool)
    is_out[out] = True

    res = sim3_solver.sim3_ransac(
        jax.random.PRNGKey(0), X1, jnp.asarray(X2c), uv1, uv2,
        jnp.full(n, 9.21), jnp.full(n, 9.21), jnp.ones(n, bool), K)
    assert bool(res.ok)
    np.testing.assert_allclose(float(res.s), float(s_gt), rtol=0.02)
    dR = np.asarray(res.R) @ np.asarray(R_gt).T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5
    inl = np.asarray(res.inliers)
    assert inl[is_out].mean() < 0.1


def _ring_poses(n, drift_zeta=None):
    """Keyframes around a circle; optional accumulated drift."""
    s = [jnp.ones(())]
    R = [jnp.eye(3)]
    t = [jnp.zeros(3)]
    rel = []
    rng = np.random.default_rng(0)
    for k in range(1, n):
        zeta = jnp.asarray(
            np.concatenate([[0.3, 0.0, 0.02], [0.0, 2 * np.pi / n, 0.0], [0.0]]))
        rel.append(sim3.exp(zeta))
        sk, Rk, tk = sim3.compose(*rel[-1], s[-1], R[-1], t[-1])
        s.append(sk); R.append(Rk); t.append(tk)
    return jnp.stack(s), jnp.stack(R), jnp.stack(t), rel


def test_pose_graph_closes_loop():
    """A drifted ring: odometry edges + one loop edge; optimization should
    distribute the drift (classic PGO sanity check)."""
    n = 12
    s_gt, R_gt, t_gt, rel = _ring_poses(n)

    # corrupt: add drift to each odometry step, accumulate
    rng = np.random.default_rng(3)
    s = [s_gt[0]]; R = [R_gt[0]]; t = [t_gt[0]]
    for k in range(1, n):
        sr, Rr, tr = rel[k - 1]
        noise = sim3.exp(jnp.asarray(rng.normal(0, 0.02, 7)))
        srn, Rrn, trn = sim3.compose(*noise, sr, Rr, tr)
        sk, Rk, tk = sim3.compose(srn, Rrn, trn, s[-1], R[-1], t[-1])
        s.append(sk); R.append(Rk); t.append(tk)
    s0 = jnp.stack(s); R0 = jnp.stack(R); t0 = jnp.stack(t)

    # edges: consecutive odometry (true measurements) + loop edge (n-1, 0)
    ei, ej, sm, Rm, tm = [], [], [], [], []
    for k in range(1, n):
        # measurement Shat_ij = S_i o S_j^-1 with ground-truth poses
        si_, Ri_, ti_ = s_gt[k], R_gt[k], t_gt[k]
        inv = sim3.inverse(s_gt[k - 1], R_gt[k - 1], t_gt[k - 1])
        m = sim3.compose(si_, Ri_, ti_, *inv)
        ei.append(k); ej.append(k - 1)
        sm.append(m[0]); Rm.append(m[1]); tm.append(m[2])
    # loop edge between last and first
    inv = sim3.inverse(s_gt[0], R_gt[0], t_gt[0])
    m = sim3.compose(s_gt[n - 1], R_gt[n - 1], t_gt[n - 1], *inv)
    ei.append(n - 1); ej.append(0)
    sm.append(m[0]); Rm.append(m[1]); tm.append(m[2])

    edges = pose_graph.Sim3Edges(
        i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
        s_meas=jnp.stack(sm), R_meas=jnp.stack(Rm), t_meas=jnp.stack(tm),
        valid=jnp.ones(len(ei), bool),
    )
    fixed = jnp.asarray(np.arange(n) == 0)
    s1, R1, t1, costs = pose_graph.optimize_essential_graph(
        s0, R0, t0, fixed, edges, n_iters=20)

    # error vs ground truth should shrink substantially
    def err(sa, Ra, ta):
        e = 0.0
        for k in range(n):
            e += float(jnp.linalg.norm(ta[k] - t_gt[k]))
        return e
    e0, e1 = err(s0, R0, t0), err(s1, R1, t1)
    assert np.isfinite(float(costs[-1]))
    assert e1 < 0.25 * e0, f"pose error {e0} -> {e1}"


def test_correct_points_consistency():
    """Re-mapping points through corrected keyframes preserves camera-frame
    coordinates: S_new(X') == S_old(X)."""
    rng = np.random.default_rng(1)
    P = jnp.asarray(rng.normal(0, 2, (50, 3)).astype(np.float32))
    K = 4
    s_old = jnp.ones(K); R_old = jnp.stack([jnp.eye(3)] * K)
    t_old = jnp.asarray(rng.normal(0, 1, (K, 3)).astype(np.float32))
    zeta = jnp.asarray(rng.normal(0, 0.2, (K, 7)).astype(np.float32))
    s_new, R_new, t_new = jax.vmap(sim3.exp)(zeta)
    ref = jnp.asarray(rng.integers(0, K, 50), jnp.int32)
    P2 = pose_graph.correct_points(P, ref, s_old, R_old, t_old,
                                   s_new, R_new, t_new)
    Xc_old = sim3.transform(s_old[ref], R_old[ref], t_old[ref], P)
    Xc_new = sim3.transform(s_new[ref], R_new[ref], t_new[ref], P2)
    np.testing.assert_allclose(np.asarray(Xc_new), np.asarray(Xc_old), atol=1e-4)


def test_pose_graph_sharded_matches_single():
    """Keyframe-block-sharded essential graph (parallel/dist_pose_graph.py)
    must produce the same poses as the single-device solver."""
    from orb_slam_tpu.parallel import dist_pose_graph, dist_ba

    n = 12
    s_gt, R_gt, t_gt, rel = _ring_poses(n)
    rng = np.random.default_rng(3)
    s = [s_gt[0]]; R = [R_gt[0]]; t = [t_gt[0]]
    for k in range(1, n):
        sr, Rr, tr = rel[k - 1]
        noise = sim3.exp(jnp.asarray(rng.normal(0, 0.02, 7)))
        srn, Rrn, trn = sim3.compose(*noise, sr, Rr, tr)
        sk, Rk, tk = sim3.compose(srn, Rrn, trn, s[-1], R[-1], t[-1])
        s.append(sk); R.append(Rk); t.append(tk)
    s0 = jnp.stack(s); R0 = jnp.stack(R); t0 = jnp.stack(t)

    ei, ej, sm, Rm, tm = [], [], [], [], []
    for k in range(1, n):
        si_, Ri_, ti_ = s_gt[k], R_gt[k], t_gt[k]
        inv = sim3.inverse(s_gt[k - 1], R_gt[k - 1], t_gt[k - 1])
        m = sim3.compose(si_, Ri_, ti_, *inv)
        ei.append(k); ej.append(k - 1)
        sm.append(m[0]); Rm.append(m[1]); tm.append(m[2])
    inv = sim3.inverse(s_gt[0], R_gt[0], t_gt[0])
    m = sim3.compose(s_gt[n - 1], R_gt[n - 1], t_gt[n - 1], *inv)
    ei.append(n - 1); ej.append(0)
    sm.append(m[0]); Rm.append(m[1]); tm.append(m[2])

    edges = pose_graph.Sim3Edges(
        i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
        s_meas=jnp.stack(sm), R_meas=jnp.stack(Rm), t_meas=jnp.stack(tm),
        valid=jnp.ones(len(ei), bool),
    )
    fixed = jnp.asarray(np.arange(n) == 0)
    s1, R1, t1, _ = pose_graph.optimize_essential_graph(
        s0, R0, t0, fixed, edges, n_iters=20)
    s8, R8, t8, _ = dist_pose_graph.optimize_essential_graph_dist(
        s0, R0, t0, fixed, edges, n_iters=20, n_shards=8)
    np.testing.assert_allclose(np.asarray(t8), np.asarray(t1),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1),
                               atol=1e-4, rtol=1e-3)
