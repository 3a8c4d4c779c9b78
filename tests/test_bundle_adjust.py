import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.config import CameraConfig, SolverConfig
from orb_slam_tpu.geometry import camera
from orb_slam_tpu.solvers import bundle_adjust as ba
from synthetic import make_scene, rotmat


def make_cam():
    return camera.make_camera(
        CameraConfig(fx=500, fy=500, cx=320, cy=240,
                     k1=0, k2=0, p1=0, p2=0, k3=0, width=640, height=480)
    )


def build_problem(rng, n_kf=6, n_pts=200, noise=0.3, pose_pert=0.02,
                  pt_pert=0.05, outlier_frac=0.0):
    """Cameras on an arc observing a cloud; perturbed initial estimates."""
    X = make_scene(rng, n_pts, depth_range=(5.0, 10.0))
    cam = make_cam()
    Rs_gt, ts_gt = [], []
    for k in range(n_kf):
        ang = np.radians(3.0 * k)
        R = rotmat([0, 1, 0], ang)
        t = np.array([-0.4 * k, 0.02 * k, 0.01 * k], np.float32)
        Rs_gt.append(R)
        ts_gt.append(t)
    Rs_gt = np.stack(Rs_gt)
    ts_gt = np.stack(ts_gt)

    cam_idx, pt_idx, uvs = [], [], []
    for k in range(n_kf):
        xc = X @ Rs_gt[k].T + ts_gt[k]
        uv = np.stack(
            [500 * xc[:, 0] / xc[:, 2] + 320, 500 * xc[:, 1] / xc[:, 2] + 240],
            axis=1,
        )
        vis = (xc[:, 2] > 0.5) & (uv[:, 0] > 0) & (uv[:, 0] < 640) & \
              (uv[:, 1] > 0) & (uv[:, 1] < 480)
        idx = np.where(vis)[0]
        cam_idx.append(np.full(len(idx), k))
        pt_idx.append(idx)
        uvs.append(uv[idx] + rng.normal(0, noise, (len(idx), 2)))
    cam_idx = np.concatenate(cam_idx).astype(np.int32)
    pt_idx = np.concatenate(pt_idx).astype(np.int32)
    uvs = np.concatenate(uvs).astype(np.float32)
    O = len(cam_idx)

    is_out = np.zeros(O, bool)
    k_out = int(outlier_frac * O)
    if k_out:
        sel = rng.choice(O, k_out, replace=False)
        uvs[sel] += rng.uniform(15, 80, (k_out, 2)) * rng.choice([-1, 1], (k_out, 2))
        is_out[sel] = True

    # perturb initial guesses (keep camera 0 exact = gauge)
    Rs0 = Rs_gt.copy()
    ts0 = ts_gt.copy()
    for k in range(1, n_kf):
        w = rng.normal(0, pose_pert, 3)
        Rs0[k] = rotmat(w / (np.linalg.norm(w) + 1e-12), np.linalg.norm(w)) @ Rs_gt[k]
        ts0[k] = ts_gt[k] + rng.normal(0, pose_pert, 3)
    X0 = X + rng.normal(0, pt_pert, X.shape).astype(np.float32)

    edges = ba.BAEdges(
        cam_idx=jnp.asarray(cam_idx),
        pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uvs),
        inv_sigma2=jnp.ones(O, jnp.float32),
        valid=jnp.ones(O, bool),
    )
    fixed = jnp.asarray(np.arange(n_kf) == 0)
    return dict(
        X=X, Rs_gt=Rs_gt, ts_gt=ts_gt, Rs0=jnp.asarray(Rs0),
        ts0=jnp.asarray(ts0), X0=jnp.asarray(X0.astype(np.float32)),
        edges=edges, fixed=fixed, cam=cam, is_out=is_out,
    )


def reproj_rmse(Rs, ts, X, edges, cam):
    Rk = np.asarray(Rs)[np.asarray(edges.cam_idx)]
    tk = np.asarray(ts)[np.asarray(edges.cam_idx)]
    Xp = np.asarray(X)[np.asarray(edges.pt_idx)]
    xc = np.einsum("oij,oj->oi", Rk, Xp) + tk
    uv = np.stack(
        [500 * xc[:, 0] / xc[:, 2] + 320, 500 * xc[:, 1] / xc[:, 2] + 240], axis=1
    )
    e = np.linalg.norm(uv - np.asarray(edges.uv), axis=1)
    return np.sqrt(np.mean(e**2)), e


def test_ba_reduces_reprojection_error(rng):
    p = build_problem(rng)
    rmse0, _ = reproj_rmse(p["Rs0"], p["ts0"], p["X0"], p["edges"], p["cam"])
    res = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                           p["edges"], p["cam"])
    rmse1, _ = reproj_rmse(res.R, res.t, res.points, p["edges"], p["cam"])
    assert rmse1 < rmse0 * 0.2, f"{rmse0} -> {rmse1}"
    assert rmse1 < 0.6, f"final rmse {rmse1}px vs noise 0.3px"


def test_ba_recovers_poses(rng):
    p = build_problem(rng, noise=0.2)
    res = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                           p["edges"], p["cam"])
    for k in range(1, 6):
        dR = np.asarray(res.R)[k] @ p["Rs_gt"][k].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        terr = np.linalg.norm(np.asarray(res.t)[k] - p["ts_gt"][k])
        assert ang < 0.08, f"kf{k} rot {ang}"
        assert terr < 0.02, f"kf{k} trans {terr}"


def test_ba_gauge_fixed_camera_unchanged(rng):
    p = build_problem(rng)
    res = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                           p["edges"], p["cam"])
    np.testing.assert_allclose(np.asarray(res.R)[0], np.asarray(p["Rs0"])[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.t)[0], np.asarray(p["ts0"])[0], atol=1e-6)


def test_ba_flags_outlier_edges(rng):
    p = build_problem(rng, outlier_frac=0.15)
    res = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                           p["edges"], p["cam"])
    inl = np.asarray(res.edge_inliers)
    assert inl[p["is_out"]].mean() < 0.05
    assert inl[~p["is_out"]].mean() > 0.95
    # and the estimate is not dragged off by them: surviving inlier edges fit
    # tightly (points whose support was mostly outliers go underdetermined and
    # are exactly what the pipeline culls via this mask)
    rmse1, e = reproj_rmse(res.R, res.t, res.points, p["edges"], p["cam"])
    assert np.sqrt(np.mean(e[inl] ** 2)) < 0.7


def test_global_ba_single_phase(rng):
    p = build_problem(rng)
    res = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                           p["edges"], p["cam"], two_phase=False)
    rmse1, _ = reproj_rmse(res.R, res.t, res.points, p["edges"], p["cam"])
    assert rmse1 < 0.6


def test_aborted_schedule_phase1_only(rng):
    """phase2=False (mbAbortBA between optimize(5) and optimize(10),
    src/Optimizer.cc:450-494): still makes real progress — phase 1's 5
    robust iterations + the outlier gate — but stops short of the full
    schedule's polish."""
    p = build_problem(rng)
    rmse0, _ = reproj_rmse(p["Rs0"], p["ts0"], p["X0"], p["edges"], p["cam"])
    res_s = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                             p["edges"], p["cam"], phase2=False)
    res_f = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                             p["edges"], p["cam"])
    rmse_s, _ = reproj_rmse(res_s.R, res_s.t, res_s.points, p["edges"],
                            p["cam"])
    rmse_f, _ = reproj_rmse(res_f.R, res_f.t, res_f.points, p["edges"],
                            p["cam"])
    assert rmse_s < rmse0 * 0.5, f"{rmse0} -> {rmse_s}"
    assert np.isfinite(float(res_s.cost))
    assert rmse_f <= rmse_s + 1e-3, (rmse_f, rmse_s)


def test_matmul_precision_knob(rng):
    """SolverConfig.ba_matmul_precision traces the solve under the given
    jax matmul precision.  On the CPU backend f32 is native so every
    setting converges equivalently — the knob exists for the TPU, where
    the 'default' single-pass-bf16 lowering plateaus LM ~77% above the
    f32 optimum (BA_PRECISION_r05.json, measured on-chip)."""
    p = build_problem(rng)
    rmses = []
    for prec in ("default", "high", "float32"):
        cfg = SolverConfig(ba_matmul_precision=prec)
        res = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                               p["edges"], p["cam"], cfg=cfg)
        rmse, _ = reproj_rmse(res.R, res.t, res.points, p["edges"], p["cam"])
        rmses.append(rmse)
    assert max(rmses) < 0.6, rmses
    assert max(rmses) - min(rmses) < 0.05, rmses


def test_cg_solver_matches_dense(rng):
    """The matrix-free PCG Schur path must converge to the same optimum as
    the dense reduced solve."""
    p = build_problem(rng, noise=0.2)
    res_d = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                             p["edges"], p["cam"], solver="dense")
    res_c = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                             p["edges"], p["cam"], solver="cg")
    rmse_d, _ = reproj_rmse(res_d.R, res_d.t, res_d.points, p["edges"], p["cam"])
    rmse_c, _ = reproj_rmse(res_c.R, res_c.t, res_c.points, p["edges"], p["cam"])
    assert rmse_c < rmse_d * 1.1 + 0.05, (rmse_d, rmse_c)
    for k in range(1, 6):
        dR = np.asarray(res_c.R)[k] @ np.asarray(res_d.R)[k].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.05, ang
        assert np.linalg.norm(np.asarray(res_c.t)[k]
                              - np.asarray(res_d.t)[k]) < 5e-3


def test_cg_solver_city_scale_smoke(rng):
    """Global-BA scale (256 KFs x 16k points) through the CG path: the dense
    block grid would be ~300 MB/iter; CG must run within memory and reduce
    the cost.  Shapes are the scaled problem; iteration count kept tiny for
    CI wall clock."""
    import time
    from orb_slam_tpu.config import SolverConfig
    n_kf, n_pts = 256, 16384
    X = make_scene(rng, n_pts, depth_range=(5.0, 40.0), spread=60.0)
    Rs, ts, cam_idx, pt_idx, uvs = [], [], [], [], []
    for k in range(n_kf):
        R = rotmat([0, 1, 0], np.radians(0.05 * k))
        t = np.array([-0.1 * k, 0, 0], np.float32)
        Rs.append(R); ts.append(t)
    Rs = np.stack(Rs); ts = np.stack(ts)
    # each camera observes 256 of its visible points (sparse, real-map-like)
    for k in range(n_kf):
        xc_all = X @ Rs[k].T + ts[k]
        vis = np.where(xc_all[:, 2] > 2.0)[0]
        sel = rng.choice(vis, 256, replace=False)
        xc = xc_all[sel]
        uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
                       500 * xc[:, 1] / xc[:, 2] + 240], 1)
        cam_idx.append(np.full(256, k)); pt_idx.append(sel)
        uvs.append(uv + rng.normal(0, 0.3, uv.shape))
    edges = ba.BAEdges(
        cam_idx=jnp.asarray(np.concatenate(cam_idx).astype(np.int32)),
        pt_idx=jnp.asarray(np.concatenate(pt_idx).astype(np.int32)),
        uv=jnp.asarray(np.concatenate(uvs).astype(np.float32)),
        inv_sigma2=jnp.ones(n_kf * 256, jnp.float32),
        valid=jnp.ones(n_kf * 256, bool))
    Rs0 = Rs.copy(); ts0 = ts + rng.normal(0, 0.01, ts.shape).astype(np.float32)
    X0 = (X + rng.normal(0, 0.05, X.shape)).astype(np.float32)
    fixed = jnp.asarray(np.arange(n_kf) == 0)
    cam = make_cam()
    cfg = SolverConfig(global_ba_iters=2)
    t0 = time.perf_counter()
    res = ba.bundle_adjust(jnp.asarray(Rs0), jnp.asarray(ts0),
                           jnp.asarray(X0), fixed, edges, cam, cfg,
                           two_phase=False, solver="cg")
    dt = time.perf_counter() - t0
    rmse0, _ = reproj_rmse(Rs0, ts0, X0, edges, cam)
    rmse1, _ = reproj_rmse(res.R, res.t, res.points, edges, cam)
    print(f"city-scale CG BA: {rmse0:.2f} -> {rmse1:.2f} px, "
          f"{dt:.1f}s for 2 iters")
    assert rmse1 < rmse0 * 0.7


def test_normalized_world_matches_plain(rng):
    """ba_normalize_world applies a world similarity inside the program and
    undoes it after: projections are similarity-invariant, so on a
    well-conditioned problem the solve must agree with the plain one."""
    import dataclasses
    p = build_problem(rng)
    cfg_n = dataclasses.replace(SolverConfig(), ba_normalize_world=True)
    r_plain = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                               p["edges"], p["cam"])
    r_norm = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                              p["edges"], p["cam"], cfg=cfg_n)
    rmse_p, _ = reproj_rmse(r_plain.R, r_plain.t, r_plain.points,
                            p["edges"], p["cam"])
    rmse_n, _ = reproj_rmse(r_norm.R, r_norm.t, r_norm.points,
                            p["edges"], p["cam"])
    assert rmse_n < rmse_p * 1.2 + 0.05, (rmse_n, rmse_p)
    np.testing.assert_allclose(np.asarray(r_norm.t), np.asarray(r_plain.t),
                               atol=5e-2)


def test_normalized_world_survives_far_offset(rng):
    """City-scale conditioning: shift the whole world 4 km from the origin
    (poses consistent) — the normalized solve must still converge to
    sub-pixel reprojection in f32, which is the option's purpose."""
    import dataclasses
    p = build_problem(rng)
    off = np.array([4000.0, 0.0, 2000.0], np.float32)
    X0 = p["X0"] + off
    ts0 = p["ts0"] - np.einsum("kij,j->ki", np.asarray(p["Rs0"]), off)
    cfg_n = dataclasses.replace(SolverConfig(), ba_normalize_world=True)
    r_norm = ba.bundle_adjust(
        jnp.asarray(p["Rs0"]), jnp.asarray(ts0), jnp.asarray(X0),
        p["fixed"], p["edges"], p["cam"], cfg=cfg_n)
    rmse_n, _ = reproj_rmse(r_norm.R, r_norm.t, r_norm.points,
                            p["edges"], p["cam"])
    assert rmse_n < 1.0, rmse_n
