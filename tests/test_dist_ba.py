"""Distributed BA must agree with single-device BA (SURVEY.md §4: multi-chip
tests assert distributed BA == single-chip BA before measuring scaling)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import Mesh

from orb_slam_tpu.config import SolverConfig
from orb_slam_tpu.parallel import dist_ba
from orb_slam_tpu.solvers import bundle_adjust as ba
from test_bundle_adjust import build_problem, make_cam, reproj_rmse


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(21)
    return build_problem(rng, n_kf=6, n_pts=256, noise=0.3)


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


def test_sharded_matches_reference_reduction(problem):
    """The psum-reduced camera system must equal the single-device one:
    run both for the same iterations and compare end states."""
    p = problem
    mesh = dist_ba.make_mesh(8)
    prob = dist_ba.partition_problem(np.asarray(p["X0"]), p["edges"], 8)
    Rs, ts, Xs, _ = dist_ba.bundle_adjust_sharded(
        mesh, p["Rs0"], p["ts0"], prob, p["fixed"], p["cam"],
        SolverConfig(), n_iters=12)
    X_flat = np.asarray(Xs).reshape(-1, 3)[: p["X0"].shape[0]]

    rmse_dist, _ = reproj_rmse(Rs, ts, X_flat, p["edges"], p["cam"])
    rmse0, _ = reproj_rmse(p["Rs0"], p["ts0"], p["X0"], p["edges"], p["cam"])
    assert rmse_dist < rmse0 * 0.25, f"{rmse0} -> {rmse_dist}"
    assert rmse_dist < 0.6

    # single-device reference with the same robust schedule
    res = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                           p["edges"], p["cam"], two_phase=False)
    rmse_single, _ = reproj_rmse(res.R, res.t, res.points, p["edges"], p["cam"])
    # both should reach the same basin (exact float equality is not expected:
    # psum reduction order differs)
    assert abs(rmse_dist - rmse_single) < 0.15


def test_partition_preserves_all_edges(problem):
    p = problem
    prob = dist_ba.partition_problem(np.asarray(p["X0"]), p["edges"], 8)
    n_valid = int(np.asarray(prob.valid).sum())
    assert n_valid == int(np.asarray(p["edges"].valid).sum())
    # every edge's landmark is owned by its shard
    P_shard = prob.Xs.shape[1]
    for d in range(8):
        v = np.asarray(prob.valid[d])
        assert np.all(np.asarray(prob.pt_idx[d])[v] < P_shard)


def test_fixed_camera_untouched(problem):
    p = problem
    mesh = dist_ba.make_mesh(8)
    prob = dist_ba.partition_problem(np.asarray(p["X0"]), p["edges"], 8)
    Rs, ts, _, _ = dist_ba.bundle_adjust_sharded(
        mesh, p["Rs0"], p["ts0"], prob, p["fixed"], p["cam"],
        SolverConfig(), n_iters=6)
    np.testing.assert_allclose(np.asarray(Rs)[0], np.asarray(p["Rs0"])[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ts)[0], np.asarray(p["ts0"])[0], atol=1e-6)


def test_dist_ba_is_the_pipelines_ba():
    """With mesh.data_parallel > 1 the LIVE pipeline's local/global BA runs
    through the landmark-sharded solver (VERDICT round-1 item 2), and the
    resulting map agrees with a single-device run of the same sequence."""
    import dataclasses
    import sys
    sys.path.insert(0, "tests") if "tests" not in sys.path else None
    from synthetic_sequence import make_world, circular_trajectory, render_frame
    from orb_slam_tpu.pipeline.tracker import Tracker, TrackState
    from orb_slam_tpu.config import MeshConfig
    from test_pipeline import small_config
    from orb_slam_tpu.parallel import dist_ba as dist_mod

    calls = {"n": 0}
    orig = dist_mod.bundle_adjust_dist

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    def run(data_parallel):
        rng = np.random.default_rng(11)
        cfg = small_config().replace(mesh=MeshConfig(data_parallel=data_parallel))
        X, desc = make_world(rng, n_points=900)
        K = cfg.camera.K
        tracker = Tracker.create(cfg)
        for i, (R, t) in enumerate(circular_trajectory(26)):
            feats, _ = render_frame(rng, X, desc, R, t, K)
            tracker.process(feats, timestamp=i / 30.0)
        return tracker

    dist_mod.bundle_adjust_dist = spy
    try:
        t8 = run(8)
    finally:
        dist_mod.bundle_adjust_dist = orig
    assert calls["n"] >= 2, "distributed BA was never invoked by the pipeline"
    assert t8.state == TrackState.WORKING

    t1 = run(1)
    assert t1.state == TrackState.WORKING
    # same sequence, same schedule: maps must agree in size and keyframe count
    assert t8.slam_map.n_kf == t1.slam_map.n_kf
    assert abs(t8.slam_map.n_mp - t1.slam_map.n_mp) <= 0.1 * t1.slam_map.n_mp
    # trajectories agree (both tracked the same world through their own BA)
    c8 = np.asarray([-r.R.T @ r.t for r in t8.trajectory if r.tracked])
    c1 = np.asarray([-r.R.T @ r.t for r in t1.trajectory if r.tracked])
    n = min(len(c8), len(c1))
    assert np.linalg.norm(c8[:n] - c1[:n], axis=1).max() < 0.05


def test_sharded_cg_matches_dense(problem):
    """The matrix-free sharded Schur path (one [K,6] psum per CG matvec)
    must converge to the dense psum-of-reduced-systems result."""
    p = problem
    mesh = dist_ba.make_mesh(8)
    res_d = dist_ba.bundle_adjust_dist(
        p["Rs0"], p["ts0"], p["X0"], p["fixed"], p["edges"], make_cam(),
        SolverConfig(), two_phase=True, mesh=mesh, solver="dense")
    res_c = dist_ba.bundle_adjust_dist(
        p["Rs0"], p["ts0"], p["X0"], p["fixed"], p["edges"], make_cam(),
        SolverConfig(), two_phase=True, mesh=mesh, solver="cg")
    rmse_d, _ = reproj_rmse(res_d.R, res_d.t, res_d.points, p["edges"],
                            make_cam())
    rmse_c, _ = reproj_rmse(res_c.R, res_c.t, res_c.points, p["edges"],
                            make_cam())
    assert rmse_c < rmse_d * 1.1 + 0.05, (rmse_d, rmse_c)
    for k in range(1, 6):
        dR = np.asarray(res_c.R)[k] @ np.asarray(res_d.R)[k].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.05, ang


def test_spatial_partition_matches_index(problem):
    """Map-block (Morton-ordered) landmark sharding must give the same
    optimum as allocation-order sharding, with positions returned in the
    original allocation order."""
    p = problem
    mesh = dist_ba.make_mesh(8)
    res_i = dist_ba.bundle_adjust_dist(
        p["Rs0"], p["ts0"], p["X0"], p["fixed"], p["edges"], make_cam(),
        SolverConfig(), two_phase=True, mesh=mesh, strategy="index")
    res_s = dist_ba.bundle_adjust_dist(
        p["Rs0"], p["ts0"], p["X0"], p["fixed"], p["edges"], make_cam(),
        SolverConfig(), two_phase=True, mesh=mesh, strategy="spatial")
    np.testing.assert_allclose(np.asarray(res_s.t), np.asarray(res_i.t),
                               atol=2e-3)
    # same landmarks, same order
    np.testing.assert_allclose(np.asarray(res_s.points),
                               np.asarray(res_i.points), atol=2e-3)
    # inlier masks agree in the original edge order
    agree = (np.asarray(res_s.edge_inliers)
             == np.asarray(res_i.edge_inliers)).mean()
    assert agree > 0.99, agree


def test_spatial_partition_blocks_are_compact(problem):
    """Each spatial shard's landmarks span a smaller bounding volume than
    random allocation-order blocks would under interleaved revisits."""
    rng = np.random.default_rng(7)
    p = problem
    X = np.asarray(p["X0"])
    # simulate a revisit: shuffle allocation order so index blocks interleave
    shuf = rng.permutation(len(X))
    Xs = X[shuf]
    prob = dist_ba.partition_problem(Xs, p["edges"], 8, strategy="spatial")
    P_shard = prob.Xs.shape[1]
    packed = np.asarray(Xs)[np.argsort(prob.perm)]  # packed order
    vol_spatial = []
    for d in range(8):
        blk = packed[d * P_shard: min((d + 1) * P_shard, len(X))]
        if len(blk):
            vol_spatial.append(np.prod(blk.max(0) - blk.min(0) + 1e-6))
    vol_index = []
    for d in range(8):
        blk = Xs[d * P_shard: min((d + 1) * P_shard, len(X))]
        if len(blk):
            vol_index.append(np.prod(blk.max(0) - blk.min(0) + 1e-6))
    assert np.median(vol_spatial) < 0.5 * np.median(vol_index), (
        np.median(vol_spatial), np.median(vol_index))


def test_host_mesh_layout():
    """make_host_mesh: 2D (model x data) over the virtual devices, data
    axis innermost (ICI-contiguous); dist BA runs on its data axis."""
    from orb_slam_tpu.parallel import hostmesh
    mesh = hostmesh.make_host_mesh(data_parallel=4, model_parallel=2)
    assert mesh.shape == {"model": 2, "data": 4}
    # the data axis must enumerate adjacent jax.devices() entries
    devs = jax.devices()
    row0 = list(mesh.devices[0])
    assert row0 == devs[:4]

    rng = np.random.default_rng(3)
    p = build_problem(rng, n_kf=4, n_pts=64, noise=0.2)
    prob = dist_ba.partition_problem(np.asarray(p["X0"]), p["edges"], 4)
    Rs, ts, _, _ = dist_ba.bundle_adjust_sharded(
        Mesh(np.asarray(mesh.devices[0]), ("data",)),
        p["Rs0"], p["ts0"], prob, p["fixed"], make_cam(),
        SolverConfig(), n_iters=3)
    assert np.all(np.isfinite(np.asarray(ts)))
