"""GRID-layout BA (camera-major [K, N] observation table) vs the flat
edge list: same math, different data layout (bundle_adjust.BAEdges
docstring).  The grid layout exists because the flat path's two-index
block scatter materializes a ~24 GB update tensor at city scale
(BA_CITY_r04.json; reference regime: Optimizer.cc:287-536 global BA)."""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam_tpu.solvers import bundle_adjust as ba
from test_bundle_adjust import build_problem, reproj_rmse


def to_grid(edges: ba.BAEdges, n_kf: int, n_slots: int | None = None):
    """Re-express a flat edge list as the [K, N] grid layout."""
    cam_idx = np.asarray(edges.cam_idx)
    pt_idx = np.asarray(edges.pt_idx)
    uv = np.asarray(edges.uv)
    is2 = np.asarray(edges.inv_sigma2)
    val = np.asarray(edges.valid)
    counts = np.bincount(cam_idx[val], minlength=n_kf)
    N = int(counts.max()) if n_slots is None else n_slots
    pt_g = np.zeros((n_kf, N), np.int32)
    uv_g = np.zeros((n_kf, N, 2), np.float32)
    is2_g = np.ones((n_kf, N), np.float32)
    val_g = np.zeros((n_kf, N), bool)
    fill = np.zeros(n_kf, np.int32)
    for o in range(len(cam_idx)):
        if not val[o]:
            continue
        k, s = cam_idx[o], fill[cam_idx[o]]
        pt_g[k, s] = pt_idx[o]
        uv_g[k, s] = uv[o]
        is2_g[k, s] = is2[o]
        val_g[k, s] = True
        fill[k] += 1
    return ba.BAEdges(cam_idx=None, pt_idx=jnp.asarray(pt_g),
                      uv=jnp.asarray(uv_g), inv_sigma2=jnp.asarray(is2_g),
                      valid=jnp.asarray(val_g))


@pytest.mark.parametrize("solver", ["dense", "cg"])
def test_grid_matches_flat(rng, solver):
    p = build_problem(rng, outlier_frac=0.05)
    grid_edges = to_grid(p["edges"], n_kf=p["Rs0"].shape[0])
    rf = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                          p["edges"], p["cam"], solver=solver)
    rg = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                          grid_edges, p["cam"], solver=solver)
    # identical math, different f32 summation order: converged states must
    # agree to well under a pixel / millimeter
    rmse_f, _ = reproj_rmse(rf.R, rf.t, rf.points, p["edges"], p["cam"])
    rmse_g, _ = reproj_rmse(rg.R, rg.t, rg.points, p["edges"], p["cam"])
    assert abs(rmse_f - rmse_g) < 0.05, (rmse_f, rmse_g)
    np.testing.assert_allclose(np.asarray(rf.t), np.asarray(rg.t),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(rf.R), np.asarray(rg.R),
                               atol=2e-3)
    # inlier masks agree edge-for-edge (grid mask is [K, N])
    inl_g = np.asarray(rg.edge_inliers)
    cam_idx = np.asarray(p["edges"].cam_idx)
    fill = np.zeros(p["Rs0"].shape[0], np.int32)
    agree = total = 0
    for o in range(len(cam_idx)):
        k = cam_idx[o]
        agree += bool(np.asarray(rf.edge_inliers)[o]) == bool(
            inl_g[k, fill[k]])
        total += 1
        fill[k] += 1
    assert agree / total > 0.99


def test_grid_placements_agree(rng):
    p = build_problem(rng)
    grid_edges = to_grid(p["edges"], n_kf=p["Rs0"].shape[0])
    r_sc = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                            grid_edges, p["cam"], placement="scatter")
    r_oh = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                            grid_edges, p["cam"], placement="onehot")
    # onehot runs the placement at Precision.HIGHEST, so both are exact
    # f32 placements; downstream summation order inside the matmul may
    # still differ at ulp level
    np.testing.assert_allclose(np.asarray(r_sc.t), np.asarray(r_oh.t),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_sc.points),
                               np.asarray(r_oh.points), atol=1e-3)


def test_grid_blob_roundtrip(rng):
    """host_blob packs (R, t, X, inliers-flattened) for the grid layout."""
    p = build_problem(rng)
    K = p["Rs0"].shape[0]
    grid_edges = to_grid(p["edges"], K)
    res = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                           grid_edges, p["cam"])
    hb = np.asarray(res.host_blob)
    P = res.points.shape[0]
    o = 9 * K
    np.testing.assert_array_equal(hb[:o].reshape(K, 3, 3),
                                  np.asarray(res.R))
    np.testing.assert_array_equal(hb[o:o + 3 * K].reshape(K, 3),
                                  np.asarray(res.t))
    o += 3 * K
    np.testing.assert_array_equal(hb[o:o + 3 * P].reshape(P, 3),
                                  np.asarray(res.points))
    o += 3 * P
    np.testing.assert_array_equal(
        (hb[o:] != 0).reshape(res.edge_inliers.shape),
        np.asarray(res.edge_inliers))
