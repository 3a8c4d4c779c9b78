"""512-KF city-scale BA through the MESH-SHARDED solver (VERDICT r4
missing #3: 'beyond the single-chip wall is the sharded solver's regime'
was claimed but dist_ba had never solved anything above 64 KF).

Runs parallel/dist_ba.bundle_adjust_dist on the ring world at
512 KF x 24,576 pts over the virtual 8-device mesh (the same shard_map +
psum program spans real chips over ICI — MULTICHIP artifacts), against
the single-device grid-layout dense solve of the SAME problem for a cost
and pose cross-check.  Per-shard half-matrix slabs are [6K, 3P/8] — the
memory that killed the flat single-chip path (~24 GB scatter lowering)
divides by the mesh size.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/dist_ba_city.py --out DIST_BA_CITY_r05.json
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--K", type=int, default=512)
    ap.add_argument("--P", type=int, default=24576)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    from ba_city_bench import make_problem
    from orb_slam_tpu.parallel import dist_ba
    from orb_slam_tpu.solvers import bundle_adjust as ba
    from orb_slam_tpu.config import SolverConfig
    import jax.numpy as jnp

    def robust_cost(R, t, X, edges, cam, cfg):
        """The single-path objective evaluated on the ORIGINAL edges —
        the honest cross-solver comparison: after a fixed LM budget two
        correct solvers may sit at different points on the cost surface
        (different f32 accept/reject trajectories), so compare COSTS,
        not poses."""
        r, _, _, z = ba._edge_terms(jnp.asarray(R), jnp.asarray(t),
                                    jnp.asarray(X), edges, cam)
        return float(ba._robust_cost(
            r, z, edges.inv_sigma2, edges.valid.astype(r.dtype),
            cfg.huber_delta2))

    n_dev = len(jax.devices())
    assert n_dev >= args.shards, (
        f"need {args.shards} devices, have {n_dev}")
    rng = np.random.default_rng(0)
    results = {"backend": jax.default_backend(), "n_devices": n_dev,
               "K": args.K, "P": args.P, "iters": args.iters, "cases": {}}

    cfg = SolverConfig(global_ba_iters=args.iters)

    # sharded solve (landmark/Morton map-block sharding + psum Schur)
    Rs, ts, Xs, fixed, edges, cam, n_obs = make_problem(rng, args.K, args.P)
    results["n_obs"] = n_obs
    cost0 = robust_cost(Rs, ts, Xs, edges, cam, cfg)
    results["initial_cost"] = cost0
    t0 = time.perf_counter()
    r_sh = dist_ba.bundle_adjust_dist(
        Rs, ts, Xs, fixed, edges, cam, cfg, two_phase=False,
        n_shards=args.shards, strategy="spatial")
    t_sh = np.asarray(r_sh.t)
    wall_sh = time.perf_counter() - t0
    results["cases"]["sharded"] = {
        "strategy": "spatial", "n_shards": args.shards,
        "wall_s_incl_compile": round(wall_sh, 1),
        "final_cost": robust_cost(r_sh.R, r_sh.t, r_sh.points, edges,
                                  cam, cfg)}
    # steady-state timing on a fresh same-shape problem
    Rs2, ts2, Xs2, fixed2, edges2, cam2, _ = make_problem(
        rng, args.K, args.P)
    t0 = time.perf_counter()
    r2 = dist_ba.bundle_adjust_dist(
        Rs2, ts2, Xs2, fixed2, edges2, cam2, cfg, two_phase=False,
        n_shards=args.shards, strategy="spatial")
    np.asarray(r2.t)
    results["cases"]["sharded"]["wall_s_warm"] = round(
        time.perf_counter() - t0, 2)
    results["cases"]["sharded"]["ms_per_iter_warm"] = round(
        (time.perf_counter() - t0) / args.iters * 1e3, 1)
    print(json.dumps(results["cases"]["sharded"]), flush=True)

    # single-device cross-check: the GRID layout compiles at 512 KF where
    # flat could not (BAEdges GRID mode); identical problem, same budget
    from orb_slam_tpu.solvers.bundle_adjust import BAEdges
    cam_idx = np.asarray(edges.cam_idx)
    pt_idx = np.asarray(edges.pt_idx)
    val = np.asarray(edges.valid)
    uv = np.asarray(edges.uv)
    counts = np.bincount(cam_idx[val], minlength=args.K)
    N = 1 << int(np.ceil(np.log2(max(int(counts.max()), 4))))
    pt_g = np.zeros((args.K, N), np.int32)
    uv_g = np.zeros((args.K, N, 2), np.float32)
    val_g = np.zeros((args.K, N), bool)
    fill = np.zeros(args.K, np.int32)
    for o in np.where(val)[0]:
        k = cam_idx[o]
        pt_g[k, fill[k]] = pt_idx[o]
        uv_g[k, fill[k]] = uv[o]
        val_g[k, fill[k]] = True
        fill[k] += 1
    import jax.numpy as jnp
    grid_edges = BAEdges(cam_idx=None, pt_idx=jnp.asarray(pt_g),
                         uv=jnp.asarray(uv_g),
                         inv_sigma2=jnp.ones((args.K, N), jnp.float32),
                         valid=jnp.asarray(val_g))
    try:
        t0 = time.perf_counter()
        r_g = ba.bundle_adjust(Rs, ts, Xs, fixed, grid_edges, cam, cfg,
                               two_phase=False, solver="dense")
        tg = np.asarray(r_g.t)
        results["cases"]["single_grid_dense"] = {
            "wall_s_incl_compile": round(time.perf_counter() - t0, 1),
            "final_cost": robust_cost(r_g.R, r_g.t, r_g.points, edges,
                                      cam, cfg),
            # informational only: after a FIXED 10-iteration budget two
            # correct LM solvers sit at different surface points (f32
            # accept/reject divergence) — cost is the comparison metric
            "max_t_delta_vs_sharded_m": float(np.abs(tg - t_sh).max()),
        }
    except Exception as e:
        results["cases"]["single_grid_dense"] = {"error": repr(e)[:300]}
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
