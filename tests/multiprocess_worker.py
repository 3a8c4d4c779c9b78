"""One SLAM backend process in a jax.distributed CPU cluster.

Executed as a subprocess by test_multiprocess.py (N processes x M local
CPU devices each).  Exercises, ACROSS REAL PROCESS BOUNDARIES:

  * parallel.hostmesh.maybe_init_distributed (the jax.distributed
    bootstrap, SURVEY.md §5.8) and the DCN x ICI host-mesh layout,
  * the landmark-sharded distributed BA (parallel/dist_ba.py) and
  * the keyframe-block-sharded essential graph
    (parallel/dist_pose_graph.py),

asserting each agrees with the single-device solver computed locally.
Results are written to $ORB_SLAM_TPU_TEST_OUT.<process_id> as JSON so the
launcher can cross-check that replicated outputs are identical on every
process (multi-controller JAX: every process must compute the same thing).
"""
import json
import os
import sys

import jax

# sitecustomize registers the tunneled TPU backend; this test is about
# process boundaries, not chips — force local CPU before any backend touch
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from orb_slam_tpu.config import SolverConfig
from orb_slam_tpu.geometry import sim3
from orb_slam_tpu.parallel import dist_ba, dist_pose_graph, hostmesh
from orb_slam_tpu.solvers import bundle_adjust as ba
from orb_slam_tpu.solvers import pose_graph

from test_bundle_adjust import build_problem, reproj_rmse


def ring_pose_graph(n=12, seed=3):
    """Drifted keyframe ring + exact relative-pose edges (incl. one loop
    edge) — the essential-graph test problem."""
    s_l = [jnp.ones(())]
    R_l = [jnp.eye(3)]
    t_l = [jnp.zeros(3)]
    rel = []
    for k in range(1, n):
        zeta = jnp.asarray(np.concatenate(
            [[0.3, 0.0, 0.02], [0.0, 2 * np.pi / n, 0.0], [0.0]]))
        rel.append(sim3.exp(zeta))
        sk, Rk, tk = sim3.compose(*rel[-1], s_l[-1], R_l[-1], t_l[-1])
        s_l.append(sk); R_l.append(Rk); t_l.append(tk)
    s_gt, R_gt, t_gt = jnp.stack(s_l), jnp.stack(R_l), jnp.stack(t_l)

    rng = np.random.default_rng(seed)
    s_l = [s_gt[0]]; R_l = [R_gt[0]]; t_l = [t_gt[0]]
    for k in range(1, n):
        noise = sim3.exp(jnp.asarray(rng.normal(0, 0.02, 7)))
        srn, Rrn, trn = sim3.compose(*noise, *rel[k - 1])
        sk, Rk, tk = sim3.compose(srn, Rrn, trn, s_l[-1], R_l[-1], t_l[-1])
        s_l.append(sk); R_l.append(Rk); t_l.append(tk)
    s0, R0, t0 = jnp.stack(s_l), jnp.stack(R_l), jnp.stack(t_l)

    ei, ej, sm, Rm, tm = [], [], [], [], []
    pairs = [(k, k - 1) for k in range(1, n)] + [(n - 1, 0)]
    for i, j in pairs:
        inv = sim3.inverse(s_gt[j], R_gt[j], t_gt[j])
        m = sim3.compose(s_gt[i], R_gt[i], t_gt[i], *inv)
        ei.append(i); ej.append(j)
        sm.append(m[0]); Rm.append(m[1]); tm.append(m[2])
    edges = pose_graph.Sim3Edges(
        i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
        s_meas=jnp.stack(sm), R_meas=jnp.stack(Rm), t_meas=jnp.stack(tm),
        valid=jnp.ones(len(ei), bool))
    fixed = jnp.asarray(np.arange(n) == 0)
    return s0, R0, t0, fixed, edges


def main():
    assert hostmesh.maybe_init_distributed(), \
        "ORB_SLAM_TPU_COORDINATOR/NUM_PROCS/PROC_ID must be set"
    pid = jax.process_index()
    out = {
        "process_index": pid,
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }

    # --- DCN x ICI host-mesh layout + a 2-axis collective ----------------
    mesh2d = hostmesh.make_host_mesh()
    out["mesh_shape"] = list(mesh2d.devices.shape)
    x = np.arange(jax.device_count(), dtype=np.float32).reshape(
        mesh2d.devices.shape)
    gx = dist_ba._put_global(mesh2d, P("model", "data"), x)
    tot = jax.jit(shard_map(
        lambda v: jax.lax.psum(jax.lax.psum(v.sum(), "data"), "model")
        * jnp.ones(()),
        mesh=mesh2d, in_specs=(P("model", "data"),), out_specs=P()))(gx)
    out["mesh_psum"] = float(np.asarray(tot))

    # --- distributed BA over every global device vs single-device --------
    rng = np.random.default_rng(21)
    p = build_problem(rng, n_kf=6, n_pts=256, noise=0.3)
    D = jax.device_count()
    res_d = dist_ba.bundle_adjust_dist(
        p["Rs0"], p["ts0"], p["X0"], p["fixed"], p["edges"], p["cam"],
        SolverConfig(), two_phase=False, n_shards=D)
    rmse_dist, _ = reproj_rmse(res_d.R, res_d.t, res_d.points,
                               p["edges"], p["cam"])
    res_s = ba.bundle_adjust(p["Rs0"], p["ts0"], p["X0"], p["fixed"],
                             p["edges"], p["cam"], two_phase=False)
    rmse_single, _ = reproj_rmse(res_s.R, res_s.t, res_s.points,
                                 p["edges"], p["cam"])
    rmse0, _ = reproj_rmse(p["Rs0"], p["ts0"], p["X0"], p["edges"], p["cam"])
    out["ba_rmse_init"] = float(rmse0)
    out["ba_rmse_dist"] = float(rmse_dist)
    out["ba_rmse_single"] = float(rmse_single)
    out["ba_ok"] = bool(rmse_dist < 0.25 * rmse0
                        and abs(rmse_dist - rmse_single) < 0.15)

    # --- sharded essential graph over the global mesh vs single ----------
    s0, R0, t0, fixed, edges = ring_pose_graph()
    mesh1d = dist_ba.make_mesh(D)
    sd, Rd, td, _ = dist_pose_graph.optimize_essential_graph_dist(
        s0, R0, t0, fixed, edges, n_iters=20, mesh=mesh1d)
    ss, Rs_, ts_, _ = pose_graph.optimize_essential_graph(
        s0, R0, t0, fixed, edges, n_iters=20)
    dt = float(np.abs(np.asarray(td) - np.asarray(ts_)).max())
    ds = float(np.abs(np.asarray(sd) - np.asarray(ss)).max())
    out["pg_dt_max"] = dt
    out["pg_ds_max"] = ds
    out["pg_ok"] = bool(dt < 1e-3 and ds < 1e-4)

    with open(os.environ["ORB_SLAM_TPU_TEST_OUT"] + f".{pid}", "w") as f:
        json.dump(out, f)
    print(f"proc {pid} done: {out}", flush=True)


if __name__ == "__main__":
    main()
