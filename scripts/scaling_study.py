"""Scaling-efficiency sweep for the distributed solvers (VERDICT r1 item 2).

Runs the landmark-sharded two-phase BA and the keyframe-block-sharded
essential graph at 1/2/4/8 virtual devices and prints iters/s + parallel
efficiency.  On virtual CPU devices the shards share cores, so the numbers
validate that per-iteration collective cost stays flat as the mesh grows
(the layout's point: one psum of the reduced system per iteration,
independent of landmark/edge count) — real speedup needs real chips.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/scaling_study.py [--points-per-dev 2048] [--kfs 16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("ORB_SLAM_TPU_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.config import CameraConfig, SolverConfig
from orb_slam_tpu.geometry import camera as cam_mod
from orb_slam_tpu.parallel import dist_ba, dist_pose_graph
from orb_slam_tpu.solvers.bundle_adjust import BAEdges
from orb_slam_tpu.solvers import pose_graph as pg


def make_ba_problem(rng, K, P_total, cam):
    X = np.stack([rng.uniform(-4, 4, P_total), rng.uniform(-2, 2, P_total),
                  rng.uniform(3, 9, P_total)], 1).astype(np.float32)
    Rs = jnp.tile(jnp.eye(3, dtype=jnp.float32), (K, 1, 1))
    ts = jnp.asarray(np.stack([[-0.1 * k, 0.0, 0.0] for k in range(K)]),
                     jnp.float32)
    ci, pi, uvs = [], [], []
    for k in range(K):
        xc = X + np.asarray(ts)[k]
        uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
                       500 * xc[:, 1] / xc[:, 2] + 240], 1)
        ci.append(np.full(P_total, k))
        pi.append(np.arange(P_total))
        uvs.append(uv + rng.normal(0, 0.3, uv.shape))
    edges = BAEdges(
        cam_idx=jnp.asarray(np.concatenate(ci), jnp.int32),
        pt_idx=jnp.asarray(np.concatenate(pi), jnp.int32),
        uv=jnp.asarray(np.concatenate(uvs), jnp.float32),
        inv_sigma2=jnp.ones(K * P_total, jnp.float32),
        valid=jnp.ones(K * P_total, bool))
    return X, Rs, ts, edges


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points-per-dev", type=int, default=2048)
    ap.add_argument("--kfs", type=int, default=16)
    ap.add_argument("--pg-kfs", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    n_dev = len(jax.devices())
    sizes = sorted({d for d in (1, 2, 4, 8, n_dev) if d <= n_dev})
    rng = np.random.default_rng(0)
    cam = cam_mod.make_camera(CameraConfig(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0, width=640, height=480))
    cfg = SolverConfig()
    n_it = cfg.local_ba_iters1 + cfg.local_ba_iters2

    # fixed total problem size (strong scaling)
    P_total = args.points_per_dev * max(sizes)
    X, Rs, ts, edges = make_ba_problem(rng, args.kfs, P_total, cam)
    fixed = jnp.asarray(np.arange(args.kfs) == 0)

    print(f"# BA strong scaling: K={args.kfs} P={P_total} "
          f"O={P_total * args.kfs} two_phase iters={n_it}")
    rows = []
    for d in sizes:
        mesh = dist_ba.make_mesh(d)
        prob = dist_ba.partition_problem(X, edges, d)

        def run():
            out = dist_ba.bundle_adjust_sharded(
                mesh, Rs, ts, prob, fixed, cam, cfg, two_phase=True)
            jax.block_until_ready(out[:3])

        run()  # compile + warm
        best = min(_timeit(run) for _ in range(args.reps))
        rows.append((d, n_it / best))
        eff = rows[-1][1] / (rows[0][1] * d) * 100
        print(f"  {d} dev: {n_it / best:8.2f} it/s   "
              f"speedup x{rows[-1][1] / rows[0][1]:.2f}   eff {eff:.0f}%")

    # pose graph: ring of pg_kfs keyframes + loop edge + covisibility chords
    n = args.pg_kfs
    s0 = jnp.ones(n)
    R0 = jnp.tile(jnp.eye(3), (n, 1, 1))
    t0 = jnp.asarray(rng.normal(0, 0.1, (n, 3)).astype(np.float32))
    ei = list(range(1, n)) + [n - 1] + [k for k in range(2, n)]
    ej = list(range(n - 1)) + [0] + [k - 2 for k in range(2, n)]
    E = len(ei)
    edges_pg = pg.Sim3Edges(
        i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
        s_meas=jnp.ones(E), R_meas=jnp.tile(jnp.eye(3), (E, 1, 1)),
        t_meas=jnp.zeros((E, 3)), valid=jnp.ones(E, bool))
    fixed_pg = jnp.asarray(np.arange(n) == 0)
    n_pg_it = cfg.essential_graph_iters

    print(f"# essential-graph strong scaling: K={n} E={E} iters={n_pg_it}")
    rows = []
    for d in sizes:
        mesh = dist_ba.make_mesh(d)
        sharded = dist_pose_graph.partition_edges(edges_pg, n, d)

        def run():
            out = dist_pose_graph.optimize_essential_graph_sharded(
                mesh, s0, R0, t0, fixed_pg, sharded, n_iters=n_pg_it)
            jax.block_until_ready(out)

        run()
        best = min(_timeit(run) for _ in range(args.reps))
        rows.append((d, n_pg_it / best))
        eff = rows[-1][1] / (rows[0][1] * d) * 100
        print(f"  {d} dev: {n_pg_it / best:8.2f} it/s   "
              f"speedup x{rows[-1][1] / rows[0][1]:.2f}   eff {eff:.0f}%")


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
