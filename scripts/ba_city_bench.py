"""City-scale BA benchmark on the real chip (VERDICT r2 item 6).

Measures bundle-adjust ms/LM-iteration for the dense-Schur and matrix-free
CG solvers at local-BA scale (64 KF x 8k pts) and city scale
(256 KF x 16k pts), with an XLA device-trace capture for the large case and
a speed-of-light estimate from the dominant contraction's FLOPs
(BASELINE.md "BA ms/iter" row).

The problem is a rendered ring world (keyframes on a circle observing an
annulus of landmarks) with Gaussian noise on points and poses, so the LM
iterations do real work.  Timing methodology per memory note
axon-tpu-environment: vary inputs, time steady-state calls after a warmup
compile of each iteration bucket; ms/iter comes from the difference of two
bucket sizes, which cancels the relay's fixed per-call cost (reported too).

Usage:
    python scripts/ba_city_bench.py --out BA_CITY_r03.json   (on the TPU)
    python scripts/ba_city_bench.py --cpu                    (methodology test)
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def make_problem(rng, K, P, obs_per_pt=6, noise=0.02, layout="flat"):
    """Ring world matching the endurance run's geometry: keyframes on a
    radius-3 circle around (3,0,0), landmarks in an annulus around it.

    layout="grid" re-expresses the same observations in the camera-major
    [K, N] table (bundle_adjust.BAEdges GRID mode; N = pow2 of the max
    per-camera edge count, invalid slots masked)."""
    from orb_slam_tpu.solvers.bundle_adjust import BAEdges
    center = np.array([3.0, 0.0, 0.0], np.float32)
    th_k = np.linspace(0, 2 * np.pi, K, endpoint=False)
    C = np.stack([3 * (1 - np.cos(th_k)), np.zeros(K), 3 * np.sin(th_k)],
                 1).astype(np.float32)
    Rs, ts = [], []
    for k in range(K):
        tangent = np.array([np.sin(th_k[k]), 0, np.cos(th_k[k])], np.float32)
        to_c = center - C[k]
        to_c = to_c / max(np.linalg.norm(to_c), 1e-6)
        f = tangent + 0.8 * to_c
        f /= np.linalg.norm(f)
        d = np.array([0.0, 1.0, 0.0], np.float32)
        r = np.cross(d, f); r /= np.linalg.norm(r)
        Rc2w = np.stack([r, d, f], 1).astype(np.float32)
        R = Rc2w.T
        Rs.append(R)
        ts.append(-R @ C[k])
    Rs = np.stack(Rs); ts = np.stack(ts)

    th_p = rng.uniform(0, 2 * np.pi, P)
    r_p = np.sqrt(rng.uniform(4.0, 36.0, P))
    X = np.stack([center[0] + r_p * np.sin(th_p), rng.uniform(-2, 2, P),
                  center[2] + r_p * np.cos(th_p)], 1).astype(np.float32)

    # observations: for each point, the obs_per_pt keyframes where its
    # projection lands in-image with positive depth
    fx = fy = 500.0; cx, cy = 320.0, 240.0
    xc_all = np.einsum("kij,pj->pki", Rs, X) + ts[None, :, :]   # [P,K,3]
    z_all = xc_all[:, :, 2]
    u_all = fx * xc_all[:, :, 0] / np.maximum(z_all, 1e-6) + cx
    v_all = fy * xc_all[:, :, 1] / np.maximum(z_all, 1e-6) + cy
    vis = (z_all > 0.5) & (u_all > 0) & (u_all < 640) \
        & (v_all > 0) & (v_all < 480)
    # pick obs_per_pt visible keyframes per point (rank visible first)
    order = np.argsort(~vis, axis=1, kind="stable")[:, :obs_per_pt]
    rowsel = np.arange(P)[:, None]
    cam_idx = order.reshape(-1).astype(np.int32)
    pt_idx = np.repeat(np.arange(P), obs_per_pt).astype(np.int32)
    valid = vis[rowsel, order].reshape(-1)
    uv = np.stack([u_all[rowsel, order].reshape(-1),
                   v_all[rowsel, order].reshape(-1)], 1)
    uv = uv + rng.normal(0, 0.5, uv.shape)   # pixel noise -> nonzero cost

    if layout == "grid":
        counts = np.bincount(cam_idx[valid], minlength=K)
        N = 1 << int(np.ceil(np.log2(max(int(counts.max()), 4))))
        pt_g = np.zeros((K, N), np.int32)
        uv_g = np.zeros((K, N, 2), np.float32)
        val_g = np.zeros((K, N), bool)
        fill = np.zeros(K, np.int32)
        for o in np.where(valid)[0]:
            k = cam_idx[o]
            pt_g[k, fill[k]] = pt_idx[o]
            uv_g[k, fill[k]] = uv[o]
            val_g[k, fill[k]] = True
            fill[k] += 1
        edges = BAEdges(
            cam_idx=None, pt_idx=jnp.asarray(pt_g), uv=jnp.asarray(uv_g),
            inv_sigma2=jnp.ones((K, N), jnp.float32),
            valid=jnp.asarray(val_g))
    else:
        edges = BAEdges(
            cam_idx=jnp.asarray(cam_idx), pt_idx=jnp.asarray(pt_idx),
            uv=jnp.asarray(uv.astype(np.float32)),
            inv_sigma2=jnp.ones(len(cam_idx), jnp.float32),
            valid=jnp.asarray(valid))
    Xn = X + rng.normal(0, noise, X.shape).astype(np.float32)
    tn = ts + rng.normal(0, noise, ts.shape).astype(np.float32)
    fixed = np.zeros(K, bool); fixed[0] = True
    from orb_slam_tpu.geometry.camera import make_camera
    from orb_slam_tpu.config import CameraConfig
    cam = make_camera(CameraConfig(
        fx=fx, fy=fy, cx=cx, cy=cy, k1=0, k2=0, p1=0, p2=0, k3=0,
        width=640, height=480))
    return (jnp.asarray(Rs), jnp.asarray(tn), jnp.asarray(Xn),
            jnp.asarray(fixed), edges, cam, int(valid.sum()))


def time_case(K, P, solver, reps=3, seed=0, i_lo=4, i_hi=14,
              layout="flat", placement="scatter"):
    """ms/LM-iteration via two warmed iteration buckets: the difference
    (t_hi - t_lo) / (i_hi - i_lo) cancels the fixed per-call cost (relay
    round trip + device-to-host points readback), which is also reported.
    Methodology note (ADVICE r3): per_call_floor_s INCLUDES the
    np.asarray(points) fetch — through the axon relay
    jax.block_until_ready can return before execution completes, so a
    real readback is the only honest completion barrier; rounds 1-2 used
    block_until_ready-only floors and are not directly comparable.
    Both buckets are compiled in a warmup pass before any timed call;
    a non-positive ms/iter means the measurement is invalid (it was the
    r3 artifact's 64KF-dense defect) and is flagged."""
    from orb_slam_tpu.solvers import bundle_adjust as ba
    from orb_slam_tpu.config import SolverConfig
    rng = np.random.default_rng(seed)

    def run(iters):
        Rs, ts, Xs, fixed, edges, cam, n_obs = make_problem(
            rng, K, P, layout=layout)
        cfg = SolverConfig(global_ba_iters=iters)
        t0 = time.perf_counter()
        res = ba.bundle_adjust(Rs, ts, Xs, fixed, edges, cam, cfg=cfg,
                               two_phase=False, solver=solver,
                               placement=placement)
        np.asarray(res.points)   # real completion barrier (see docstring)
        return time.perf_counter() - t0, res, n_obs

    run(i_lo); run(i_hi)                     # compile both buckets
    lo = [run(i_lo) for _ in range(reps)]
    hi = [run(i_hi) for _ in range(reps)]
    t_lo = min(r[0] for r in lo)
    t_hi = min(r[0] for r in hi)
    res, n_obs = hi[-1][1], hi[-1][2]
    ms_per_iter = (t_hi - t_lo) / (i_hi - i_lo) * 1e3
    return dict(K=K, P=P, n_obs=n_obs, solver=solver, layout=layout,
                placement=(placement if layout == "grid" else None),
                iters=(i_lo, i_hi),
                wall_lo_s=round(t_lo, 3), wall_hi_s=round(t_hi, 3),
                ms_per_iter=round(ms_per_iter, 3),
                valid=bool(ms_per_iter > 0),
                per_call_floor_s=round(t_lo, 3),
                per_call_floor_includes_points_readback=True,
                final_cost=float(res.cost))


def speed_of_light(K, P, solver, cg_iters=48):
    """Per-LM-iteration floor for the half-matrix formulation
    (S = Hcc - G G^T, G [6K,3P]; solvers/bundle_adjust._half_schur).

    dense: dominated by the G @ G^T MXU matmul — 2*(3P)*(6K)^2 f32 FLOPs —
    with an HBM floor of ~3 passes over G (scatter-build, read twice).
    cg: dominated by HBM traffic — 2 passes over G per CG step.
    v5e: ~49 TFLOP/s f32 (half of bf16 peak), ~0.8 TB/s HBM."""
    v5e_f32 = 98e12 / 2
    hbm = 0.8e12
    g_bytes = (6 * K) * (3 * P) * 4.0
    if solver == "dense":
        flops = 2.0 * (3 * P) * (6 * K) ** 2 + (6 * K) ** 3 / 3.0
        return max(flops / v5e_f32, 3 * g_bytes / hbm) * 1e3
    return cg_iters * 2 * g_bytes / hbm * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="")
    ap.add_argument("--trace-dir", default="/tmp/ba_city_trace")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    results = {"backend": jax.default_backend(),
               "device": str(jax.devices()[0]),
               "iters": args.iters, "cases": []}
    # Cases cover the single-chip envelope and, honestly, its edge: at
    # 512 KF x 24.5k pts XLA's lowering of the FLAT layout's two-index
    # (cam, pt) G block scatter materializes the update tensor with the
    # 6-wide dim tile-padded to 128 lanes (a [6,3,K*P] buffer claiming
    # ~24 GB > 16 GB HBM), so the flat case is recorded as failed rather
    # than skipped — with the diagnosis IN the artifact (VERDICT r4 weak
    # #5).  The GRID layout (camera-major [K,N] table, r5) removes the
    # two-index scatter entirely; its 512-KF row is the city-scale
    # deliverable (VERDICT r4 missing #3).
    FLAT_SCATTER_DIAGNOSIS = (
        "flat-layout two-index (cam,pt) block scatter: XLA materializes "
        "the update as a [6,3,K*P] buffer tile-padded to 128 lanes, "
        "~24 GB > 16 GB HBM at K=512,P=24576; the grid layout avoids "
        "the scatter (bundle_adjust.BAEdges GRID mode)")
    HELPER_DIAGNOSIS = (
        "tunnel infra, not HLO: since r5 the relay routes fresh large "
        "compiles to a chipless AOT helper (axon_terminal "
        "tpu_compile_helper) whose libtpu init crashes terminal-side on "
        "TPU_ACCELERATOR_TYPE/TPU_WORKER_HOSTNAMES detection after "
        "env_clear — reproduced identically across precisions, layouts "
        "and client env vars (they do not propagate).  The SAME grid "
        "programs compile and solve 512 KF x 24.5k pts on the CPU "
        "backend (DIST_BA_CITY_r05.json single_grid_dense), so the "
        "memory-wall story is settled by construction (grid's largest "
        "buffer is the [K,P,6,3] output, 7.2 GB at 512 KF) while the "
        "on-chip row waits on the helper fix")
    results["precision_note"] = (
        "all cases solve at SolverConfig.ba_matmul_precision (default "
        "float32 since BA_PRECISION_r05.json: the TPU default bf16 "
        "matmul passes plateau LM ~77% above the f32 optimum at no "
        "wall-time benefit)")
    cases = ((64, 8192), (256, 16384), (512, 24576))
    if args.cpu:
        cases = ((64, 8192),)   # methodology smoke test only
    variants = (("dense", "flat", "scatter"), ("cg", "flat", "scatter"),
                ("dense", "grid", "scatter"), ("dense", "grid", "onehot"),
                ("cg", "grid", "scatter"))
    for (K, P) in cases:
        for solver, layout, placement in variants:
            try:
                r = time_case(K, P, solver, layout=layout,
                              placement=placement)
            except Exception as e:
                r = dict(K=K, P=P, solver=solver, layout=layout,
                         placement=placement, valid=False,
                         error=repr(e)[:300])
                if "remote_compile" in repr(e):
                    r["diagnosis"] = HELPER_DIAGNOSIS
                elif layout == "flat" and K >= 512:
                    r["diagnosis"] = FLAT_SCATTER_DIAGNOSIS
            r["speed_of_light_ms"] = round(speed_of_light(K, P, solver), 3)
            results["cases"].append(r)
            print(json.dumps(r), flush=True)
    # VERDICT r4 #7 written analysis: why dense ms/iter sits far above the
    # contraction floor at local-BA sizes, and what closes it
    results["sol_analysis"] = (
        "at 64 KF the G G^T contraction floor is 0.148 ms but a warm "
        "14-iteration call costs ~0.35 s end-to-end: ~0.1 s is the relay "
        "per-call floor (upload + points readback), and the per-iteration "
        "remainder is NOT the MXU matmul — the device trace shows the G "
        "placement (a [K,P,6,3] block scatter / per-camera one-hot) and "
        "the [6K,6K] LU solve dominating, both VPU/memory-layout ops "
        "whose cost scales with the G buffer, not with useful FLOPs.  "
        "The floor is unreachable on this architecture for SMALL K "
        "because placement cost ~ G bytes (fixed per iteration) dwarfs "
        "the 0.1-ms-scale matmul; it closes as K grows (matmul is "
        "O(P K^2), placement O(P K)): measured 130x off floor at 64 KF, "
        "13x at 256 KF, and the sharded solver's per-device slab "
        "continues that trend.  g2o's real-time 5+10 its/KF on a 2014 "
        "CPU rides CHOLMOD sparsity instead — the TPU-native equivalent "
        "of 'exploit sparsity' is exactly the landmark-sharded psum "
        "Schur (parallel/dist_ba), not a sparse single-chip kernel XLA "
        "cannot tile")
    # the dense/CG crossover (VERDICT r3 item 3): smallest K where CG wins
    # (compared within the same layout; grid is the production layout)
    by_k = {}
    for r in results["cases"]:
        if r.get("layout") == "grid" and r.get("placement") != "onehot":
            by_k.setdefault(r["K"], {})[r["solver"]] = r
    cross = [k for k, d in sorted(by_k.items())
             if "cg" in d and "dense" in d and d["cg"].get("valid")
             and d["dense"].get("valid")
             and d["cg"]["ms_per_iter"] <= d["dense"]["ms_per_iter"]]
    results["cg_beats_dense_at_K"] = cross
    results["crossover_K"] = cross[0] if cross else None

    # device trace of the large CG case (honest on-device time per op).
    # Warm-compile the exact traced configuration first (ADVICE r3: the
    # r3 trace captured pjit compile frames) and end with a real readback
    # inside the trace (block_until_ready can return early via the relay).
    try:
        from orb_slam_tpu.utils.profiling import device_trace, top_ops
        from orb_slam_tpu.solvers import bundle_adjust as ba
        from orb_slam_tpu.config import SolverConfig
        rng = np.random.default_rng(7)
        Rs, ts, Xs, fixed, edges, cam, _ = make_problem(rng, 256, 16384)
        cfg = SolverConfig(global_ba_iters=args.iters)
        np.asarray(ba.bundle_adjust(Rs, ts, Xs, fixed, edges, cam, cfg=cfg,
                                    two_phase=False, solver="cg").points)
        with device_trace(args.trace_dir):
            res = ba.bundle_adjust(Rs, ts, Xs, fixed, edges, cam, cfg=cfg,
                                   two_phase=False, solver="cg")
            np.asarray(res.points)
        results["top_ops_ms"] = [
            [round(d, 2), n] for d, n in top_ops(args.trace_dir)[:12]]
    except Exception as e:  # tracing is best-effort
        results["trace_error"] = repr(e)

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
