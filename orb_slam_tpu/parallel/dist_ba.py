"""Distributed bundle adjustment: landmark-sharded Schur reduction over a
device mesh (SURVEY.md §2.3 / §7 phase 10; BASELINE.json north star).

Layout:
  * cameras (keyframe poses) are REPLICATED — the reduced camera system is
    small (6K x 6K) and every device needs it;
  * landmarks and their observations are SHARDED over the mesh 'data' axis —
    every edge lives on the shard that owns its landmark, so the per-landmark
    3x3 Schur elimination is entirely local;
  * each device assembles its partial reduced camera system
    S_local = Hcc_local - W Hpp^-1 W^T over its landmarks, and a single
    `psum` over the mesh yields the full reduced system (the "psum of
    reduced camera systems" collective of the north star);
  * the dense solve runs replicated (identical on all devices — no
    broadcast needed), landmark back-substitution is local again.

Communication per LM iteration: one psum of [K*6, K*6] + [K, 6] + a few
scalars — independent of the landmark count, so scaling efficiency grows
with map size.  Collectives ride ICI inside a pod slice.

This module is mesh-shape agnostic: tests exercise it on a virtual 8-device
CPU mesh (tests/conftest.py), the driver dry-runs it via
__graft_entry__.dryrun_multichip, and on a real slice the same code spans
hosts over DCN.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import SolverConfig
from ..geometry import se3
from ..geometry.camera import CameraParams
from ..solvers.bundle_adjust import (BAEdges, _edge_terms, _pcg_solve,
                                     _robust_cost)
from ..solvers.pose_opt import _huber_weight


class ShardedBAProblem(NamedTuple):
    """Host-partitioned BA problem: leading axis = device shard."""

    Xs: jnp.ndarray          # [D, P_shard, 3] landmarks (sharded)
    cam_idx: jnp.ndarray     # [D, O_shard] int32
    pt_idx: jnp.ndarray      # [D, O_shard] int32 — LOCAL landmark index
    uv: jnp.ndarray          # [D, O_shard, 2]
    inv_sigma2: jnp.ndarray  # [D, O_shard]
    valid: jnp.ndarray       # [D, O_shard] bool
    src_idx: np.ndarray | None = None  # [D, O_shard] host int64 original edge
    #                                    index (-1 padding), for back-mapping
    n_points: int = 0        # true (unpadded) landmark count
    perm: np.ndarray | None = None  # [P_total] original->packed landmark
    #                                 permutation (spatial strategy), None
    #                                 when landmarks keep allocation order


def _next_pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1)).bit_length()


def _morton3(q: np.ndarray) -> np.ndarray:
    """[P, 3] uint32 (10-bit) -> interleaved 30-bit Morton codes."""
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x30000FF)
        v = (v | (v << 8)) & np.uint64(0x300F00F)
        v = (v | (v << 4)) & np.uint64(0x30C30C3)
        v = (v | (v << 2)) & np.uint64(0x9249249)
        return v
    return (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))


def partition_problem(
    Xs: np.ndarray, edges: BAEdges, n_shards: int,
    o_shard: int | None = None,
    strategy: str = "index",
) -> ShardedBAProblem:
    """Partition landmarks across shards and route each edge to its
    landmark's shard (host-side, keyframe-rate).

    strategy="index" keeps allocation order (SLAM allocation is roughly
    temporal, so contiguous blocks are already map-local for exploration);
    strategy="spatial" is map-block sharding (SURVEY §5.7): landmarks are
    Morton-ordered so each shard owns a compact spatial block — under
    revisits/loops, allocation order interleaves regions while spatial
    blocks keep each shard's edge set confined to few keyframes (the
    prerequisite for sparse per-shard camera systems at city scale).

    Per-shard edge capacity is padded to `o_shard` if given, else to the next
    power of two — a handful of shape buckets means the jitted solver
    compiles O(log) times over a run instead of once per keyframe."""
    P_total = Xs.shape[0]
    P_shard = -(-P_total // n_shards)
    pt = np.asarray(edges.pt_idx)

    perm = None
    if strategy == "spatial" and P_total > 0:
        X = np.asarray(Xs)
        lo = X.min(axis=0)
        span = np.maximum(X.max(axis=0) - lo, 1e-9)
        q = np.clip(((X - lo) / span * 1023), 0, 1023).astype(np.uint32)
        order = np.argsort(_morton3(q), kind="stable")  # packed rank -> orig
        perm = np.empty(P_total, np.int64)              # orig -> packed rank
        perm[order] = np.arange(P_total)
        Xs = np.asarray(Xs)[order]
        pt = perm[pt]

    owner = np.clip(pt // P_shard, 0, n_shards - 1)
    local_pt = pt - owner * P_shard

    O_shard = 0
    per_shard = []
    ev = np.asarray(edges.valid)
    for d in range(n_shards):
        sel = np.where((owner == d) & ev)[0]
        per_shard.append(sel)
        O_shard = max(O_shard, len(sel))
    O_shard = o_shard if o_shard is not None else _next_pow2(max(O_shard, 1))

    D = n_shards
    cam_idx = np.zeros((D, O_shard), np.int32)
    pt_idx = np.zeros((D, O_shard), np.int32)
    uv = np.zeros((D, O_shard, 2), np.float32)
    isig = np.ones((D, O_shard), np.float32)
    val = np.zeros((D, O_shard), bool)
    src = np.full((D, O_shard), -1, np.int64)
    for d, sel in enumerate(per_shard):
        n = len(sel)
        cam_idx[d, :n] = np.asarray(edges.cam_idx)[sel]
        pt_idx[d, :n] = local_pt[sel]
        uv[d, :n] = np.asarray(edges.uv)[sel]
        isig[d, :n] = np.asarray(edges.inv_sigma2)[sel]
        val[d, :n] = True
        src[d, :n] = sel

    X_pad = np.zeros((D * P_shard, 3), np.float32)
    X_pad[:P_total] = np.asarray(Xs)
    return ShardedBAProblem(
        Xs=jnp.asarray(X_pad.reshape(D, P_shard, 3)),
        cam_idx=jnp.asarray(cam_idx),
        pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uv),
        inv_sigma2=jnp.asarray(isig),
        valid=jnp.asarray(val),
        src_idx=src,
        n_points=P_total,
        perm=perm,
    )


def _put_global(mesh: Mesh, spec, tree):
    """Build global sharded arrays from full-size host copies.

    In a multi-process (jax.distributed) run, jit cannot auto-shard host
    numpy inputs — every process holds the SAME full problem (SLAM state is
    deterministic per process), so each process donates the shard slices it
    owns via make_array_from_callback."""
    from jax.sharding import NamedSharding
    s = NamedSharding(mesh, spec)

    def put(a):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, s, lambda idx: a[idx])

    return jax.tree.map(put, tree)


def _fetch_global(x) -> np.ndarray:
    """Full host copy of a (possibly cross-process-sharded) array."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


@lru_cache(maxsize=64)
def _sharded_ba_fn(mesh: Mesh, axis: str, n_iters: int, two_phase: bool,
                   cfg: SolverConfig, solver: str = "dense"):
    """Build (once per (mesh, schedule) combination) the jitted shard_map'd
    LM solver.  jax.jit then caches the compiled executable per input-shape
    bucket, so the live pipeline's repeated BA calls do not re-trace."""
    delta2 = cfg.huber_delta2

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(),                       # Rs, ts replicated
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            P(),                            # fixed mask replicated
            P(),                            # camera params replicated
        ),
        out_specs=(P(), P(), P(axis), P(axis)),
    )
    def run(Rs, ts, Xsh, ci, pi, uvl, isl, vl, fixed, cam):
        K = Rs.shape[0]
        # leading shard axis of size 1 inside the shard
        edges = BAEdges(cam_idx=ci[0], pt_idx=pi[0], uv=uvl[0],
                        inv_sigma2=isl[0], valid=vl[0])
        P_shard = Xsh.shape[1]
        free = (~fixed).astype(Rs.dtype)

        def make_step(active, use_robust):
          def step(carry, _):
            Rs, ts, Xl, lam = carry
            r, Jc, Jp, z = _edge_terms(Rs, ts, Xl, edges, cam)
            c2 = jnp.sum(r * r, axis=1) * edges.inv_sigma2
            w = _huber_weight(c2, delta2) if use_robust else jnp.ones_like(c2)
            w = w * edges.inv_sigma2 * active * (z > 0)

            JcTJc = jnp.einsum("oia,o,oib->oab", Jc, w, Jc)
            JpTJp = jnp.einsum("oia,o,oib->oab", Jp, w, Jp)
            JcTJp = jnp.einsum("oia,o,oib->oab", Jc, w, Jp)
            gc_o = jnp.einsum("oia,o,oi->oa", Jc, w, r)
            gp_o = jnp.einsum("oia,o,oi->oa", Jp, w, r)

            Hcc = jnp.zeros((K, 6, 6), Rs.dtype).at[edges.cam_idx].add(JcTJc)
            Hpp = jnp.zeros((P_shard, 3, 3), Rs.dtype).at[edges.pt_idx].add(JpTJp)
            gc = jnp.zeros((K, 6), Rs.dtype).at[edges.cam_idx].add(gc_o)
            gp = jnp.zeros((P_shard, 3), Rs.dtype).at[edges.pt_idx].add(gp_o)

            eye3 = jnp.eye(3, dtype=Rs.dtype)
            Hpp_d = Hpp + lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp)) \
                + 1e-8 * eye3
            Hpp_inv = jnp.linalg.inv(Hpp_d)
            Hcc = jax.lax.psum(Hcc, axis)
            gc = jax.lax.psum(gc, axis)
            Hcc_d = Hcc + lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hcc)) \
                + 1e-8 * jnp.eye(6, dtype=Rs.dtype)

            if solver == "cg":
                # matrix-free sharded Schur: never build [P_shard,K,6,3];
                # every CG matvec costs one [K,6] psum over the mesh
                A = JcTJp
                ci, pi = edges.cam_idx, edges.pt_idx
                y = jnp.einsum("pab,pb->pa", Hpp_inv, gp)
                g_sub = jnp.zeros((K, 6), Rs.dtype).at[ci].add(
                    jnp.einsum("oab,ob->oa", A, y[pi]))
                g_red = (gc - jax.lax.psum(g_sub, axis)) * free[:, None]

                AH = jnp.einsum("oab,obc->oac", A, Hpp_inv[pi])
                diag_sub = jnp.zeros((K, 6, 6), Rs.dtype).at[ci].add(
                    jnp.einsum("oac,obc->oab", AH, A))
                S_diag = Hcc_d - jax.lax.psum(diag_sub, axis)
                S_diag = (S_diag * free[:, None, None]
                          + jnp.eye(6, dtype=Rs.dtype)
                          * (1.0 - free)[:, None, None]
                          + 1e-8 * jnp.eye(6, dtype=Rs.dtype))
                P_inv = jnp.linalg.inv(S_diag)

                def matvec(v):
                    vk = v.reshape(K, 6) * free[:, None]
                    yp = jnp.zeros((P_shard, 3), v.dtype).at[pi].add(
                        jnp.einsum("oab,oa->ob", A, vk[ci]))
                    zp = jnp.einsum("pab,pb->pa", Hpp_inv, yp)
                    sub = jnp.zeros((K, 6), v.dtype).at[ci].add(
                        jnp.einsum("oab,ob->oa", A, zp[pi]))
                    out = (jnp.einsum("kab,kb->ka", Hcc_d, vk)
                           - jax.lax.psum(sub, axis))
                    out = out * free[:, None] + vk * (1.0 - free)[:, None]
                    return out.reshape(-1)

                def precond(r):
                    return jnp.einsum("kab,kb->ka", P_inv,
                                      r.reshape(K, 6)).reshape(-1)

                dxc = -_pcg_solve(matvec, precond, g_red.reshape(-1), 48)
                dxc = dxc.reshape(K, 6) * free[:, None]
                up = jnp.zeros((P_shard, 3), Rs.dtype).at[pi].add(
                    jnp.einsum("oab,oa->ob", A, dxc[ci]))
                dxp = -jnp.einsum("pab,pb->pa", Hpp_inv, gp + up)
            else:
                U = jnp.zeros((P_shard, K, 6, 3), Rs.dtype).at[
                    edges.pt_idx, edges.cam_idx].add(JcTJp)
                M = jnp.einsum("pkab,pbc->pkac", U, Hpp_inv)
                S_sub = jnp.einsum("pkac,plbc->kalb", M, U)
                g_sub = jnp.einsum("pkac,pc->ka", M, gp)

                # ---- the collective: psum of reduced camera systems ----
                S_sub = jax.lax.psum(S_sub, axis)
                g_sub = jax.lax.psum(g_sub, axis)

                S = -S_sub
                S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc_d)
                g_red = gc - g_sub

                S = S * free[:, None, None, None] * free[None, None, :, None]
                S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(
                    jnp.einsum("k,ab->kab", 1.0 - free,
                               jnp.eye(6, dtype=Rs.dtype)))
                g_red = g_red * free[:, None]

                dxc = -jnp.linalg.solve(S.reshape(6 * K, 6 * K),
                                        g_red.reshape(-1))
                dxc = dxc.reshape(K, 6)
                dxp = -jnp.einsum(
                    "pab,pb->pa", Hpp_inv,
                    gp + jnp.einsum("pkac,ka->pc", U, dxc))

            Rs1, ts1 = jax.vmap(se3.retract)(Rs, ts, dxc)
            Xl1 = Xl + dxp

            r1, _, _, z1 = _edge_terms(Rs1, ts1, Xl1, edges, cam)
            cost_old = jax.lax.psum(
                _robust_cost(r, z, edges.inv_sigma2, active, delta2), axis)
            cost_new = jax.lax.psum(
                _robust_cost(r1, z1, edges.inv_sigma2, active, delta2), axis)
            bad_p = jax.lax.psum(
                jnp.sum(~jnp.isfinite(dxp)), axis)  # replicated finiteness
            accept = (cost_new < cost_old) & jnp.all(jnp.isfinite(dxc)) \
                & (bad_p == 0)
            Rs = jnp.where(accept, Rs1, Rs)
            ts = jnp.where(accept, ts1, ts)
            Xl = jnp.where(accept, Xl1, Xl)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            return (Rs, ts, Xl, lam), cost_new
          return step

        def chi2_inliers(Rs, ts, Xl):
            r, _, _, z = _edge_terms(Rs, ts, Xl, edges, cam)
            c2 = jnp.sum(r * r, axis=1) * edges.inv_sigma2
            return edges.valid & (c2 <= cfg.local_ba_chi2) & (z > 0)

        lam0 = jnp.asarray(cfg.lm_lambda_init, Rs.dtype)
        Xl = Xsh[0]
        if two_phase:
            active = edges.valid.astype(Rs.dtype)
            (Rs, ts, Xl, lam0), _ = jax.lax.scan(
                make_step(active, True), (Rs, ts, Xl, lam0), None,
                length=cfg.local_ba_iters1)
            active = chi2_inliers(Rs, ts, Xl).astype(Rs.dtype)
            (Rs, ts, Xl, _), _ = jax.lax.scan(
                make_step(active, False), (Rs, ts, Xl, lam0), None,
                length=cfg.local_ba_iters2)
        else:
            active = edges.valid.astype(Rs.dtype)
            (Rs, ts, Xl, _), _ = jax.lax.scan(
                make_step(active, True), (Rs, ts, Xl, lam0), None,
                length=n_iters)
        inl = chi2_inliers(Rs, ts, Xl)
        return Rs, ts, Xl[None], inl[None]

    return run


def bundle_adjust_sharded(
    mesh: Mesh,
    Rs: jnp.ndarray,
    ts: jnp.ndarray,
    prob: ShardedBAProblem,
    fixed: jnp.ndarray,
    cam: CameraParams,
    cfg: SolverConfig = SolverConfig(),
    n_iters: int = 15,
    axis: str = "data",
    two_phase: bool = False,
    solver: str = "dense",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Distributed LM.  two_phase=True runs the reference local-BA schedule
    (cfg.local_ba_iters1 robust its, per-shard chi2 outlier gate, then
    cfg.local_ba_iters2 plain its — Optimizer.cc:450-494; the gate is
    per-edge, so gating locally on each shard is exactly the global gate);
    otherwise n_iters robust its.  Returns (Rs, ts, Xs [D, P_shard, 3],
    edge_inliers [D, O_shard])."""
    run = _sharded_ba_fn(mesh, axis, n_iters, two_phase, cfg, solver)
    args = (Rs, ts, prob.Xs, prob.cam_idx, prob.pt_idx, prob.uv,
            prob.inv_sigma2, prob.valid, fixed, cam)
    if jax.process_count() > 1:
        rep = _put_global(mesh, P(), (Rs, ts, fixed, cam))
        shd = _put_global(mesh, P(axis),
                          (prob.Xs, prob.cam_idx, prob.pt_idx, prob.uv,
                           prob.inv_sigma2, prob.valid))
        args = (rep[0], rep[1], *shd, rep[2], rep[3])
    # same accuracy contract as the single-device solver: trace every
    # shard-local contraction at cfg.ba_matmul_precision (the TPU default
    # bf16 passes plateau LM far above the f32 optimum,
    # BA_PRECISION_r05.json)
    with jax.default_matmul_precision(cfg.ba_matmul_precision):
        return run(*args)


def bundle_adjust_dist(
    Rs, ts, Xs, fixed, edges: BAEdges, cam: CameraParams,
    cfg: SolverConfig = SolverConfig(), two_phase: bool = True,
    n_shards: int | None = None, mesh: Mesh | None = None,
    solver: str = "auto", strategy: str = "index", axis: str = "data",
):
    """Drop-in replacement for solvers.bundle_adjust.BAResult over a device
    mesh: landmark-sharded Schur + psum of reduced camera systems.  Used by
    LocalMapper when cfg.mesh.data_parallel > 1 — this IS the system's BA
    at scale, not a demo path (the reference's whole optimizer load,
    src/Optimizer.cc:287-536, distributes this way per BASELINE configs 4-5).
    """
    from ..solvers.bundle_adjust import BAResult

    if mesh is None:
        mesh = make_mesh(n_shards, axis=axis)
    else:
        axis = mesh.axis_names[0]
    D = mesh.devices.size
    prob = partition_problem(np.asarray(Xs), edges, D, strategy=strategy)
    if solver == "auto":
        # per-shard block-grid footprint decides, like the single-chip path
        grid_mb = prob.Xs.shape[1] * Rs.shape[0] * 18 * 4 / 1e6
        solver = "cg" if grid_mb > 256.0 else "dense"
    Rs1, ts1, Xsh, inl_sh = bundle_adjust_sharded(
        mesh, Rs, ts, prob, fixed, cam, cfg, axis=axis,
        n_iters=cfg.global_ba_iters, two_phase=two_phase, solver=solver)
    X_full = _fetch_global(Xsh).reshape(-1, 3)[: prob.n_points]
    if prob.perm is not None:  # spatial strategy: back to allocation order
        X_full = X_full[prob.perm]
    # back-map per-shard edge inliers to the original edge order
    O = np.asarray(edges.cam_idx).shape[0]
    inl = np.zeros(O, bool)
    src = prob.src_idx.reshape(-1)
    flat = _fetch_global(inl_sh).reshape(-1)
    ok = src >= 0
    inl[src[ok]] = flat[ok]
    # final cost parity with the single-device path is not needed by callers
    return BAResult(R=Rs1, t=ts1, points=jnp.asarray(X_full),
                    edge_inliers=jnp.asarray(inl),
                    cost=jnp.float32(0.0))


@lru_cache(maxsize=16)
def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))
