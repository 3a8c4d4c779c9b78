"""Bundle adjustment: batched Levenberg-Marquardt with Schur-complement
reduction of landmark blocks — the TPU replacement of g2o's
BlockSolver + OptimizationAlgorithmLevenberg pipeline used by
Optimizer::LocalBundleAdjustment / GlobalBundleAdjustemnt [sic]
(src/Optimizer.cc:38-152, :287-536).

Design (SURVEY.md §7 phase 6b): the map slice is flat SoA —
  poses    [K] (R [K,3,3], t [K,3]), fixed-camera gauge mask [K]
  points   [P,3]
  edges    flat observation list (cam_idx, pt_idx, uv, inv_sigma2, valid)
Per LM iteration, everything is one batched program:
  1. vmapped residuals + analytic Jacobians for all edges at once,
  2. scatter-add (segment-sum) of the 6x6/3x3/6x3 normal-equation blocks,
  3. per-landmark 3x3 inversion (Hpp is block diagonal),
  4. Schur complement S = Hcc - W Hpp^-1 W^T assembled with one einsum
     (an MXU contraction over the dense [P,K] block grid),
  5. dense Cholesky solve of the reduced [6K,6K] camera system,
  6. landmark back-substitution, LM accept/reject via jnp.where.
The reference's CHOLMOD sparse Cholesky is replaced by the dense reduced
solve: the local-BA camera system is small (K <= 64 -> 384x384); the Schur
*assembly*, which dominates, is where the batching wins.

The reference's two-phase schedule is preserved: 5 iterations, drop
observations with chi2 > 5.991 or negative depth, 10 more iterations
(Optimizer.cc:450-494), and the returned edge mask tells the caller which
observations to erase (Optimizer.cc:496-521).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import SolverConfig
from ..geometry import se3
from ..geometry.camera import CameraParams
from .pose_opt import _huber_weight


class BAEdges(NamedTuple):
    """Observation edges, in one of two layouts (static at trace time):

    FLAT (cam_idx is an [O] array): the classic compacted edge list.

    GRID (cam_idx is None, the other fields are [K, N]-leading): edges in
    camera-major observation-table layout — row k holds keyframe k's N
    observation slots verbatim (invalid slots masked).  The grid layout is
    how the map already stores observations (mapstore kf_obs [K, N]), and
    it removes every camera-indexed gather/scatter from the LM iteration:
    Hcc/gc/g_red become per-row reductions and the Schur half-matrix
    placement becomes a vmapped single-index scatter (the flat path's
    two-index block scatter is what materialized a ~24 GB update tensor
    and killed both solvers at 512 KF — BA_CITY_r04.json, VERDICT r4
    missing #3).  FLOP count is identical: the flat path already pads to
    O_cap = K*N."""
    cam_idx: Optional[jnp.ndarray]  # [O] int32, or None for GRID layout
    pt_idx: jnp.ndarray      # [O] / [K, N] int32
    uv: jnp.ndarray          # [O, 2] / [K, N, 2] float32 undistorted pixels
    inv_sigma2: jnp.ndarray  # [O] / [K, N] float32
    valid: jnp.ndarray       # [O] / [K, N] bool


class BAResult(NamedTuple):
    R: jnp.ndarray           # [K, 3, 3]
    t: jnp.ndarray           # [K, 3]
    points: jnp.ndarray      # [P, 3]
    edge_inliers: jnp.ndarray  # [O] bool (valid & chi2 below gate & z>0)
    cost: jnp.ndarray        # final robust cost
    # f32 [9K + 3K + 3P + O] packed copy of (R, t, points, inliers), built
    # in-program so the caller's write-back host work costs ONE fetch
    host_blob: Optional[jnp.ndarray] = None


def _edge_terms_grid(Rs, ts, Xs, pt, uv, cam: CameraParams):
    """Residuals and Jacobians for cam-major GRID edges (pt, uv are
    [K, N, ...]; camera k owns row k — no camera gather at all).

    Returns r [K,N,2], Jc [K,N,2,6], Jp [K,N,2,3], z [K,N]."""
    Xp = Xs[pt]                                           # [K, N, 3]
    xc = jnp.einsum("kij,knj->kni", Rs, Xp) + ts[:, None, :]
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    zi = 1.0 / jnp.maximum(z, 1e-6)
    u = x * zi * cam.fx + cam.cx
    v = y * zi * cam.fy + cam.cy
    r = jnp.stack([u, v], axis=-1) - uv

    fx, fy = cam.fx, cam.fy
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    Jpi = jnp.stack(
        [
            jnp.stack([fx * zi, zero, -fx * x * zi2], axis=-1),
            jnp.stack([zero, fy * zi, -fy * y * zi2], axis=-1),
        ],
        axis=-2,
    )  # [K, N, 2, 3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Xs.dtype), xc.shape + (3,))
    dxc = jnp.concatenate([eye, -se3.hat(xc)], axis=-1)   # [K, N, 3, 6]
    Jc = Jpi @ dxc                                        # [K, N, 2, 6]
    Jp = jnp.einsum("knia,kaj->knij", Jpi, Rs)            # [K, N, 2, 3]
    return r, Jc, Jp, z


def _edge_terms(Rs, ts, Xs, edges: BAEdges, cam: CameraParams):
    """Residuals and Jacobians for every edge.

    Returns r [O,2], Jc [O,2,6], Jp [O,2,3], z [O]."""
    Rk = Rs[edges.cam_idx]
    tk = ts[edges.cam_idx]
    Xp = Xs[edges.pt_idx]
    xc = jnp.einsum("oij,oj->oi", Rk, Xp) + tk
    x, y, z = xc[:, 0], xc[:, 1], xc[:, 2]
    zi = 1.0 / jnp.maximum(z, 1e-6)
    u = x * zi * cam.fx + cam.cx
    v = y * zi * cam.fy + cam.cy
    r = jnp.stack([u, v], axis=1) - edges.uv

    fx, fy = cam.fx, cam.fy
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    Jpi = jnp.stack(
        [
            jnp.stack([fx * zi, zero, -fx * x * zi2], axis=1),
            jnp.stack([zero, fy * zi, -fy * y * zi2], axis=1),
        ],
        axis=1,
    )  # [O, 2, 3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Xs.dtype), (xc.shape[0], 3, 3))
    dxc = jnp.concatenate([eye, -se3.hat(xc)], axis=2)  # [O, 3, 6]
    Jc = Jpi @ dxc                                       # [O, 2, 6]
    Jp = Jpi @ Rk                                        # [O, 2, 3]
    return r, Jc, Jp, z


def _terms_any(Rs, ts, Xs, edges: BAEdges, cam: CameraParams):
    """_edge_terms for either layout; outputs are edge-major ([O,...] flat,
    [K,N,...] grid)."""
    if edges.cam_idx is None:
        return _edge_terms_grid(Rs, ts, Xs, edges.pt_idx, edges.uv, cam)
    return _edge_terms(Rs, ts, Xs, edges, cam)


def _robust_cost(r, z, inv_sigma2, active, delta2):
    c2 = jnp.sum(r * r, axis=-1) * inv_sigma2
    # Huber rho(e^2): e^2 if below, 2 d sqrt(e^2) - d^2 above
    d = jnp.sqrt(delta2)
    rho = jnp.where(c2 <= delta2, c2, 2.0 * d * jnp.sqrt(jnp.maximum(c2, 1e-12)) - delta2)
    return jnp.sum(rho * active * (z > 0))


def _pcg_solve(matvec, precond, b, n_iters: int, x0=None):
    """Fixed-budget preconditioned conjugate gradient on the reduced camera
    system (compiler-friendly: lax.scan, no convergence-dependent shapes).
    Replaces g2o's CHOLMOD sparse Cholesky for problems where the dense
    [6K,6K] Schur matrix would not fit / its Cholesky would dominate.
    x0: optional warm start (the previous LM iteration's camera step —
    successive reduced systems differ only by damping and a small pose
    move, so the previous solution is an excellent initial guess)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    r0 = b - matvec(x0)
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)

    def step(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(step, (x0, r0, p0, rz0), None,
                                   length=n_iters)
    return x


def _chol3(A):
    """Closed-form batched 3x3 lower Cholesky (no LAPACK custom call —
    jnp.linalg.cholesky on [P,3,3] batches was a per-iteration custom
    call that dominated small-problem BA: dense 64 KF measured 33 ms/iter
    against a 0.15 ms compute floor before this)."""
    a00 = jnp.sqrt(jnp.maximum(A[..., 0, 0], 1e-20))
    l10 = A[..., 1, 0] / a00
    l20 = A[..., 2, 0] / a00
    a11 = jnp.sqrt(jnp.maximum(A[..., 1, 1] - l10 * l10, 1e-20))
    l21 = (A[..., 2, 1] - l20 * l10) / a11
    a22 = jnp.sqrt(jnp.maximum(
        A[..., 2, 2] - l20 * l20 - l21 * l21, 1e-20))
    z = jnp.zeros_like(a00)
    return jnp.stack([
        jnp.stack([a00, z, z], -1),
        jnp.stack([l10, a11, z], -1),
        jnp.stack([l20, l21, a22], -1),
    ], -2)


def _inv_lower3(L):
    """Closed-form inverse of a batched lower-triangular 3x3."""
    i00 = 1.0 / L[..., 0, 0]
    i11 = 1.0 / L[..., 1, 1]
    i22 = 1.0 / L[..., 2, 2]
    i10 = -L[..., 1, 0] * i00 * i11
    i20 = (L[..., 1, 0] * L[..., 2, 1] - L[..., 2, 0] * L[..., 1, 1]) \
        * i00 * i11 * i22
    i21 = -L[..., 2, 1] * i11 * i22
    z = jnp.zeros_like(i00)
    return jnp.stack([
        jnp.stack([i00, z, z], -1),
        jnp.stack([i10, i11, z], -1),
        jnp.stack([i20, i21, i22], -1),
    ], -2)


def _half_schur(L, A, edges, K: int):
    """The Schur half-matrix G [6K, 3P] with S = Hcc_d - G G^T.

    Factor Hpp_d^-1 = L L^T per landmark (L = C^-T from the closed-form
    3x3 Cholesky C C^T = Hpp_d) and PLACE the per-edge blocks U_o L_{p(o)}
    into a dense matrix ONCE per LM iteration.  Everything downstream
    becomes MXU matmuls: S assembly is one G @ G^T, and the matrix-free
    CG matvec is two G matvecs with ZERO inner-loop scatters (the r3
    edge-wise matvec paid 192 scatters per LM iteration at cg_iters=48 —
    scatter latency, not FLOPs, made CG lose to dense everywhere).

    L: [P,3,3] upper-triangular factor with L L^T = Hpp_d^-1 (the caller
    computes it closed-form alongside Hpp_inv).

    Layout lessons measured on the chip (all at 256 KF x 16k pts):
      * block scatter into [K,6,P,3] (mixed advanced/basic indexing)
        lowers to a [6,3,K*P] broadcast — 24 GB at 1024 KF, OOM;
      * an element GATHER into the flat [6K,3P] layout runs at VPU
        element rate — 728 ms for 75M elements (traced: one fusion was
        95% of the program);
      * a block scatter with ADJACENT advanced indices into [K,P,6,3]
        plus one transpose is the least-bad placement XLA offers
        (~90 ms/iter end-to-end) — the MXU matmul downstream of it IS
        at speed-of-light, the placement is the acknowledged gap
        (BA_CITY_r04.json analysis)."""
    Gblk = jnp.einsum("oab,obc->oac", A, L[edges.pt_idx])   # [O,6,3]
    P = L.shape[0]
    G4 = jnp.zeros((K, P, 6, 3), Gblk.dtype).at[
        edges.cam_idx, edges.pt_idx].add(Gblk)
    Gd = G4.transpose(0, 2, 1, 3).reshape(6 * K, 3 * P)
    return Gd, Gblk


def _place_grid(Gblk, pt, P: int, placement: str):
    """GRID-layout Schur half-matrix placement: put camera k's per-slot
    [6,3] blocks Gblk [K,N,6,3] at columns pt [K,N] of row-slab k, giving
    Gd [6K,3P].  Camera-major rows mean NO two-index scatter exists here —
    the flat path's (cam, pt) block scatter materialized a ~24 GB update
    tensor at 512 KF (BA_CITY_r04.json); both grid variants peak at the
    [K,P,6,3] output itself.

      scatter: vmap over K of a single-index row scatter (update buffer is
        just Gblk, [K,N,6,3]) + one transpose-copy to the [6K,3P] layout.
      onehot:  scan over K of an [18,N]x[N,P] MXU matmul that writes the
        [6,3P] slab directly in output layout (no transpose).  Placement
        by 0/1 matmul must run at Precision.HIGHEST: the TPU default
        (bf16 passes) truncates the f32 payload mantissa (measured 1.7e-2
        abs error, scripts/g_place_bench.py)."""
    K, N = pt.shape
    if placement == "onehot":
        def place(_, inp):
            p, b = inp                                     # [N], [N,6,3]
            oh = (p[:, None] == jnp.arange(P, dtype=p.dtype)[None, :]
                  ).astype(b.dtype)                        # [N, P]
            slab = jnp.einsum("nac,np->apc", b, oh,
                              precision=jax.lax.Precision.HIGHEST)
            return None, slab.reshape(6, 3 * P)
        _, G = jax.lax.scan(place, None, (pt, Gblk))       # [K, 6, 3P]
        return G.reshape(K * 6, P * 3)
    G4 = jax.vmap(
        lambda p, b: jnp.zeros((P, 6, 3), Gblk.dtype).at[p].add(b)
    )(pt, Gblk)                                            # [K, P, 6, 3]
    return G4.transpose(0, 2, 1, 3).reshape(K * 6, P * 3)


def _solve_reduced_cg(Hcc_d, g_red, diag_sub, Gd, free, K,
                      cg_iters: int, x0=None):
    """Matrix-free Schur solve: never materializes the [6K,6K] matrix.
    S v rides the half-matrix G (see _half_schur / _place_grid):
    S v = Hcc_d v - G (G^T v), two MXU matmuls per CG step.  The caller
    supplies the layout-specific pieces: the reduced gradient g_red [K,6]
    (already gauge-masked) and diag_sub [K,6,6] = the block diagonal of
    G G^T.

    Preconditioner: two-level additive Schwarz — the exact block diagonal
    of S (6x6 per camera, edge-wise from the same G blocks) PLUS a coarse
    correction over groups of consecutive cameras.  Block-Jacobi alone
    cannot damp the long-wavelength error of a trajectory graph (a K-long
    camera chain needs O(K) Jacobi-CG iterations — BA_CITY r3/r4 first
    cuts diverged at 256 KF within any fixed budget); the coarse space
    (piecewise-constant per group, the low-frequency modes of the chain)
    restores budget-independent convergence.  Sc = P S P^T costs one
    group-sum over G per LM iteration, its dense solve is tiny
    ([6*ngroups]^2), and both preconditioner parts are SPD so the sum is
    a valid PCG preconditioner."""
    freeC = free[:, None]
    P = Gd.shape[1] // 3

    S_diag = Hcc_d - diag_sub
    S_diag = (S_diag * free[:, None, None]
              + jnp.eye(6, dtype=Gd.dtype) * (1.0 - free)[:, None, None]
              + 1e-8 * jnp.eye(6, dtype=Gd.dtype))
    P_inv = jnp.linalg.inv(S_diag)                         # [K,6,6]

    # coarse level: aggregate free cameras into <=16 consecutive groups
    ngroups = min(16, K)
    gsz = -(-K // ngroups)
    gid = jnp.arange(K) // gsz                             # [K]
    Pmask = freeC                                          # exclude fixed
    Gslab = Gd.reshape(K, 6, 3 * P)
    PG = jax.ops.segment_sum(Gslab * Pmask[:, :, None], gid,
                             num_segments=ngroups)          # [g,6,3P]
    Hg = jax.ops.segment_sum(Hcc_d * Pmask[:, :, None], gid,
                             num_segments=ngroups)          # [g,6,6] row-sums
    # Sc[g1 a, g2 b] = sum_{k in g1, l in g2} S[k a, l b]:
    # Hcc_d is block-diagonal in k, so its contribution is group-diagonal
    PGm = PG.reshape(ngroups * 6, 3 * P)
    Sc = -(PGm @ PGm.T)
    Sc = Sc.reshape(ngroups, 6, ngroups, 6).at[
        jnp.arange(ngroups), :, jnp.arange(ngroups), :].add(Hg)
    Sc = Sc.reshape(ngroups * 6, ngroups * 6) \
        + 1e-6 * jnp.eye(ngroups * 6, dtype=Gd.dtype)
    Sc_inv = jnp.linalg.inv(Sc)

    def matvec(v):
        vm = (v.reshape(K, 6) * freeC).reshape(-1)
        out = jnp.einsum("kab,kb->ka", Hcc_d, vm.reshape(K, 6))
        out = out.reshape(-1) - Gd @ (Gd.T @ vm)
        out = out.reshape(K, 6) * freeC + v.reshape(K, 6) * (1.0 - freeC)
        return out.reshape(-1)

    def precond(r):
        rk = r.reshape(K, 6)
        fine = jnp.einsum("kab,kb->ka", P_inv, rk)
        rc = jax.ops.segment_sum(rk * Pmask, gid,
                                 num_segments=ngroups).reshape(-1)
        xc = (Sc_inv @ rc).reshape(ngroups, 6)
        coarse = xc[gid] * Pmask                            # prolong
        return (fine + coarse).reshape(-1)

    x0v = None if x0 is None else (x0 * freeC).reshape(-1)
    dxc = -_pcg_solve(matvec, precond, g_red.reshape(-1), cg_iters, x0=x0v)
    return dxc.reshape(K, 6) * freeC


@partial(jax.jit, static_argnames=("n_iters", "use_robust", "solver",
                                   "cg_iters", "placement"))
def _lm_phase(Rs, ts, Xs, fixed, edges: BAEdges, cam: CameraParams,
              lam0, active, n_iters: int, use_robust: bool,
              delta2: float, solver: str = "dense", cg_iters: int = 48,
              placement: str = "scatter"):
    K = Rs.shape[0]
    P = Xs.shape[0]
    grid = edges.cam_idx is None     # layout is static at trace time

    def step(carry, _):
        Rs, ts, Xs, lam, dxc_prev = carry
        r, Jc, Jp, z = _terms_any(Rs, ts, Xs, edges, cam)
        c2 = jnp.sum(r * r, axis=-1) * edges.inv_sigma2
        w = _huber_weight(c2, delta2) if use_robust else jnp.ones_like(c2)
        w = w * edges.inv_sigma2 * active * (z > 0)

        if grid:
            # camera-major rows: Hcc/gc are per-row reductions (NO
            # camera scatter); only the point-indexed blocks scatter,
            # single-index over the flattened [K*N] slots
            ptf = edges.pt_idx.reshape(-1)
            Hcc = jnp.einsum("knia,kn,knib->kab", Jc, w, Jc)   # [K,6,6]
            JcTJp = jnp.einsum("knia,kn,knib->knab", Jc, w, Jp)
            gc = jnp.einsum("knia,kn,kni->ka", Jc, w, r)       # [K,6]
            JpTJp = jnp.einsum("knia,kn,knib->knab", Jp, w, Jp)
            gp_o = jnp.einsum("knia,kn,kni->kna", Jp, w, r)
            Hpp = jnp.zeros((P, 3, 3), Rs.dtype).at[ptf].add(
                JpTJp.reshape(-1, 3, 3))
            gp = jnp.zeros((P, 3), Rs.dtype).at[ptf].add(
                gp_o.reshape(-1, 3))
        else:
            # normal-equation blocks (scatter-add over edges)
            JcTJc = jnp.einsum("oia,o,oib->oab", Jc, w, Jc)      # [O,6,6]
            JpTJp = jnp.einsum("oia,o,oib->oab", Jp, w, Jp)      # [O,3,3]
            JcTJp = jnp.einsum("oia,o,oib->oab", Jc, w, Jp)      # [O,6,3]
            gc_o = jnp.einsum("oia,o,oi->oa", Jc, w, r)          # [O,6]
            gp_o = jnp.einsum("oia,o,oi->oa", Jp, w, r)          # [O,3]

            Hcc = jnp.zeros((K, 6, 6), Rs.dtype).at[edges.cam_idx].add(JcTJc)
            Hpp = jnp.zeros((P, 3, 3), Rs.dtype).at[edges.pt_idx].add(JpTJp)
            gc = jnp.zeros((K, 6), Rs.dtype).at[edges.cam_idx].add(gc_o)
            gp = jnp.zeros((P, 3), Rs.dtype).at[edges.pt_idx].add(gp_o)

        # LM damping (multiplicative on block diagonals)
        eye6 = jnp.eye(6, dtype=Rs.dtype)
        eye3 = jnp.eye(3, dtype=Rs.dtype)
        Hcc_d = Hcc + lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hcc)) + 1e-8 * eye6
        Hpp_d = Hpp + lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp)) + 1e-8 * eye3

        # closed-form factorization (no batched-LAPACK custom calls):
        # C C^T = Hpp_d, L = C^-T, Hpp_inv = L L^T = Ci^T Ci
        Ci = _inv_lower3(_chol3(Hpp_d))                       # [P,3,3] C^-1
        Hpp_inv = jnp.einsum("pba,pbc->pac", Ci, Ci)
        free = (~fixed).astype(Rs.dtype)
        y = jnp.einsum("pab,pb->pa", Hpp_inv, gp)             # [P,3]

        if grid:
            L = Ci.transpose(0, 2, 1)
            Gblk = jnp.einsum("knab,knbc->knac", JcTJp,
                              L[edges.pt_idx])                # [K,N,6,3]
            Gd = _place_grid(Gblk, edges.pt_idx, P, placement)
            # g_red = gc - U Hpp^-1 gp: per-row reduction, no scatter
            g_red = gc - jnp.einsum("knab,knb->ka", JcTJp,
                                    y[edges.pt_idx])
        else:
            Gd, Gblk = _half_schur(Ci.transpose(0, 2, 1), JcTJp, edges, K)
            g_red = gc - jnp.zeros((K, 6), Rs.dtype).at[edges.cam_idx].add(
                jnp.einsum("oab,ob->oa", JcTJp, y[edges.pt_idx]))
        g_red = g_red * free[:, None]

        if solver == "cg":
            # exact block diagonal of G G^T for the preconditioner
            if grid:
                diag_sub = jnp.einsum("knac,knbc->kab", Gblk, Gblk)
            else:
                diag_sub = jnp.zeros((K, 6, 6), Rs.dtype).at[
                    edges.cam_idx].add(
                    jnp.einsum("oac,obc->oab", Gblk, Gblk))
            dxc = _solve_reduced_cg(
                Hcc_d, g_red, diag_sub, Gd, free, K, cg_iters,
                x0=-dxc_prev)  # see dxc_warm below
        else:
            # Schur complement via the half-matrix: S = Hcc_d - G G^T,
            # ONE MXU matmul (see _half_schur for why this replaced the
            # [P,K,6,3] block-grid einsums)
            S_sub = Gd @ Gd.T                                 # [6K,6K]
            S = -S_sub.reshape(K, 6, K, 6)
            S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc_d)

            # gauge: fixed cameras get identity rows/cols, zero gradient
            S = S * free[:, None, None, None] * free[None, None, :, None]
            S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(
                jnp.einsum("k,ab->kab", 1.0 - free,
                           jnp.eye(6, dtype=Rs.dtype))
            )
            dxc = -jnp.linalg.solve(S.reshape(6 * K, 6 * K),
                                    g_red.reshape(-1))
            dxc = dxc.reshape(K, 6)

        # landmark back-substitution (single point-indexed scatter)
        if grid:
            up = jnp.zeros((P, 3), Rs.dtype).at[
                edges.pt_idx.reshape(-1)].add(
                jnp.einsum("knab,ka->knb", JcTJp, dxc).reshape(-1, 3))
        else:
            up = jnp.zeros((P, 3), Rs.dtype).at[edges.pt_idx].add(
                jnp.einsum("oab,oa->ob", JcTJp, dxc[edges.cam_idx]))
        dxp = -jnp.einsum("pab,pb->pa", Hpp_inv, gp + up)

        Rs1, ts1 = jax.vmap(se3.retract)(Rs, ts, dxc)
        Xs1 = Xs + dxp

        r1, _, _, z1 = _terms_any(Rs1, ts1, Xs1, edges, cam)
        cost_old = _robust_cost(r, z, edges.inv_sigma2, active, delta2)
        cost_new = _robust_cost(r1, z1, edges.inv_sigma2, active, delta2)
        accept = (cost_new < cost_old) & jnp.all(jnp.isfinite(dxc)) & jnp.all(
            jnp.isfinite(dxp)
        )
        Rs = jnp.where(accept, Rs1, Rs)
        ts = jnp.where(accept, ts1, ts)
        Xs = jnp.where(accept, Xs1, Xs)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        # warm-start the next CG solve only from an ACCEPTED step — a
        # rejected step solved a system the damping then repudiated, and
        # seeding with it measurably degrades convergence (BA_CITY r4
        # first cut: 256 KF CG final cost 94.7k vs 48.3k dense)
        dxc_warm = jnp.where(accept, dxc, jnp.zeros_like(dxc))
        return (Rs, ts, Xs, lam, dxc_warm), cost_new

    (Rs, ts, Xs, lam, _), costs = jax.lax.scan(
        step, (Rs, ts, Xs, lam0, jnp.zeros((K, 6), Rs.dtype)), None,
        length=n_iters
    )
    return Rs, ts, Xs, lam, costs[-1]


def bundle_adjust(
    Rs: jnp.ndarray,
    ts: jnp.ndarray,
    Xs: jnp.ndarray,
    fixed: jnp.ndarray,
    edges: BAEdges,
    cam: CameraParams,
    cfg: SolverConfig = SolverConfig(),
    two_phase: bool = True,
    solver: str = "auto",
    cg_iters: int = 48,
    placement: str = "scatter",
    phase2: bool = True,
) -> BAResult:
    """Local/global BA.  fixed: [K] bool gauge mask (at least one True).

    two_phase=True follows the reference local-BA schedule (5 its, outlier
    edge removal at chi2 > 5.991 or z<=0, 10 more its).  two_phase=False runs
    cfg.global_ba_iters robust iterations (init/global BA,
    Optimizer.cc:38-152).  phase2=False is the aborted schedule — the
    reference polls mbAbortBA between the optimize(5) and optimize(10)
    calls (src/Optimizer.cc:450-494), so an interrupted local BA still
    delivers the first 5 robust iterations and the outlier gate.

    solver: both paths ride the Schur half-matrix G [6K,3P] with
    S = Hcc - G G^T (see _half_schur).  "dense" assembles S with one MXU
    matmul and solves the reduced [6K,6K] system exactly — O(P K^2) FLOPs
    per iteration; "cg" never forms S and runs warm-started two-level
    PCG whose matvecs are two G matmuls.  Measured reality
    (BA_CITY_r05.json, float32 precision): CG now matches dense's final
    cost exactly at every size that compiles (r4's cost gap was a bf16-
    matmul-precision artifact) but still loses ms/iter everywhere
    (64 KF: 29.4 vs 21.5; 256 KF: 144.4 vs 72.6) — no crossover exists,
    so "auto" is dense at every K.  CG is kept for the sharded solver
    (dist_ba), where the [6K,6K] dense S would be the psum payload, and
    as the fallback beyond dense-Cholesky memory limits."""
    if solver == "auto":
        solver = "dense"
    # fail BEFORE tracing when the half-matrix itself cannot fit (advisor
    # r4): both single-chip solvers materialize G [6K,3P] f32, so beyond
    # ~half of HBM the right tool is the mesh-sharded solver, whose
    # per-device slab is G/D (parallel/dist_ba.bundle_adjust_dist)
    g_bytes = 6 * int(Rs.shape[0]) * 3 * int(Xs.shape[0]) * 4
    if g_bytes > 8 << 30:
        raise ValueError(
            f"single-chip BA half-matrix G would be {g_bytes / 2**30:.1f} "
            f"GiB (K={Rs.shape[0]}, P={Xs.shape[0]}) — beyond the HBM "
            "budget on one chip; use parallel.dist_ba.bundle_adjust_dist "
            "(landmark-sharded: per-device slab is G/n_shards)")
    # the WHOLE schedule is one device program: the inter-phase chi2 gate
    # and the final inlier mask used to run eagerly (~300 tiny dispatches
    # per keyframe — each one a full round trip on latency-bound runtimes).
    # Traced under the configured matmul precision: the TPU default (bf16
    # single-pass) plateaus LM ~77% above the f32 optimum at zero wall
    # benefit (BA_PRECISION_r05.json; the precision state is part of the
    # jit cache key, so mixed-precision callers don't collide)
    with jax.default_matmul_precision(cfg.ba_matmul_precision):
        return _ba_jit(Rs, ts, Xs, fixed, edges, cam, cfg=cfg,
                       two_phase=two_phase, solver=solver, cg_iters=cg_iters,
                       placement=placement, phase2=phase2)


@partial(jax.jit, static_argnames=("cfg", "two_phase", "solver",
                                   "cg_iters", "placement", "phase2"))
def _ba_jit(Rs, ts, Xs, fixed, edges, cam, *, cfg: SolverConfig,
            two_phase: bool, solver: str, cg_iters: int = 48,
            placement: str = "scatter", phase2: bool = True) -> BAResult:
    delta2 = cfg.huber_delta2
    lam = jnp.asarray(cfg.lm_lambda_init, Rs.dtype)
    active = edges.valid.astype(Rs.dtype)

    if cfg.ba_normalize_world:
        # similarity-normalize the world for f32 conditioning: X' = s(X-c),
        # t' = s(t + R c).  Camera-frame coords scale uniformly (x' = s x),
        # so projections — hence residuals, Huber weights, chi2 gates — are
        # bitwise-level invariant; only coordinate rounding improves.
        # add-scatter formulation (non-add scatters demote the relay fast
        # path, see ops/scatter.py)
        P_n = Xs.shape[0]
        hits = jnp.zeros(P_n + 1, jnp.int32).at[
            jnp.where(edges.valid, edges.pt_idx, P_n).reshape(-1)].add(
            1)[:P_n]
        seen_f = (hits > 0).astype(Xs.dtype)
        n_seen = jnp.maximum(seen_f.sum(), 1.0)
        c = jnp.sum(Xs * seen_f[:, None], axis=0) / n_seen
        rad = jnp.linalg.norm(Xs - c, axis=1)
        scale = 1.0 / jnp.maximum(
            jnp.sum(rad * seen_f) / n_seen, 1e-6)     # mean radius -> O(1)
        Xs = (Xs - c) * scale
        ts = (ts + jnp.einsum("kij,j->ki", Rs, c)) * scale

    if two_phase:
        Rs, ts, Xs, lam, _ = _lm_phase(
            Rs, ts, Xs, fixed, edges, cam, lam, active,
            n_iters=cfg.local_ba_iters1, use_robust=True, delta2=delta2,
            solver=solver, cg_iters=cg_iters, placement=placement,
        )
        r, _, _, z = _terms_any(Rs, ts, Xs, edges, cam)
        c2 = jnp.sum(r * r, axis=-1) * edges.inv_sigma2
        inl = edges.valid & (c2 <= cfg.local_ba_chi2) & (z > 0)
        active = inl.astype(Rs.dtype)
        if phase2:
            Rs, ts, Xs, lam, cost = _lm_phase(
                Rs, ts, Xs, fixed, edges, cam, lam, active,
                n_iters=cfg.local_ba_iters2, use_robust=False, delta2=delta2,
                solver=solver, cg_iters=cg_iters, placement=placement,
            )
        else:
            # aborted between phases (mbAbortBA): keep phase-1's state;
            # the cost is the gated chi2 sum at that state (same
            # convention as _robust_cost's inlier regime, rho = chi2)
            cost = jnp.sum(jnp.where(inl, c2, 0.0))
    else:
        Rs, ts, Xs, lam, cost = _lm_phase(
            Rs, ts, Xs, fixed, edges, cam, lam, active,
            n_iters=cfg.global_ba_iters, use_robust=True, delta2=delta2,
            solver=solver, cg_iters=cg_iters, placement=placement,
        )

    r, _, _, z = _terms_any(Rs, ts, Xs, edges, cam)
    c2 = jnp.sum(r * r, axis=-1) * edges.inv_sigma2
    inl = edges.valid & (c2 <= cfg.local_ba_chi2) & (z > 0)

    if cfg.ba_normalize_world:
        # undo the similarity so callers see original-world coordinates
        Xs = Xs / scale + c
        ts = ts / scale - jnp.einsum("kij,j->ki", Rs, c)

    blob = jnp.concatenate([
        Rs.reshape(-1), ts.reshape(-1), Xs.reshape(-1),
        inl.astype(jnp.float32).reshape(-1)])
    return BAResult(R=Rs, t=ts, points=Xs, edge_inliers=inl, cost=cost,
                    host_blob=blob)
