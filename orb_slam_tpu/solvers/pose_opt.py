"""Motion-only pose optimization: batched Gauss-Newton/LM on SE(3).

TPU-native replacement of Optimizer::PoseOptimization (src/Optimizer.cc:154-285)
— g2o's per-edge loop becomes one vmapped residual/Jacobian evaluation and a
6x6 normal-equation solve.  The reference's schedule is kept: 4 rounds of
{10,10,7,5} LM iterations with chi-squared outlier gates {9.21,7.38,5.99,5.99};
outliers are re-classified against the full observation set after each round
(g2o edge level toggling, Optimizer.cc:258-277).

Analytic Jacobians for the left-multiplicative update exp(xi) * T match
EdgeSE3ProjectXYZ::linearizeOplus (g2o types_six_dof_expmap.cpp:384-422).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import SolverConfig
from ..geometry import se3
from ..geometry.camera import CameraParams


class PoseOptResult(NamedTuple):
    R: jnp.ndarray          # [3, 3]
    t: jnp.ndarray          # [3]
    inliers: jnp.ndarray    # [N] bool
    n_inliers: jnp.ndarray  # scalar int32


def _residual_jacobian(R, t, X, uv, cam: CameraParams):
    """r = pi(R X + t) - uv and J = dr/dxi for xi = (ups, omega).

    Returns r [N,2], J [N,2,6], z [N] (camera depth for validity gating).
    """
    xc = se3.transform(R, t, X)
    x, y, z = xc[:, 0], xc[:, 1], xc[:, 2]
    zi = 1.0 / jnp.maximum(z, 1e-6)
    u = x * zi * cam.fx + cam.cx
    v = y * zi * cam.fy + cam.cy
    r = jnp.stack([u, v], axis=1) - uv

    # dpi/dxc
    fx, fy = cam.fx, cam.fy
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    Jpi = jnp.stack(
        [
            jnp.stack([fx * zi, zero, -fx * x * zi2], axis=1),
            jnp.stack([zero, fy * zi, -fy * y * zi2], axis=1),
        ],
        axis=1,
    )  # [N, 2, 3]
    # dxc/dxi = [I | -[xc]_x]
    dxc = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), (X.shape[0], 3, 3)),
            -se3.hat(xc),
        ],
        axis=2,
    )  # [N, 3, 6]
    J = Jpi @ dxc  # [N, 2, 6]
    return r, J, z


def _huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """rho'(e)/1 for the Huber kernel on the residual norm: w = min(1, d/e)."""
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    d = jnp.sqrt(delta2)
    return jnp.minimum(1.0, d / e)


def _chol_solve6(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unrolled 6x6 SPD Cholesky solve in plain scalar ops.

    jax.scipy.linalg.solve lowers to a Cholesky CUSTOM CALL per invocation;
    inside the per-frame LM scans that meant 64 custom calls/frame, ~1.3 ms
    of the ~8 ms frame budget on the chip (FRAME_PROFILE r4).  The unrolled
    form fuses into the surrounding program: ~70 scalar FLOPs, no call
    boundary, identical math (same LL^T factorization to f32 rounding)."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def optimize_pose(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    cam: CameraParams,
    cfg: SolverConfig = SolverConfig(),
) -> PoseOptResult:
    """X: [N,3] world points, uv: [N,2] undistorted observations,
    inv_sigma2: [N] per-observation information (1/sigma^2 of its pyramid
    level), valid: [N] association mask."""
    delta2 = cfg.huber_delta2

    def chi2_of(R, t):
        r, _, z = _residual_jacobian(R, t, X, uv, cam)
        c2 = jnp.sum(r * r, axis=1) * inv_sigma2
        return c2, z

    def lm_round(state, n_iters, use_robust):
        R, t, active, lam = state

        def body(_, carry):
            R, t, lam = carry
            r, J, z = _residual_jacobian(R, t, X, uv, cam)
            c2 = jnp.sum(r * r, axis=1) * inv_sigma2
            w = jnp.where(use_robust, _huber_weight(c2, delta2), 1.0)
            w = w * inv_sigma2 * active * (z > 0)
            H = jnp.einsum("nia,n,nib->ab", J, w, J)
            b = jnp.einsum("nia,n,ni->a", J, w, r)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6, dtype=H.dtype)
            dx = -_chol_solve6(Hd, b)
            R1, t1 = se3.retract(R, t, dx)
            # accept if total weighted chi2 decreased (LM-style)
            c2_new, z1 = chi2_of(R1, t1)
            cost_old = jnp.sum(c2 * active * (z > 0))
            cost_new = jnp.sum(c2_new * active * (z1 > 0))
            accept = cost_new < cost_old
            R = jnp.where(accept, R1, R)
            t = jnp.where(accept, t1, t)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            return R, t, lam

        R, t, lam = jax.lax.fori_loop(0, n_iters, body, (R, t, lam))
        return R, t, lam

    active = valid.astype(jnp.float32)
    R, t = R0, t0
    lam = jnp.asarray(cfg.lm_lambda_init, jnp.float32)
    inl = valid
    for rnd, (iters, gate) in enumerate(zip(cfg.pose_rounds, cfg.pose_chi2)):
        # round 1 uses the Huber kernel; later rounds optimize inliers only
        # with a plain quadratic cost (reference sets robust kernel only
        # before round 3 is disabled... Optimizer.cc:247 removes the kernel
        # after 2 rounds; we keep it for the first two rounds).
        use_robust = jnp.asarray(rnd < 2)
        R, t, lam = lm_round((R, t, active, lam), iters, use_robust)
        c2, z = chi2_of(R, t)
        inl = valid & (c2 <= gate) & (z > 0)
        active = inl.astype(jnp.float32)

    return PoseOptResult(R=R, t=t, inliers=inl, n_inliers=jnp.sum(inl))


optimize_pose = jax.jit(optimize_pose, static_argnames=("cfg",))
optimize_pose_jit = optimize_pose
