"""Sim3 refinement with bidirectional reprojection edges.

Replaces Optimizer::OptimizeSim3 (src/Optimizer.cc:791-987): given matched
landmark pairs between two keyframes and an initial relative Sim3 g12, run
Gauss-Newton on the 7-dof tangent minimizing reprojection of each landmark
into the *other* image (EdgeSim3ProjectXYZ / EdgeInverseSim3ProjectXYZ),
with Huber weighting and a chi2 inlier gate (th2 = 10) between passes
(5 + 10 iterations, matching the reference's schedule).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import sim3
from .pose_opt import _huber_weight


class Sim3OptResult(NamedTuple):
    s: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _reproj_residuals(s, R, t, X1, X2, uv1, uv2, fx, fy, cx, cy):
    """r12: project X2 through g12 into image 1; r21: project X1 through
    g12^-1 into image 2.  Returns ([N,2], [N,2], z1, z2)."""
    X2in1 = sim3.transform(s, R, t, X2)
    si, Ri, ti = sim3.inverse(s, R, t)
    X1in2 = sim3.transform(si, Ri, ti, X1)

    def proj(Xc):
        z = jnp.maximum(Xc[..., 2], 1e-6)
        return jnp.stack([Xc[..., 0] / z * fx + cx,
                          Xc[..., 1] / z * fy + cy], axis=-1)

    return (proj(X2in1) - uv1, proj(X1in2) - uv2,
            X2in1[..., 2], X1in2[..., 2])


@partial(jax.jit, static_argnames=("iters1", "iters2", "fix_scale"))
def optimize_sim3(
    s0, R0, t0,
    X1: jnp.ndarray,      # [N, 3] landmarks in KF1 camera frame
    X2: jnp.ndarray,      # [N, 3] matched landmarks in KF2 camera frame
    uv1: jnp.ndarray,     # [N, 2] pixels in KF1
    uv2: jnp.ndarray,     # [N, 2] pixels in KF2
    inv_sigma2_1: jnp.ndarray,
    inv_sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    chi2_th: float = 10.0,
    iters1: int = 5,
    iters2: int = 10,
    fix_scale: bool = False,
) -> Sim3OptResult:
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def chi2_of(s, R, t):
        r12, r21, z1, z2 = _reproj_residuals(s, R, t, X1, X2, uv1, uv2,
                                             fx, fy, cx, cy)
        c12 = jnp.sum(r12 * r12, axis=1) * inv_sigma2_1
        c21 = jnp.sum(r21 * r21, axis=1) * inv_sigma2_2
        return c12, c21, (z1 > 0) & (z2 > 0)

    def gn_rounds(s, R, t, active, n_iters):
        def body(_, carry):
            s, R, t = carry

            def resid_flat(zeta):
                s2, R2, t2 = sim3.retract(s, R, t, zeta)
                r12, r21, _, _ = _reproj_residuals(
                    s2, R2, t2, X1, X2, uv1, uv2, fx, fy, cx, cy)
                return jnp.concatenate([r12, r21], axis=0)  # [2N, 2]

            z0 = jnp.zeros(7)
            r = resid_flat(z0)
            J = jax.jacfwd(resid_flat)(z0)                  # [2N, 2, 7]
            c2 = jnp.sum(r * r, axis=1) * jnp.concatenate(
                [inv_sigma2_1, inv_sigma2_2])
            w = _huber_weight(c2, chi2_th) * jnp.concatenate(
                [inv_sigma2_1, inv_sigma2_2])
            w = w * jnp.concatenate([active, active])
            if fix_scale:
                J = J.at[:, :, 6].set(0.0)
            H = jnp.einsum("nia,n,nib->ab", J, w, J) + 1e-8 * jnp.eye(7)
            b = jnp.einsum("nia,n,ni->a", J, w, r)
            dz = -jnp.linalg.solve(H, b)
            s2, R2, t2 = sim3.retract(s, R, t, dz)
            # accept on cost decrease
            c12a, c21a, za = chi2_of(s, R, t)
            c12b, c21b, zb = chi2_of(s2, R2, t2)
            ca = jnp.sum((c12a + c21a) * active * za)
            cb = jnp.sum((c12b + c21b) * active * zb)
            good = (cb < ca) & jnp.all(jnp.isfinite(dz))
            return (jnp.where(good, s2, s), jnp.where(good, R2, R),
                    jnp.where(good, t2, t))

        return jax.lax.fori_loop(0, n_iters, body, (s, R, t))

    active = valid.astype(jnp.float32)
    s, R, t = gn_rounds(s0, R0, t0, active, iters1)
    c12, c21, zok = chi2_of(s, R, t)
    inl = valid & (c12 <= chi2_th) & (c21 <= chi2_th) & zok
    s, R, t = gn_rounds(s, R, t, inl.astype(jnp.float32), iters2)
    c12, c21, zok = chi2_of(s, R, t)
    inl = valid & (c12 <= chi2_th) & (c21 <= chi2_th) & zok
    return Sim3OptResult(s=s, R=R, t=t, inliers=inl, n_inliers=jnp.sum(inl))
