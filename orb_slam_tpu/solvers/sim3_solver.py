"""Relative Sim(3) between two keyframes from 3D-3D matches: batched
closed-form absolute orientation inside RANSAC.

Replaces Sim3Solver (src/Sim3Solver.cc): the reference iterates Horn's 1987
quaternion method over 3-point minimal sets with round-robin `iterate(5)`
(:137-231); here all samples run in one vmapped batch.  The closed form used
is the SVD similarity (Umeyama) — algebraically equivalent to Horn's
quaternion eigenvector construction — and the inlier test is the
reference's: symmetric reprojection error in both images against
9.210 * sigma^2 of each keypoint's octave (Sim3Solver.cc:87-88, 335-360).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Sim3Result(NamedTuple):
    ok: jnp.ndarray
    s: jnp.ndarray         # scalar: scale of g12 (maps frame-2 coords to 1)
    R: jnp.ndarray         # [3, 3]
    t: jnp.ndarray         # [3]
    inliers: jnp.ndarray   # [N] bool
    n_inliers: jnp.ndarray


def umeyama_sim3(P2: jnp.ndarray, P1: jnp.ndarray):
    """Least-squares (s, R, t) with P1 ~ s R P2 + t.  P*: [n, 3]."""
    mu1 = jnp.mean(P1, axis=0)
    mu2 = jnp.mean(P2, axis=0)
    x1 = P1 - mu1
    x2 = P2 - mu2
    cov = x1.T @ x2 / P1.shape[0]
    U, D, Vt = jnp.linalg.svd(cov)
    sgn = jnp.sign(jnp.linalg.det(U @ Vt))
    S = jnp.diag(jnp.ones(3).at[2].set(sgn))
    R = U @ S @ Vt
    var2 = jnp.sum(x2 * x2) / P1.shape[0]
    s = jnp.sum(D * jnp.diag(S)) / jnp.maximum(var2, 1e-12)
    t = mu1 - s * (R @ mu2)
    return s, R, t


@partial(jax.jit, static_argnames=("n_samples", "fix_scale"))
def sim3_ransac(
    key: jax.Array,
    X1: jnp.ndarray,       # [N, 3] matched points in KF1 camera frame
    X2: jnp.ndarray,       # [N, 3] same landmarks in KF2 camera frame
    uv1: jnp.ndarray,      # [N, 2] their pixels in KF1
    uv2: jnp.ndarray,      # [N, 2] their pixels in KF2
    max_err1: jnp.ndarray,  # [N] 9.21 * sigma2(level in KF1)
    max_err2: jnp.ndarray,  # [N]
    valid: jnp.ndarray,
    K: jnp.ndarray,
    n_samples: int = 256,
    min_inliers: int = 20,
    fix_scale: bool = False,
) -> Sim3Result:
    n = X1.shape[0]
    w = valid.astype(jnp.float32)
    p = w / jnp.maximum(jnp.sum(w), 1.0)
    keys = jax.random.split(key, n_samples)
    samples = jax.vmap(
        lambda k: jax.random.choice(k, n, shape=(3,), replace=False, p=p)
    )(keys)

    def fit(idx):
        s, R, t = umeyama_sim3(X2[idx], X1[idx])
        s = jnp.where(fix_scale, 1.0, s)
        return s, R, t

    ss, Rs, ts = jax.vmap(fit)(samples)

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def project(Xc):
        z = jnp.maximum(Xc[:, 2], 1e-6)
        return jnp.stack([Xc[:, 0] / z * fx + cx, Xc[:, 1] / z * fy + cy], 1)

    def count(s, R, t):
        # g12: X2 -> frame 1;  g21 = g12^-1
        X2in1 = s * (X2 @ R.T) + t
        X1in2 = ((X1 - t) / jnp.maximum(s, 1e-12)) @ R
        e1 = jnp.sum((project(X2in1) - uv1) ** 2, axis=1)
        e2 = jnp.sum((project(X1in2) - uv2) ** 2, axis=1)
        inl = valid & (e1 < max_err1) & (e2 < max_err2) \
            & (X2in1[:, 2] > 0) & (X1in2[:, 2] > 0)
        return inl, jnp.sum(inl)

    inls, counts = jax.vmap(count)(ss, Rs, ts)
    best = jnp.argmax(counts)
    ok = counts[best] >= min_inliers

    # polish: re-fit on the best inlier set (weighted closed form)
    inl = inls[best]
    wts = inl.astype(jnp.float32)
    nw = jnp.maximum(jnp.sum(wts), 3.0)
    mu1 = jnp.sum(X1 * wts[:, None], 0) / nw
    mu2 = jnp.sum(X2 * wts[:, None], 0) / nw
    x1 = (X1 - mu1) * wts[:, None]
    x2 = (X2 - mu2) * wts[:, None]
    cov = x1.T @ (X2 - mu2) / nw
    U, D, Vt = jnp.linalg.svd(cov)
    sgn = jnp.sign(jnp.linalg.det(U @ Vt))
    Sm = jnp.diag(jnp.ones(3).at[2].set(sgn))
    Rp = U @ Sm @ Vt
    var2 = jnp.sum(x2 * (X2 - mu2)) / nw
    sp = jnp.where(fix_scale, 1.0,
                   jnp.sum(D * jnp.diag(Sm)) / jnp.maximum(var2, 1e-12))
    tp = mu1 - sp * (Rp @ mu2)
    inl2, n2 = count(sp, Rp, tp)
    better = n2 >= counts[best]
    return Sim3Result(
        ok=ok,
        s=jnp.where(better, sp, ss[best]),
        R=jnp.where(better, Rp, Rs[best]),
        t=jnp.where(better, tp, ts[best]),
        inliers=jnp.where(better, inl2, inl),
        n_inliers=jnp.where(better, n2, counts[best]),
    )
