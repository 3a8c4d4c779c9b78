"""Batched PnP RANSAC for relocalisation.

Replaces PnPsolver (src/PnPsolver.cc): the reference runs EPnP on 4-point
minimal sets inside an adaptive RANSAC with round-robin `iterate(5)` across
candidate keyframes (Tracking.cc:922-1006).  The TPU-native version runs ALL
samples of ALL candidates in one batch and replaces the sequential
early-exit with a fixed budget chosen from the same success-probability
formula (SURVEY.md §7 hard part 4).

Minimal solver: 6-point DLT (P6P) with orthonormal projection of the
rotation block — simpler to batch than EPnP's beta-case machinery and
equivalent in the RANSAC loop since hypotheses are scored by consensus;
the accepted hypothesis is always polished by motion-only GN/LM
(pose_opt.optimize_pose), which subsumes EPnP's Gauss-Newton refinement
(PnPsolver.cc:347-830).  With p=0.99 and inlier ratio 0.4 the 6-point
minimal set needs ~1100 samples vs ~180 for 4-point; both are a single
batched solve on TPU, so the budget default is set accordingly.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3


class PnPResult(NamedTuple):
    ok: jnp.ndarray        # scalar bool
    R: jnp.ndarray         # [3, 3]
    t: jnp.ndarray         # [3]
    inliers: jnp.ndarray   # [N] bool
    n_inliers: jnp.ndarray


def _dlt_p6p(X: jnp.ndarray, uv_n: jnp.ndarray):
    """DLT pose from >=6 points; uv_n are NORMALIZED image coords (K^-1 u).

    Returns (R, t).  Builds the 2n x 12 system for P = [R|t] up to scale,
    then projects the 3x3 block onto SO(3) and fixes scale/sign.
    """
    n = X.shape[0]
    zeros = jnp.zeros((n, 4))
    Xh = jnp.concatenate([X, jnp.ones((n, 1))], axis=1)  # [n, 4]
    u = uv_n[:, 0:1]
    v = uv_n[:, 1:2]
    r1 = jnp.concatenate([Xh, zeros, -u * Xh], axis=1)
    r2 = jnp.concatenate([zeros, Xh, -v * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)                # [2n, 12]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    P = vt[-1].reshape(3, 4)

    M = P[:, :3]
    # scale: average row norm of the rotation block
    s = jnp.linalg.det(M)
    sign = jnp.sign(s)
    sign = jnp.where(sign == 0, 1.0, sign)
    M = M * sign
    t = P[:, 3] * sign
    scale = jnp.cbrt(jnp.maximum(jnp.abs(s), 1e-12))
    R = se3.orthonormalize(M / scale)
    t = t / scale
    return R, t


@partial(jax.jit, static_argnames=("n_samples", "min_set", "solver"))
def pnp_ransac(
    key: jax.Array,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    n_samples: int = 512,
    min_set: int = 6,
    chi2_th: float = 5.991,
    min_inliers: int = 10,
    solver: str = "epnp",
) -> PnPResult:
    """X: [N,3] world points, uv: [N,2] undistorted pixels (padded + mask).

    solver="epnp" uses the reference's EPnP minimal solver (min_set>=4,
    PnPsolver.cc:347-830); solver="p6p" uses the 6-point DLT."""
    n = X.shape[0]
    w = valid.astype(jnp.float32)
    p = w / jnp.maximum(jnp.sum(w), 1.0)
    keys = jax.random.split(key, n_samples)
    samples = jax.vmap(
        lambda k: jax.random.choice(k, n, shape=(min_set,), replace=False, p=p)
    )(keys)  # [S, m]

    if solver == "epnp":
        from .epnp import epnp
        Rs, ts = jax.vmap(lambda s: epnp(X[s], uv[s], K))(samples)
    else:
        Ki = jnp.linalg.inv(K)
        uv_n = (jnp.concatenate([uv, jnp.ones((n, 1))], axis=1) @ Ki.T)[:, :2]
        Rs, ts = jax.vmap(lambda s: _dlt_p6p(X[s], uv_n[s]))(samples)

    def count_inliers(R, t):
        xc = se3.transform(R, t, X)
        z = xc[:, 2]
        zi = 1.0 / jnp.maximum(z, 1e-6)
        u = xc[:, 0] * zi * K[0, 0] + K[0, 2]
        v = xc[:, 1] * zi * K[1, 1] + K[1, 2]
        c2 = ((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2) * inv_sigma2
        inl = valid & (z > 0) & (c2 <= chi2_th)
        return inl, jnp.sum(inl)

    inls, counts = jax.vmap(count_inliers)(Rs, ts)
    best = jnp.argmax(counts)
    ok = counts[best] >= min_inliers
    return PnPResult(
        ok=ok, R=Rs[best], t=ts[best],
        inliers=inls[best], n_inliers=counts[best],
    )
