"""Batched two-view triangulation and related geometry.

Replaces Initializer::Triangulate (src/Initializer.cc:732-752) and the
per-match SVD triangulation in LocalMapping::CreateNewMapPoints
(src/LocalMapping.cc:284-367) with vmapped linear solves.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_dlt(
    P1: jnp.ndarray, P2: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray
) -> jnp.ndarray:
    """DLT triangulation.

    P1, P2: [3, 4] projection matrices; xy1, xy2: [N, 2] pixel (or normalized)
    coords consistent with the P's.  Returns [N, 3] points (w-normalized).
    """

    def one(x1, x2):
        A = jnp.stack(
            [
                x1[0] * P1[2] - P1[0],
                x1[1] * P1[2] - P1[1],
                x2[0] * P2[2] - P2[0],
                x2[1] * P2[2] - P2[1],
            ]
        )
        # smallest right singular vector of A
        _, _, vt = jnp.linalg.svd(A)
        X = vt[-1]
        w = jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])
        return X[:3] / w

    return jax.vmap(one)(xy1, xy2)


def projection_matrix(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """K [3,3], R [3,3], t [3] -> P = K [R|t], [3,4]."""
    return K @ jnp.concatenate([R, t[:, None]], axis=1)


def parallax_cos(
    X: jnp.ndarray, c1: jnp.ndarray, c2: jnp.ndarray
) -> jnp.ndarray:
    """Cosine of the ray angle at X between camera centers c1, c2. [N]."""
    r1 = X - c1[None, :]
    r2 = X - c2[None, :]
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    return jnp.sum(r1 * r2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)


def check_rt(
    R: jnp.ndarray,
    t: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    sigma2: float = 1.0,
    reproj_th: float = 4.0,
):
    """Evaluate a motion hypothesis (reference CheckRT, Initializer.cc:796-927).

    Triangulates valid matches under (R, t), gates on: finite coords, positive
    depth in both views, reprojection chi2 < reproj_th * sigma2 in both views,
    and sufficient parallax.  Returns (n_good, X [N,3], good [N], parallax_deg)
    where parallax_deg is the reference's "50th-smallest" robust parallax.
    """
    eye = jnp.eye(3, dtype=R.dtype)
    P1 = projection_matrix(K, eye, jnp.zeros((3,), R.dtype))
    P2 = projection_matrix(K, R, t)
    X = triangulate_dlt(P1, P2, xy1, xy2)

    finite = jnp.all(jnp.isfinite(X), axis=-1)
    Xs = jnp.where(finite[:, None], X, 0.0)

    c1 = jnp.zeros((3,), R.dtype)
    c2 = -R.T @ t
    cosp = parallax_cos(Xs, c1, c2)

    z1 = Xs[:, 2]
    X2 = Xs @ R.T + t[None, :]
    z2 = X2[:, 2]

    # reprojection chi2 in both images
    def reproj_err(P, Xw, xy):
        Xh = jnp.concatenate([Xw, jnp.ones((Xw.shape[0], 1), Xw.dtype)], axis=1)
        p = Xh @ P.T
        uv = p[:, :2] / jnp.maximum(p[:, 2:3], 1e-12)
        return jnp.sum((uv - xy) ** 2, axis=-1)

    e1 = reproj_err(P1, Xs, xy1)
    e2 = reproj_err(P2, Xs, xy2)

    has_parallax = cosp < 0.99998  # reference's low-parallax guard
    # depth gates only apply when parallax is sufficient — "infinite" points
    # can easily triangulate to negative depth (Initializer.cc:856-864)
    depth_ok = ((z1 > 0) | ~has_parallax) & ((z2 > 0) | ~has_parallax)
    counted = (
        valid
        & finite
        & depth_ok
        & (e1 < reproj_th * sigma2)
        & (e2 < reproj_th * sigma2)
    )
    # nGood counts every reproj/depth-passing point (Initializer.cc:890);
    # vbGood additionally requires real parallax (Initializer.cc:893-894)
    n_good = jnp.sum(counted)
    good = counted & has_parallax

    # robust parallax (Initializer.cc:897-904): sort cos ascending over the
    # counted points, take idx = min(50, n-1) — the ~51st-largest angle for
    # large sets, the smallest angle for small sets
    cos_masked = jnp.where(counted, cosp, 2.0)  # bad -> sorts last ascending
    sorted_cos = jnp.sort(cos_masked)
    idx = jnp.minimum(50, jnp.maximum(n_good - 1, 0))
    cos_at = sorted_cos[idx]
    parallax_deg = jnp.degrees(jnp.arccos(jnp.clip(cos_at, -1.0, 1.0)))
    parallax_deg = jnp.where(n_good > 0, parallax_deg, 0.0)
    return n_good, X, good, parallax_deg
