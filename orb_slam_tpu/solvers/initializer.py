"""Two-view map bootstrap: batched 8-point homography/fundamental RANSAC.

TPU-native replacement of Initializer (src/Initializer.cc).  The reference
races two CPU threads, one fitting H and one fitting F (:102-107); here both
model families are fitted and scored for *all* RANSAC samples in one batched
program — the "race" is a vmap.  Model selection (RH = SH/(SH+SF) > 0.40,
:110-116), ReconstructF via essential-matrix decomposition (:468-568) and
ReconstructH via the Faugeras 8-motion decomposition (:570-730) keep the
reference's acceptance gates; all 12 motion hypotheses are verified with one
vmapped CheckRT.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import InitializerConfig
from ..geometry import triangulate


class InitResult(NamedTuple):
    ok: jnp.ndarray            # scalar bool
    used_homography: jnp.ndarray  # scalar bool (diagnostic)
    R: jnp.ndarray             # [3, 3] world(frame1)->frame2
    t: jnp.ndarray             # [3] unit-norm translation
    points: jnp.ndarray        # [N, 3] triangulated in frame1
    good: jnp.ndarray          # [N] bool triangulation inliers
    n_good: jnp.ndarray        # scalar int


# ---------------------------------------------------------------------------
# normalization (Initializer::Normalize, :754-794)
# ---------------------------------------------------------------------------

def _normalize(xy: jnp.ndarray, valid: jnp.ndarray):
    w = valid.astype(xy.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(xy * w[:, None], axis=0) / n
    dev = jnp.sum(jnp.abs(xy - mean) * w[:, None], axis=0) / n
    s = 1.0 / jnp.maximum(dev, 1e-8)
    xn = (xy - mean) * s
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]],
        xy.dtype,
    )
    return xn, T


# ---------------------------------------------------------------------------
# minimal-solver DLTs (vmapped over RANSAC samples)
# ---------------------------------------------------------------------------

def _h_from_8(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Homography from 8 correspondences (normalized coords), [3,3]."""
    def rows(p1, p2):
        x, y = p1[0], p1[1]
        u, v = p2[0], p2[1]
        z = jnp.zeros(())
        o = jnp.ones(())
        r1 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v])
        r2 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u])
        return jnp.stack([r1, r2])

    A = jax.vmap(rows)(x1, x2).reshape(-1, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[-1].reshape(3, 3)


def _f_from_8(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Fundamental matrix (rank-2 enforced) from 8 correspondences."""
    def row(p1, p2):
        x, y = p1[0], p1[1]
        u, v = p2[0], p2[1]
        o = jnp.ones(())
        return jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, o])

    A = jax.vmap(row)(x1, x2)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[-1].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(F)
    return u @ jnp.diag(s.at[2].set(0.0)) @ vt2


# ---------------------------------------------------------------------------
# model scoring over all matches (CheckHomography :303-380 /
# CheckFundamental :382-466)
# ---------------------------------------------------------------------------

_CHI2_H = 5.991
_CHI2_F = 3.841
_SCORE_TH = 5.991


def _score_h(H: jnp.ndarray, xy1, xy2, valid, inv_sigma2):
    Hi = jnp.linalg.inv(H)

    def transfer(M, a, b):
        ah = jnp.concatenate([a, jnp.ones_like(a[:, :1])], axis=1)
        p = ah @ M.T
        uv = p[:, :2] / jnp.maximum(jnp.abs(p[:, 2:3]), 1e-12) * jnp.sign(p[:, 2:3])
        return jnp.sum((uv - b) ** 2, axis=1) * inv_sigma2

    c12 = transfer(H, xy1, xy2)
    c21 = transfer(Hi, xy2, xy1)
    in12 = c12 < _CHI2_H
    in21 = c21 < _CHI2_H
    score = jnp.sum(
        jnp.where(valid & in12, _SCORE_TH - c12, 0.0)
        + jnp.where(valid & in21, _SCORE_TH - c21, 0.0)
    )
    return score, valid & in12 & in21


def _score_f(F: jnp.ndarray, xy1, xy2, valid, inv_sigma2):
    def epi_chi2(Fm, a, b):
        ah = jnp.concatenate([a, jnp.ones_like(a[:, :1])], axis=1)
        l = ah @ Fm.T  # epipolar lines in image b
        num = l[:, 0] * b[:, 0] + l[:, 1] * b[:, 1] + l[:, 2]
        den = l[:, 0] ** 2 + l[:, 1] ** 2
        return num * num / jnp.maximum(den, 1e-12) * inv_sigma2

    c12 = epi_chi2(F, xy1, xy2)          # x1's line in image 2
    c21 = epi_chi2(F.T, xy2, xy1)
    in12 = c12 < _CHI2_F
    in21 = c21 < _CHI2_F
    score = jnp.sum(
        jnp.where(valid & in12, _SCORE_TH - c12, 0.0)
        + jnp.where(valid & in21, _SCORE_TH - c21, 0.0)
    )
    return score, valid & in12 & in21


# ---------------------------------------------------------------------------
# motion recovery
# ---------------------------------------------------------------------------

def _decompose_e(E: jnp.ndarray):
    """E -> 4 hypotheses (R, t) (DecomposeE, Initializer.cc:929-xxx)."""
    u, _, vt = jnp.linalg.svd(E)
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _decompose_h(H: jnp.ndarray, K: jnp.ndarray):
    """Faugeras SVD decomposition of a homography into 8 motion hypotheses
    (ReconstructH, Initializer.cc:570-730)."""
    A = jnp.linalg.inv(K) @ H @ K
    U, d, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' = +d2
    aux_st = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / ((d1 + d3) * d2)
    ct = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2)
    sts = jnp.array([aux_st, -aux_st, -aux_st, aux_st])

    def hyp_pos(x1, x3, st):
        Rp = jnp.array([[ct, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, ct]])
        tp = (d1 - d3) * jnp.array([x1, 0.0, -x3])
        R = s * U @ Rp @ Vt
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    # case d' = -d2
    aux_sp = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / ((d1 - d3) * d2)
    cp = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2)
    sps = jnp.array([aux_sp, -aux_sp, -aux_sp, aux_sp])

    def hyp_neg(x1, x3, sp):
        Rp = jnp.array([[cp, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cp]])
        tp = (d1 + d3) * jnp.array([x1, 0.0, x3])
        R = s * U @ Rp @ Vt
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    Rp, tp = jax.vmap(hyp_pos)(x1s, x3s, sts)
    Rn, tn = jax.vmap(hyp_neg)(x1s, x3s, sps)
    return jnp.concatenate([Rp, Rn]), jnp.concatenate([tp, tn])


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------

def initialize(
    key: jax.Array,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    cfg: InitializerConfig = InitializerConfig(),
) -> InitResult:
    """Full two-view bootstrap on [N] padded matches (valid mask).

    xy1/xy2 are *undistorted* pixel coords of the same landmark in frames
    1 and 2.  Returns pose of frame 2 w.r.t. frame 1 and triangulated points.
    """
    n = xy1.shape[0]
    S = cfg.ransac_iterations
    inv_sigma2 = 1.0 / (cfg.sigma * cfg.sigma)

    # --- RANSAC samples: S x 8 indices drawn from valid matches -------------
    w = valid.astype(jnp.float32)
    p = w / jnp.maximum(jnp.sum(w), 1.0)
    keys = jax.random.split(key, S)
    samples = jax.vmap(
        lambda k: jax.random.choice(k, n, shape=(cfg.sample_size,),
                                    replace=False, p=p)
    )(keys)  # [S, sample_size] — 8-point sets (Initializer.cc:77-85); the
    # DLT fits are least-squares, so sample_size > 8 is also valid

    xn1, T1 = _normalize(xy1, valid)
    xn2, T2 = _normalize(xy2, valid)
    T2i = jnp.linalg.inv(T2)

    s1 = xn1[samples]  # [S, 8, 2]
    s2 = xn2[samples]

    # --- fit + score both model families for every sample -------------------
    Hn = jax.vmap(_h_from_8)(s1, s2)
    Fn = jax.vmap(_f_from_8)(s1, s2)
    H = jax.vmap(lambda M: T2i @ M @ T1)(Hn)
    F = jax.vmap(lambda M: T2.T @ M @ T1)(Fn)

    h_scores, h_inl = jax.vmap(lambda M: _score_h(M, xy1, xy2, valid, inv_sigma2))(H)
    f_scores, f_inl = jax.vmap(lambda M: _score_f(M, xy1, xy2, valid, inv_sigma2))(F)

    hi = jnp.argmax(h_scores)
    fi = jnp.argmax(f_scores)
    SH, SF = h_scores[hi], f_scores[fi]
    bestH, inlH = H[hi], h_inl[hi]
    bestF, inlF = F[fi], f_inl[fi]

    RH = SH / jnp.maximum(SH + SF, 1e-12)
    use_h = RH > cfg.rh_threshold

    # --- recover motion from both, select afterwards (one vmapped CheckRT) --
    E = K.T @ bestF @ K
    Rf, tf = _decompose_e(E)       # 4 hypotheses
    Rh, th = _decompose_h(bestH, K)  # 8 hypotheses
    Rs = jnp.concatenate([Rf, Rh])   # [12, 3, 3]
    ts = jnp.concatenate([tf, th])

    inl = jnp.where(use_h, inlH, inlF)

    def eval_hyp(R, t):
        return triangulate.check_rt(
            R, t, xy1, xy2, inl, K, sigma2=cfg.sigma * cfg.sigma
        )

    n_good, X, good, par = jax.vmap(eval_hyp)(Rs, ts)

    f_good = n_good[:4]
    h_good = n_good[4:]
    n_inliers = jnp.sum(inl)

    # ReconstructF acceptance (Initializer.cc:515-566)
    f_best = jnp.argmax(f_good)
    f_max = f_good[f_best]
    f_min_good = jnp.maximum(
        (0.9 * n_inliers).astype(jnp.int32), cfg.min_triangulated
    )
    f_similar = jnp.sum(f_good > 0.7 * f_max)
    f_ok = (
        (f_max >= f_min_good) & (f_similar == 1) & (par[f_best] > cfg.min_parallax_deg)
    )

    # ReconstructH acceptance (Initializer.cc:695-730)
    h_sorted = jnp.sort(h_good)[::-1]
    h_best = jnp.argmax(h_good)
    h_max = h_sorted[0]
    h_second = h_sorted[1]
    h_min_good = jnp.maximum(
        (0.9 * n_inliers).astype(jnp.int32), cfg.min_triangulated
    )
    h_ok = (
        (h_second < cfg.h_second_best_ratio * h_max)
        & (h_max >= h_min_good)
        & (par[4 + h_best] > cfg.min_parallax_deg)
    )

    sel = jnp.where(use_h, 4 + h_best, f_best)
    ok = jnp.where(use_h, h_ok, f_ok)

    return InitResult(
        ok=ok,
        used_homography=use_h,
        R=Rs[sel],
        t=ts[sel],
        points=X[sel],
        good=good[sel],
        n_good=n_good[sel],
    )
