"""EPnP: Efficient Perspective-n-Point pose, batched/vmappable.

Re-derivation of the reference's PnPsolver core (src/PnPsolver.cc:347-830,
itself the Lepetit/Moreno-Noguer/Fua 2009 algorithm): 4 control points from
PCA of the world points, barycentric coordinates, the 2n x 12 projection
system, beta-cases N=1/2/3 over the null-space basis with the 6 inter-control
distance constraints, Gauss-Newton refinement of the betas, and absolute
orientation (Horn/Umeyama) to recover (R, t).  All steps are closed-form or
fixed-iteration jnp, so the whole solver vmaps over RANSAC samples.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import se3

_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _control_points(X):
    """World control points: centroid + principal axes (PnPsolver.cc:
    choose_control_points)."""
    c0 = jnp.mean(X, axis=0)
    Xc = X - c0
    cov = Xc.T @ Xc / X.shape[0]
    w, v = jnp.linalg.eigh(cov)          # ascending
    # scale each axis by sqrt(eigenvalue) (use max for numerical floor)
    s = jnp.sqrt(jnp.maximum(w, 1e-10))
    cw = jnp.stack([
        c0,
        c0 + s[2] * v[:, 2],
        c0 + s[1] * v[:, 1],
        c0 + s[0] * v[:, 0],
    ])                                    # [4, 3]
    return cw


def _barycentric(X, cw):
    """alphas [n, 4] with X = sum_i alpha_i cw_i, sum alpha = 1."""
    A = (cw[1:] - cw[0]).T               # [3, 3]
    Ainv = jnp.linalg.inv(A + 1e-12 * jnp.eye(3))
    a123 = (X - cw[0]) @ Ainv.T          # [n, 3]
    a0 = 1.0 - jnp.sum(a123, axis=1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=1)


def _build_M(alphas, uv, fx, fy, cx, cy):
    """[2n, 12] system (fill_M, PnPsolver.cc)."""
    n = alphas.shape[0]
    u = uv[:, 0:1]
    v = uv[:, 1:2]
    # row u: per control i: [a_i fx, 0, a_i (cx - u)]
    ru = jnp.concatenate([
        jnp.stack([alphas[:, i] * fx, jnp.zeros(n),
                   alphas[:, i] * (cx - u[:, 0])], axis=1)
        for i in range(4)
    ], axis=1)                            # [n, 12]
    rv = jnp.concatenate([
        jnp.stack([jnp.zeros(n), alphas[:, i] * fy,
                   alphas[:, i] * (cy - v[:, 0])], axis=1)
        for i in range(4)
    ], axis=1)
    return jnp.concatenate([ru, rv], axis=0)


def _rho(cw):
    """Squared inter-control distances of the world control points [6]."""
    return jnp.stack([
        jnp.sum((cw[a] - cw[b]) ** 2) for a, b in _PAIRS
    ])


def _dv_terms(V):
    """V: [12, 4] null-space basis (columns).  Returns dv[k][6, 3]: for basis
    k, the 6 pairwise control-point difference vectors."""
    ctrl = V.T.reshape(4, 4, 3)          # [basis, control, 3]
    return jnp.stack([
        jnp.stack([ctrl[k, a] - ctrl[k, b] for a, b in _PAIRS])
        for k in range(4)
    ])                                    # [4, 6, 3]


def _betas_case1(dv, rho):
    """N=1: beta * v; closed-form least squares on distances."""
    d = dv[0]                             # [6, 3]
    dd = jnp.sum(d * d, axis=1)           # [6]
    beta = jnp.sum(jnp.sqrt(dd * jnp.maximum(rho, 0.0))) / jnp.maximum(
        jnp.sum(dd), 1e-12)
    return jnp.array([beta, 0.0, 0.0, 0.0])


def _betas_case2(dv, rho):
    """N=2: unknowns [b11, b12, b22]; 6x3 least squares (betas_approx_2)."""
    d1, d2 = dv[0], dv[1]
    L = jnp.stack([
        jnp.sum(d1 * d1, axis=1),
        2.0 * jnp.sum(d1 * d2, axis=1),
        jnp.sum(d2 * d2, axis=1),
    ], axis=1)                            # [6, 3]
    sol = jnp.linalg.lstsq(L, rho)[0]
    b11, b12, b22 = sol[0], sol[1], sol[2]
    b1 = jnp.sqrt(jnp.maximum(b11, 0.0))
    b2 = jnp.sqrt(jnp.maximum(b22, 0.0)) * jnp.sign(b12) * jnp.sign(
        jnp.where(b11 >= 0, 1.0, -1.0))
    b1 = jnp.where(b11 < 0, 0.0, b1)
    return jnp.array([b1, b2, 0.0, 0.0])


def _betas_case3(dv, rho):
    """N=3: unknowns [b11, b12, b22, b13, b23]; 6x5 lstsq (betas_approx_3)."""
    d1, d2, d3 = dv[0], dv[1], dv[2]
    L = jnp.stack([
        jnp.sum(d1 * d1, axis=1),
        2.0 * jnp.sum(d1 * d2, axis=1),
        jnp.sum(d2 * d2, axis=1),
        2.0 * jnp.sum(d1 * d3, axis=1),
        2.0 * jnp.sum(d2 * d3, axis=1),
    ], axis=1)                            # [6, 5]
    sol = jnp.linalg.lstsq(L, rho)[0]
    b11, b12, _, b13, _ = sol[0], sol[1], sol[2], sol[3], sol[4]
    b1 = jnp.sqrt(jnp.maximum(b11, 0.0))
    b2 = jnp.where(b1 > 1e-9, b12 / jnp.maximum(b1, 1e-9), 0.0)
    b3 = jnp.where(b1 > 1e-9, b13 / jnp.maximum(b1, 1e-9), 0.0)
    return jnp.array([b1, b2, b3, 0.0])


def _gauss_newton_betas(betas, dv, rho, iters: int = 5):
    """Refine betas on the 6 distance residuals (gauss_newton,
    PnPsolver.cc:736-800)."""
    def resid_jac(b):
        # cc diff for pair p: sum_k b_k dv[k, p]
        dcc = jnp.einsum("k,kpc->pc", b, dv)          # [6, 3]
        f = jnp.sum(dcc * dcc, axis=1) - rho          # [6]
        J = 2.0 * jnp.einsum("pc,kpc->pk", dcc, dv)   # [6, 4]
        return f, J

    def body(_, b):
        f, J = resid_jac(b)
        JtJ = J.T @ J + 1e-9 * jnp.eye(4)
        db = -jnp.linalg.solve(JtJ, J.T @ f)
        return b + db

    return jax.lax.fori_loop(0, iters, body, betas)


def _pose_from_betas(betas, V, alphas, X):
    """Camera control points from betas -> per-point camera coords -> Horn
    alignment (compute_ccs/compute_pcs/estimate_R_and_t)."""
    cc = jnp.einsum("k,kic->ic", betas, V.T.reshape(4, 4, 3))  # [4, 3]
    pc = alphas @ cc                                           # [n, 3]
    # depth sign fix (solve_for_sign): majority of depths must be positive
    sign = jnp.sign(jnp.sum(jnp.sign(pc[:, 2])))
    sign = jnp.where(sign == 0, 1.0, sign)
    pc = pc * sign

    # absolute orientation world->camera (no scale: EPnP is metric)
    mu_w = jnp.mean(X, axis=0)
    mu_c = jnp.mean(pc, axis=0)
    cov = (pc - mu_c).T @ (X - mu_w)
    U, _, Vt = jnp.linalg.svd(cov)
    sgn = jnp.sign(jnp.linalg.det(U @ Vt))
    S = jnp.diag(jnp.ones(3).at[2].set(sgn))
    R = U @ S @ Vt
    t = mu_c - R @ mu_w
    return R, t


def epnp(X: jnp.ndarray, uv: jnp.ndarray, K: jnp.ndarray):
    """EPnP pose from n>=4 correspondences.

    X: [n, 3] world points; uv: [n, 2] undistorted pixels.
    Returns (R, t) minimizing reprojection among the three beta cases.
    Fully traceable; vmap over leading batch for RANSAC.
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    cw = _control_points(X)
    alphas = _barycentric(X, cw)
    M = _build_M(alphas, uv, fx, fy, cx, cy)
    MtM = M.T @ M
    _, vecs = jnp.linalg.eigh(MtM)
    V = vecs[:, :4]                       # 4 smallest eigenvectors
    rho = _rho(cw)
    dv = _dv_terms(V)

    def err_of(R, t):
        xc = se3.transform(R, t, X)
        z = jnp.maximum(xc[:, 2], 1e-6)
        u = xc[:, 0] / z * fx + cx
        v = xc[:, 1] / z * fy + cy
        return jnp.sum((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2)

    best_R = jnp.eye(3)
    best_t = jnp.zeros(3)
    best_e = jnp.inf
    for case_fn in (_betas_case1, _betas_case2, _betas_case3):
        b0 = case_fn(dv, rho)
        b = _gauss_newton_betas(b0, dv, rho)
        R, t = _pose_from_betas(b, V, alphas, X)
        e = err_of(R, t)
        better = e < best_e
        best_R = jnp.where(better, R, best_R)
        best_t = jnp.where(better, t, best_t)
        best_e = jnp.where(better, e, best_e)
    return best_R, best_t
