"""SE(3) Lie-group algebra as pure jnp functions.

Replaces g2o's SE3Quat / VertexSE3Expmap semantics
(reference: Thirdparty/g2o/g2o/types/slam3d/se3quat.h,
 types_six_dof_expmap.h:90) with batched, vmappable closed forms.

Convention: a pose is a world->camera transform Tcw stored as (R, t) with
R: [..., 3, 3], t: [..., 3].  Tangent vectors xi = (upsilon, omega) with the
translation part first, matching g2o's SE3Quat::exp ordering.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of w[..., 3] -> [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: omega[..., 3] -> R[..., 3, 3]. Taylor-safe near zero."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    # sin(t)/t and (1-cos t)/t^2 with series fallback
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(omega)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """R[..., 3, 3] -> omega[..., 3].

    Uses atan2(|w|/2, (tr-1)/2), which is well-conditioned in f32 for all
    theta < pi (unlike arccos of the trace).
    """
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    wnorm = jnp.linalg.norm(w, axis=-1)  # = 2 sin(theta)
    theta = jnp.arctan2(wnorm, tr - 1.0)
    sin_t = 0.5 * wnorm
    small = sin_t < _EPS
    # w * theta / (2 sin theta); series ~ 1/2 + theta^2/12 near 0
    scale = jnp.where(
        small, 0.5 + theta * theta / 12.0, theta / jnp.maximum(2.0 * sin_t, _EPS)
    )
    # Note: near theta=pi this formula degrades; tracking increments stay small
    # so the pi branch is not needed on the hot path.
    return scale[..., None] * w


def _left_jacobian(omega: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian J_l(omega): V matrix of SE(3) exp."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    W = hat(omega)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def exp(xi: jnp.ndarray):
    """SE(3) exponential. xi[..., 6] = (upsilon, omega) -> (R, t)."""
    ups, omega = xi[..., :3], xi[..., 3:]
    R = so3_exp(omega)
    V = _left_jacobian(omega)
    t = jnp.einsum("...ij,...j->...i", V, ups)
    return R, t


def log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log: (R, t) -> xi[..., 6] = (upsilon, omega)."""
    omega = so3_log(R)
    V = _left_jacobian(omega)
    ups = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([ups, omega], axis=-1)


def compose(Ra, ta, Rb, tb):
    """(Ra,ta) o (Rb,tb): x -> Ra (Rb x + tb) + ta."""
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t


def inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def transform(R, t, x):
    """Apply to points x[..., 3]."""
    return jnp.einsum("...ij,...j->...i", R, x) + t


def retract(R, t, xi):
    """Left-multiplicative update: exp(xi) o (R, t) — matches g2o's
    VertexSE3Expmap::oplusImpl (estimate = exp(update) * estimate)."""
    dR, dt = exp(xi)
    return compose(dR, dt, R, t)


def orthonormalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project R[..., 3, 3] onto SO(3) via SVD (closest rotation in
    Frobenius norm, det +1).

    f32 pose chains (motion model: vel = Rc Rl^T, pred = vel R) compound
    off-manifold error *geometrically* (~x2.4/frame measured) because group
    operations preserve the non-orthonormal component; a 1e-7 seed reaches
    percent level within ~15 frames and poisons every reprojection.  Call
    this at per-frame update boundaries."""
    u, _, vt = jnp.linalg.svd(R)
    d = jnp.linalg.det(u @ vt)
    fix = jnp.ones(R.shape[:-2] + (3,), R.dtype).at[..., 2].set(d)
    return (u * fix[..., None, :]) @ vt


def to_matrix(R, t):
    bot = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), R.shape[:-2] + (1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def from_matrix(T):
    return T[..., :3, :3], T[..., :3, 3]


def to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """R[..., 3, 3] -> unit quaternion (qx, qy, qz, qw), TUM trajectory order.

    Shepperd's branchless-ish method via the max-trace component.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate 4*q_i^2 values
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def from_w():
        s = jnp.sqrt(jnp.maximum(qw2, _EPS)) * 2.0
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, s / 4.0], -1)

    def from_x():
        s = jnp.sqrt(jnp.maximum(qx2, _EPS)) * 2.0
        return jnp.stack([s / 4.0, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], -1)

    def from_y():
        s = jnp.sqrt(jnp.maximum(qy2, _EPS)) * 2.0
        return jnp.stack([(m01 + m10) / s, s / 4.0, (m12 + m21) / s, (m02 - m20) / s], -1)

    def from_z():
        s = jnp.sqrt(jnp.maximum(qz2, _EPS)) * 2.0
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, s / 4.0, (m10 - m01) / s], -1)

    cands = jnp.stack([from_w(), from_x(), from_y(), from_z()], axis=-2)
    idx = jnp.argmax(jnp.stack([qw2, qx2, qy2, qz2], axis=-1), axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def from_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """(qx, qy, qz, qw) -> R[..., 3, 3]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > _EPS, 2.0 / n, 0.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], -1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], -1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], -1),
        ],
        axis=-2,
    )
