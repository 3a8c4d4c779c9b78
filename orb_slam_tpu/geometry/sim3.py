"""Sim(3) algebra (scale + rotation + translation) as pure jnp functions.

Replaces g2o's Sim3 group (reference: Thirdparty/g2o/g2o/types/sim3/sim3.h)
used for loop-closure alignment and essential-graph optimization.

A Sim3 element g = (s, R, t) acts on points as  x -> s * R x + t.
Tangent: zeta[..., 7] = (upsilon, omega, sigma) with sigma = log-scale.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import se3

_EPS = 1e-8


def identity(dtype=jnp.float32):
    return jnp.ones((), dtype), jnp.eye(3, dtype=dtype), jnp.zeros((3,), dtype)


def transform(s, R, t, x):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, x) + t


def compose(sa, Ra, ta, sb, Rb, tb):
    """g_a o g_b: x -> sa Ra (sb Rb x + tb) + ta."""
    s = sa * sb
    R = Ra @ Rb
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return s, R, t


def inverse(s, R, t):
    si = 1.0 / s
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -si[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)
    return si, Rt, ti


def exp(zeta: jnp.ndarray):
    """Sim(3) exponential map: zeta[..., 7] -> (s, R, t).

    Uses the closed-form W matrix of the Sim3 exponential
    (same semantics as g2o sim3.h ctor from a 7-vector).
    """
    ups, omega, sigma = zeta[..., :3], zeta[..., 3:6], zeta[..., 6]
    s = jnp.exp(sigma)
    R = se3.so3_exp(omega)
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = se3.hat(omega)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=zeta.dtype), W.shape)

    sig_small = jnp.abs(sigma) < 1e-5
    th_small = theta2 < 1e-10

    # Coefficients of V = A*I + B*W + C*W2 such that t = V ups.
    # General case (sigma != 0, theta != 0):
    es = s  # e^sigma
    sig = jnp.where(sig_small, jnp.ones_like(sigma), sigma)
    th = jnp.where(th_small, jnp.ones_like(theta), theta)
    a_gen = (es - 1.0) / sig
    denom = sig * sig + th * th
    b_gen = (
        (es * jnp.sin(th) * sig + (1.0 - es * jnp.cos(th)) * th) / (th * denom)
    )
    c_gen = (
        (es - 1.0) / sig - ((es * jnp.cos(th) - 1.0) * sig + es * jnp.sin(th) * th) / denom
    ) / (th * th)

    # sigma ~ 0 limits
    a_s0 = jnp.ones_like(sigma)
    b_s0 = (1.0 - jnp.cos(th)) / (th * th)
    c_s0 = (th - jnp.sin(th)) / (th * th * th)
    # theta ~ 0 limits
    a_t0 = a_gen
    b_t0 = jnp.where(
        sig_small, 0.5 * jnp.ones_like(sigma), ((sig - 1.0) * es + 1.0) / denom
    )
    c_t0 = jnp.where(
        sig_small,
        jnp.ones_like(sigma) / 6.0,
        (es * 0.5 * sig * sig + es - 1.0 - sig * es) / (sig * sig * sig),
    )
    # both small
    a_00 = jnp.ones_like(sigma)
    b_00 = 0.5 * jnp.ones_like(sigma)
    c_00 = jnp.ones_like(sigma) / 6.0

    A = jnp.where(th_small, jnp.where(sig_small, a_00, a_t0), jnp.where(sig_small, a_s0, a_gen))
    B = jnp.where(th_small, jnp.where(sig_small, b_00, b_t0), jnp.where(sig_small, b_s0, b_gen))
    C = jnp.where(th_small, jnp.where(sig_small, c_00, c_t0), jnp.where(sig_small, c_s0, c_gen))

    V = A[..., None, None] * eye + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, ups)
    return s, R, t


def log(s, R, t) -> jnp.ndarray:
    """Inverse of exp. Solves V ups = t numerically (V is 3x3)."""
    sigma = jnp.log(s)
    omega = se3.so3_log(R)
    zeta0 = jnp.concatenate(
        [jnp.zeros_like(t), omega, sigma[..., None]], axis=-1
    )
    # Recover V from the exp coefficients by evaluating exp with unit ups basis.
    # Cheaper: rebuild V exactly as in exp().
    _, _, e1 = exp(zeta0.at[..., 0].set(1.0))
    _, _, e2 = exp(zeta0.at[..., 1].set(1.0))
    _, _, e3 = exp(zeta0.at[..., 2].set(1.0))
    V = jnp.stack([e1, e2, e3], axis=-1)
    ups = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([ups, omega, sigma[..., None]], axis=-1)


def retract(s, R, t, zeta):
    """Left-multiplicative update exp(zeta) o g — matches
    VertexSim3Expmap::oplusImpl."""
    ds, dR, dt = exp(zeta)
    return compose(ds, dR, dt, s, R, t)


def from_se3(R, t):
    return jnp.ones(R.shape[:-2], R.dtype), R, t


def to_se3(s, R, t):
    """Project to SE3 by folding scale into translation (used when correcting
    keyframe poses after loop closure: [R, t/s], LoopClosing.cc:480-486)."""
    return R, t / s[..., None]
