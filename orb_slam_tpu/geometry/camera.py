"""Pinhole camera with radial-tangential distortion, batched jnp ops.

Replaces the reference's use of OpenCV camera routines:
 - cv::undistortPoints (src/Frame.cc:288-318) -> iterative Newton undistort
 - projection in Frame::isInFrustum (src/Frame.cc:136-197) and the matchers.

All functions are shape-polymorphic over leading batch dims and jit/vmap safe.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import CameraConfig


class CameraParams(NamedTuple):
    """Device-friendly camera constants (pytree of scalars/arrays)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # [5] = k1, k2, p1, p2, k3
    width: int
    height: int
    # undistorted image bounds (computed once, like Frame::ComputeImageBounds
    # src/Frame.cc:320-348)
    min_x: jnp.ndarray
    min_y: jnp.ndarray
    max_x: jnp.ndarray
    max_y: jnp.ndarray

    @property
    def inv_fx(self):
        return 1.0 / self.fx

    @property
    def inv_fy(self):
        return 1.0 / self.fy


def distort_normalized(xn: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply k1..k3,p1,p2 to normalized coords xn[..., 2]."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(
    xd: jnp.ndarray, dist: jnp.ndarray, iters: int = 8
) -> jnp.ndarray:
    """Invert the distortion model by fixed-point iteration (OpenCV-style).

    x_{n+1} = (xd - tangential(x_n)) / radial(x_n); 8 iterations is ample for
    the TUM/reference distortion magnitudes.
    """
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x = xd[..., 0]
    y = xd[..., 1]
    x0, y0 = x, y
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        inv = 1.0 / radial
        x = (x0 - dx) * inv
        y = (y0 - dy) * inv
    return jnp.stack([x, y], axis=-1)


def undistort_pixels(uv: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """Distorted pixel coords -> undistorted pixel coords (same K).

    Equivalent of Frame::UndistortKeyPoints (src/Frame.cc:288-318).
    """
    xn = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    xu = undistort_normalized(xn, cam.dist)
    return jnp.stack(
        [xu[..., 0] * cam.fx + cam.cx, xu[..., 1] * cam.fy + cam.cy], axis=-1
    )


def project(xc: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """Camera-frame 3D points [..., 3] -> undistorted pixel coords [..., 2].

    (The map works on undistorted keypoints, so projection has no distortion —
    mirrors cam_project in g2o types_six_dof_expmap.cpp.)
    """
    z = xc[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = xc[..., 0] * zi * cam.fx + cam.cx
    v = xc[..., 1] * zi * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def unproject(uv: jnp.ndarray, depth: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """Undistorted pixels + depth -> camera-frame 3D points."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def bearings(uv: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """Undistorted pixels -> unit-z normalized rays [..., 3]."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def in_image(uv: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """Inside the undistorted image bounds (Frame::isInFrustum checks)."""
    return (
        (uv[..., 0] >= cam.min_x)
        & (uv[..., 0] < cam.max_x)
        & (uv[..., 1] >= cam.min_y)
        & (uv[..., 1] < cam.max_y)
    )


def make_camera(cfg: CameraConfig) -> CameraParams:
    """Build CameraParams, computing undistorted bounds from the 4 image
    corners exactly like Frame::ComputeImageBounds (src/Frame.cc:320-348)."""
    dist = jnp.asarray(cfg.dist)
    base = CameraParams(
        fx=jnp.float32(cfg.fx),
        fy=jnp.float32(cfg.fy),
        cx=jnp.float32(cfg.cx),
        cy=jnp.float32(cfg.cy),
        dist=dist,
        width=cfg.width,
        height=cfg.height,
        min_x=jnp.float32(0.0),
        min_y=jnp.float32(0.0),
        max_x=jnp.float32(cfg.width),
        max_y=jnp.float32(cfg.height),
    )
    if not cfg.has_distortion:
        return base
    corners = jnp.asarray(
        np.array(
            [[0.0, 0.0], [cfg.width, 0.0], [0.0, cfg.height], [cfg.width, cfg.height]],
            dtype=np.float32,
        )
    )
    und = undistort_pixels(corners, base)
    return base._replace(
        min_x=jnp.minimum(und[0, 0], und[2, 0]),
        max_x=jnp.maximum(und[1, 0], und[3, 0]),
        min_y=jnp.minimum(und[0, 1], und[1, 1]),
        max_y=jnp.maximum(und[2, 1], und[3, 1]),
    )
