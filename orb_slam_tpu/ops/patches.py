"""Batched patch gathering, intensity-centroid orientation, Gaussian blur.

Replaces IC_Angle (src/ORBextractor.cc:124-151) and the 7x7 sigma=2 blur
(src/ORBextractor.cc:760) with batched gathers / separable convolutions.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

HALF_PATCH = 15  # reference HALF_PATCH_SIZE (ORBextractor.cc:52)


def _circular_mask(radius: int) -> np.ndarray:
    d = np.arange(-radius, radius + 1)
    yy, xx = np.meshgrid(d, d, indexing="ij")
    return (xx * xx + yy * yy <= radius * radius).astype(np.float32)


_IC_MASK = _circular_mask(HALF_PATCH)          # [31, 31]
_IC_DX = np.arange(-HALF_PATCH, HALF_PATCH + 1, dtype=np.float32)


def gather_patches(img: jnp.ndarray, xy: jnp.ndarray, size: int) -> jnp.ndarray:
    """Gather size x size patches centered at integer-rounded xy.

    img: [H, W]; xy: [N, 2] (x, y).  Out-of-range taps clamp to the border.
    Returns [N, size, size].
    """
    h, w = img.shape
    r = size // 2
    cx = jnp.round(xy[:, 0]).astype(jnp.int32)
    cy = jnp.round(xy[:, 1]).astype(jnp.int32)
    d = jnp.arange(-r, r + 1)
    ys = jnp.clip(cy[:, None] + d[None, :], 0, h - 1)  # [N, size]
    xs = jnp.clip(cx[:, None] + d[None, :], 0, w - 1)
    return img[ys[:, :, None], xs[:, None, :]]  # [N, size, size]


def ic_angle(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation over the circular 31x31 patch.

    Returns angles in radians [N].  Matches IC_Angle's moments
    m01 = sum y*I, m10 = sum x*I within the radius-15 circle; the reference
    uses a per-row u_max raster of the same circle.
    """
    patches = gather_patches(img, xy, 2 * HALF_PATCH + 1)  # [N, 31, 31]
    mask = jnp.asarray(_IC_MASK)
    pm = patches * mask
    dx = jnp.asarray(_IC_DX)
    m10 = jnp.sum(pm * dx[None, None, :], axis=(1, 2))
    m01 = jnp.sum(pm * dx[None, :, None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def gaussian_blur7(img: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Separable 7x7 Gaussian (reference: cv::GaussianBlur(..., Size(7,7), 2, 2,
    BORDER_REFLECT_101), ORBextractor.cc:760)."""
    d = np.arange(-3, 4, dtype=np.float32)
    k = np.exp(-0.5 * (d / sigma) ** 2)
    k /= k.sum()
    k = jnp.asarray(k)

    # reflect-101 padding then two 1-D convolutions via shifts (7 taps each;
    # XLA fuses this into a couple of vector passes)
    p = jnp.pad(img, ((3, 3), (3, 3)), mode="reflect")
    h, w = img.shape
    rows = sum(k[i + 3] * p[3 + i : 3 + i + h, :] for i in range(-3, 4))
    out = sum(k[i + 3] * rows[:, 3 + i : 3 + i + w] for i in range(-3, 4))
    return out
