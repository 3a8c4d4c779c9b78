"""Image resize as MXU matmuls.

jax.image.resize(method="linear") lowers to gather chains on TPU (~35 ms
for the 8-level ORB pyramid of a 640x480 frame, measured through the axon
tunnel).  A separable resize is exactly a pair of matmuls against
precomputed interpolation-weight matrices — a few GFLOP the MXU retires in
microseconds.  The weights replicate jax.image.resize's triangle kernel
with antialiasing (jax/_src/image/scale.py compute_weight_mat), so the
result matches to float tolerance; both extractor paths use THIS resize so
they agree bit-exactly with each other.

Replaces the role of cv::resize in the reference pyramid
(src/ORBextractor.cc:781-822).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=None)
def resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] separable interpolation weights (triangle kernel, widened
    by the downscale factor — antialiased bilinear)."""
    scale = out_size / in_size
    inv_scale = 1.0 / scale
    kernel_scale = max(inv_scale, 1.0)
    sample_f = (np.arange(out_size) + 0.5) * inv_scale - 0.5
    x = np.abs(sample_f[None, :] - np.arange(in_size)[:, None]) / kernel_scale
    w = np.maximum(0.0, 1.0 - x)
    total = np.sum(w, axis=0, keepdims=True)
    w = np.where(np.abs(total) > 1000.0 * np.finfo(np.float32).eps,
                 w / np.where(total != 0, total, 1), 0.0)
    w = np.where((sample_f[None, :] >= -0.5)
                 & (sample_f[None, :] <= in_size - 0.5), w, 0.0)
    return np.ascontiguousarray(w.T.astype(np.float32))


def resize_bilinear(image: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """[H, W] -> [out_h, out_w], antialiased bilinear via two matmuls."""
    in_h, in_w = image.shape
    ay = resize_matrix(in_h, out_h)
    ax = resize_matrix(in_w, out_w)
    rows = jnp.einsum("hH,HW->hW", ay, image,
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("hW,wW->hw", rows, ax,
                      precision=jax.lax.Precision.HIGHEST)
