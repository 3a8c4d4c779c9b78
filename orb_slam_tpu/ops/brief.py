"""Steered-BRIEF 256-bit descriptors, batched over keypoints.

Replaces computeOrbDescriptor (src/ORBextractor.cc:155-194) — the reference
walks the 256 test pairs per keypoint on the CPU; here all keypoints sample
all 512 pattern points in one gather, compare pairs, and pack bits into
uint32[8] lanes (the layout the Hamming kernels consume).

The 256-pair sampling pattern is the public ORB constant (bit_pattern_31 from
the ORB paper / OpenCV, reproduced at ORBextractor.cc:197-455), loaded from
data/brief_pattern.npy.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

_PATTERN_PATH = os.path.join(os.path.dirname(__file__), "..", "data", "brief_pattern.npy")
_PATTERN = np.load(os.path.abspath(_PATTERN_PATH)).astype(np.float32)  # [256, 4]
# sample points: [512, 2] alternating (x1,y1),(x2,y2) per pair
_POINTS = _PATTERN.reshape(256, 2, 2).reshape(512, 2)


def brief_descriptors(
    img: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """img: blurred level image [H, W]; xy: [N, 2]; angle: [N] radians.

    Returns uint32 [N, 8] packed descriptors (bit b of word w = test 32*w+b),
    matching the reference's byte layout bit-for-bit on identical inputs
    (pair j sets bit j%8 of byte j//8 -> bit j%32 of word j//32 little-endian).
    """
    h, w = img.shape
    ca = jnp.cos(angle)[:, None]  # [N, 1]
    sa = jnp.sin(angle)[:, None]
    px = jnp.asarray(_POINTS[:, 0])[None, :]  # [1, 512]
    py = jnp.asarray(_POINTS[:, 1])[None, :]

    # steered pattern, rounded like the reference's cvRound
    sx = jnp.round(px * ca - py * sa + xy[:, 0:1])
    sy = jnp.round(px * sa + py * ca + xy[:, 1:2])
    xi = jnp.clip(sx.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(sy.astype(jnp.int32), 0, h - 1)

    samples = img[yi, xi]  # [N, 512]
    t0 = samples[:, 0::2]
    t1 = samples[:, 1::2]
    bits = (t0 < t1).astype(jnp.uint32)  # [N, 256]

    bits = bits.reshape(-1, 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)  # [N, 8]
