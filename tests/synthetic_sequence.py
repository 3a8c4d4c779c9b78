"""Synthetic feature-level sequence generator for pipeline integration tests
(SURVEY.md §4: rendered point clouds with known trajectory -> ATE ~ 0).

Instead of rendering pixels, we synthesize FrameFeatures directly: world
landmarks carry fixed random 256-bit descriptors; each frame projects the
visible ones through the ground-truth pose, adds pixel noise and descriptor
bit flips, and packs them into the extractor's fixed-slot layout.  This
exercises everything downstream of the extractor (matching, init, tracking,
mapping, BA) with a known trajectory.
"""
import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.frontend.extractor import FrameFeatures
from synthetic import rotmat


def make_world(rng, n_points=800, extent=12.0, depth=8.0):
    X = np.stack(
        [
            rng.uniform(-extent, extent, n_points),
            rng.uniform(-extent * 0.5, extent * 0.5, n_points),
            rng.uniform(depth * 0.5, depth * 1.5, n_points),
        ],
        axis=1,
    ).astype(np.float32)
    desc = rng.integers(0, 2**32, size=(n_points, 8), dtype=np.uint32)
    return X, desc


def circular_trajectory(n_frames, radius=0.02, advance=0.06, yaw_rate=0.2):
    """Gentle forward motion with slight yaw — monocular-friendly."""
    poses = []
    for i in range(n_frames):
        yaw = np.radians(yaw_rate * i)
        R = rotmat([0, 1, 0], yaw)
        t = np.array(
            [-advance * i, radius * np.sin(0.1 * i), 0.002 * i], np.float32
        )
        poses.append((R, t.astype(np.float32)))
    return poses


def driving_loop(n_frames, radius=3.0):
    """Camera drives a full circle in the x-z plane facing the tangent —
    returns to the start with the start keyframes long out of covisibility,
    forcing a genuine loop closure."""
    poses = []
    for i in range(n_frames):
        th = 2 * np.pi * i / (n_frames - 8)  # slight overlap past 360 deg
        C = np.array([radius * (1 - np.cos(th)), 0.0, radius * np.sin(th)],
                     np.float32)
        f = np.array([np.sin(th), 0.0, np.cos(th)], np.float32)
        d = np.array([0.0, 1.0, 0.0], np.float32)
        r = np.cross(d, f)
        Rc2w = np.stack([r, d, f], axis=1).astype(np.float32)
        R = Rc2w.T
        t = -R @ C
        poses.append((R, t.astype(np.float32)))
    return poses


def box_world(rng, n_points=4000, lo=(-7.0, -2.5, -7.0), hi=(13.0, 2.5, 13.0)):
    X = np.stack([rng.uniform(lo[k], hi[k], n_points) for k in range(3)],
                 axis=1).astype(np.float32)
    desc = rng.integers(0, 2**32, size=(n_points, 8), dtype=np.uint32)
    return X, desc


def annulus_world(rng, n_points=6000, center=(3.0, 0.0, 0.0),
                  r_lo=2.0, r_hi=9.0, y_half=2.5):
    """Feature-rich ring around the driving-loop circle (whose center is
    (radius, 0, 0) — see driving_loop): every tangential viewpoint sees a
    comparable feature density."""
    th = rng.uniform(0, 2 * np.pi, n_points)
    r = np.sqrt(rng.uniform(r_lo**2, r_hi**2, n_points))
    X = np.stack([
        center[0] + r * np.sin(th),
        rng.uniform(-y_half, y_half, n_points),
        center[2] + r * np.cos(th),
    ], axis=1).astype(np.float32)
    desc = rng.integers(0, 2**32, size=(n_points, 8), dtype=np.uint32)
    return X, desc


def render_frame(rng, X, desc, R, t, K, n_slots=512, noise=0.3,
                 flip_bits=3, width=640, height=480, drop_frac=0.05,
                 priority=None, obj_size=None):
    """priority: optional [n_points] salience ranking — when given, the same
    strong landmarks are selected every frame (detector repeatability),
    instead of a fresh random subsample (which churns the feature set and
    starves matching).

    obj_size: optional [n_points] physical-size constant per landmark; when
    given, the detected pyramid level follows the scale model the tracker's
    PredictScale assumes (level ~ log(size/depth)/log(1.2), clipped to
    [0, 7]) instead of a flat level 0 — required for sequences that revisit
    landmarks at substantially different distances (a real detector would
    re-detect them at a different octave)."""
    xc = X @ R.T + t
    z = xc[:, 2]
    uv = np.stack(
        [K[0, 0] * xc[:, 0] / np.maximum(z, 1e-6) + K[0, 2],
         K[1, 1] * xc[:, 1] / np.maximum(z, 1e-6) + K[1, 2]], axis=1)
    vis = (z > 0.3) & (uv[:, 0] >= 8) & (uv[:, 0] < width - 8) & \
          (uv[:, 1] >= 8) & (uv[:, 1] < height - 8)
    vis &= rng.uniform(size=len(X)) > drop_frac  # random dropouts
    idx = np.where(vis)[0]
    if priority is not None:
        idx = idx[np.argsort(priority[idx])]
    else:
        rng.shuffle(idx)
    idx = idx[:n_slots]
    n = len(idx)

    uv_n = uv[idx] + rng.normal(0, noise, (n, 2))
    d = desc[idx].copy()
    for i in range(n):
        for b in rng.choice(256, size=flip_bits, replace=False):
            d[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)

    xy = np.zeros((n_slots, 2), np.float32)
    dd = np.zeros((n_slots, 8), np.uint32)
    xy[:n] = uv_n
    dd[:n] = d
    valid = np.zeros(n_slots, bool)
    valid[:n] = True
    levels = np.zeros(n_slots, np.int32)
    if obj_size is not None:
        levels[:n] = np.clip(np.round(
            np.log(obj_size[idx] / np.maximum(z[idx], 1e-3)) / np.log(1.2)
        ), 0, 7).astype(np.int32)
    return FrameFeatures(
        xy=jnp.asarray(xy),
        response=jnp.asarray(valid, jnp.float32) * 50.0,
        angle=jnp.zeros(n_slots),
        level=jnp.asarray(levels),
        desc=jnp.asarray(dd),
        valid=jnp.asarray(valid),
    ), idx
