"""Synthetic scene generators shared by solver/pipeline tests."""
import numpy as np


def make_scene(rng, n_points=300, depth_range=(4.0, 12.0), spread=6.0):
    """Random 3D points in front of the origin camera."""
    X = np.stack(
        [
            rng.uniform(-spread, spread, n_points),
            rng.uniform(-spread * 0.6, spread * 0.6, n_points),
            rng.uniform(*depth_range, n_points),
        ],
        axis=1,
    ).astype(np.float32)
    return X


def default_K():
    return np.array(
        [[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]], np.float32
    )


def project(K, R, t, X):
    Xc = X @ R.T + t
    uv = Xc @ K.T
    return uv[:, :2] / uv[:, 2:3], Xc[:, 2]


def rotmat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return (np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K).astype(
        np.float32
    )


def two_view_pair(rng, n_points=300, baseline=0.8, rot_deg=3.0, noise=0.5,
                  outlier_frac=0.1, planar=False):
    """Two views of a scene with known relative pose; returns matches with
    noise and outliers."""
    X = make_scene(rng, n_points)
    if planar:
        X[:, 2] = 6.0 + 0.3 * X[:, 0] + 0.2 * X[:, 1]  # a tilted plane
    K = default_K()
    R = rotmat([0, 1, 0], np.radians(rot_deg))
    t = np.array([-baseline, 0.0, 0.05], np.float32)

    uv1, z1 = project(K, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), X)
    uv2, z2 = project(K, R, t, X)

    uv1 += rng.normal(0, noise, uv1.shape)
    uv2 += rng.normal(0, noise, uv2.shape)

    visible = (
        (z1 > 0.1) & (z2 > 0.1)
        & (uv1[:, 0] > 0) & (uv1[:, 0] < 640) & (uv1[:, 1] > 0) & (uv1[:, 1] < 480)
        & (uv2[:, 0] > 0) & (uv2[:, 0] < 640) & (uv2[:, 1] > 0) & (uv2[:, 1] < 480)
    )

    n_out = int(outlier_frac * n_points)
    out_idx = rng.choice(n_points, n_out, replace=False)
    uv2_corrupt = uv2.copy()
    uv2_corrupt[out_idx] = rng.uniform([0, 0], [640, 480], (n_out, 2))
    is_outlier = np.zeros(n_points, bool)
    is_outlier[out_idx] = True

    return dict(
        X=X, K=K, R=R, t=t,
        uv1=uv1.astype(np.float32), uv2=uv2_corrupt.astype(np.float32),
        valid=visible, is_outlier=is_outlier,
    )
