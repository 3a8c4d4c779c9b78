"""Map/trajectory visualization export.

Replaces the reference's rviz publishers (FramePublisher/MapPublisher,
src/FramePublisher.cc, src/MapPublisher.cc): instead of live ROS markers,
renders the sparse map, keyframe frusta, covisibility graph and trajectory
to a PNG (matplotlib, headless) or dumps a PLY point cloud.
"""
from __future__ import annotations

import numpy as np


def export_map_png(path: str, smap, trajectory=None, max_points: int = 20000):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    st = smap.state
    valid = np.asarray(st.mp_valid)
    pts = np.asarray(st.mp_pos)[valid][:max_points]
    fig, ax = plt.subplots(figsize=(9, 9))
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], s=1.5, c="#777777", label="map points")

    # keyframe centers + spanning tree (MapPublisher draws frusta + MST,
    # src/MapPublisher.cc:29-117)
    centers = []
    for k in range(smap.n_kf):
        R = np.asarray(st.kf_R[k])
        t = np.asarray(st.kf_t[k])
        centers.append(-R.T @ t)
    centers = np.asarray(centers)
    if len(centers):
        ax.plot(centers[:, 0], centers[:, 2], "b.-", ms=4, lw=0.8,
                label="keyframes")
        for k in range(smap.n_kf):
            p = int(smap.parent[k])
            if p >= 0:
                ax.plot([centers[k, 0], centers[p, 0]],
                        [centers[k, 2], centers[p, 2]], "g-", lw=0.5)
        for a, b in (smap.loop_edges or []):
            ax.plot([centers[a, 0], centers[b, 0]],
                    [centers[a, 2], centers[b, 2]], "r-", lw=1.5,
                    label="loop edge")

    if trajectory is not None and len(trajectory):
        tr = np.asarray([
            -rec.R.T @ rec.t for rec in trajectory if rec.tracked])
        if len(tr):
            ax.plot(tr[:, 0], tr[:, 2], "k-", lw=0.5, alpha=0.6,
                    label="trajectory")

    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def export_frame_png(path: str, image, feats, assoc_valid=None, status: str = ""):
    """Debug frame image (FramePublisher equivalent, src/FramePublisher.cc:
    59-188): keypoints drawn over the frame — green boxes for tracked
    landmarks, blue dots for unmatched detections — plus a status line."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.asarray(image)
    xy = np.asarray(feats.xy)
    valid = np.asarray(feats.valid)
    tracked = (np.asarray(assoc_valid) if assoc_valid is not None
               else np.zeros(len(xy), bool))

    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(img, cmap="gray", vmin=0, vmax=255)
    free = valid & ~tracked
    ax.plot(xy[free, 0], xy[free, 1], ".", color="#4488ff", ms=2)
    trk = valid & tracked
    ax.plot(xy[trk, 0], xy[trk, 1], "s", mfc="none", mec="#00cc44", ms=5,
            mew=0.8)
    n_trk = int(trk.sum())
    ax.set_title(f"{status}  kp={int(valid.sum())} tracked={n_trk}",
                 fontsize=9)
    ax.set_axis_off()
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)


def export_map_ply(path: str, smap):
    st = smap.state
    valid = np.asarray(st.mp_valid)
    pts = np.asarray(st.mp_pos)[valid]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for p in pts:
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")
