"""Config fields must actually drive the kernels (VERDICT round-1 item 6):
two-threshold FAST gating, and megastep radii/ratios responding to
MatcherConfig.
"""
import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.config import ExtractorConfig, MatcherConfig
from orb_slam_tpu.ops import detect
from orb_slam_tpu.frontend.extractor import extract_default
from orb_slam_tpu.pipeline import track_kernels as tk


def test_two_threshold_gate_cellwise():
    # 100x160 map, 10x16 cells -> 10x10 px cells
    score = np.zeros((100, 160), np.float32)
    score[5, 5] = 25.0    # hi corner, cell (0, 0)
    score[5, 8] = 10.0    # weak corner, same cell -> must be gated out
    score[55, 85] = 10.0  # weak corner, cell with no hi -> must survive
    out = np.asarray(detect.two_threshold_gate(
        jnp.asarray(score), 20.0, 10, 16))
    assert out[5, 5] == 25.0
    assert out[5, 8] == 0.0
    assert out[55, 85] == 10.0


def test_fast_threshold_changes_extraction():
    """With fast_threshold wired, a frame whose corners straddle the two
    thresholds yields different populations for th=20 vs th=7-only."""
    rng = np.random.default_rng(0)
    img = np.full((240, 320), 100.0, np.float32)
    # strong square (contrast 80 >> 20) and weak squares (contrast 12: above
    # 7, below 20) in the same grid cell neighborhood
    img[40:60, 40:60] += 80.0
    for x in (70, 90, 110):
        img[44:52, x:x + 8] += 12.0
    img += rng.normal(0, 0.5, img.shape)
    img = jnp.asarray(img)

    cfg_two = ExtractorConfig(fast_threshold=20, fast_threshold_min=7)
    cfg_low = ExtractorConfig(fast_threshold=7, fast_threshold_min=7)
    f_two = extract_default(img, cfg_two)
    f_low = extract_default(img, cfg_low)
    n_two = int(jnp.sum(f_two.valid))
    n_low = int(jnp.sum(f_low.valid))
    # the low-threshold-everywhere run must see at least as many corners,
    # and strictly more if any weak corner shares a cell with a strong one
    assert n_low >= n_two
    assert n_two > 0


def test_every_config_field_is_read():
    """Every parsed config field must be consumed somewhere in the package
    (VERDICT r2 item 4 found three parsed-but-never-read fields; this
    catches the whole class).  A field counts as read when `.name` attribute
    access appears in any non-config module."""
    import dataclasses
    import pathlib
    import re

    import orb_slam_tpu.config as C

    pkg = pathlib.Path(C.__file__).parent
    src = "".join(
        p.read_text() for p in pkg.rglob("*.py")
        if p.resolve() != pathlib.Path(C.__file__).resolve())
    unread = []
    for name in dir(C):
        cls = getattr(C, name)
        if dataclasses.is_dataclass(cls) and isinstance(cls, type):
            for f in dataclasses.fields(cls):
                if not re.search(r"\.%s\b" % re.escape(f.name), src):
                    unread.append(f"{name}.{f.name}")
    assert not unread, f"config fields parsed but never read: {unread}"


def test_connected_weights_threshold_and_best_edge():
    """Covisibility edge rule (src/KeyFrame.cc:378-421): weight >= 15 or,
    when nothing passes, the single best edge."""
    from orb_slam_tpu.mapping.mapstore import connected_weights

    row = np.asarray([0, 3, 14, 15, 40])
    out = connected_weights(row, 15)
    assert out.tolist() == [0, 0, 0, 15, 40]
    # nothing passes -> best edge survives alone
    weak = np.asarray([0, 3, 14, 9, 2])
    out = connected_weights(weak, 15)
    assert out.tolist() == [0, 0, 14, 0, 0]
    # all-zero row stays empty (no phantom best edge)
    assert connected_weights(np.zeros(4, np.int64), 15).tolist() == [0] * 4
    # matrix form = rowwise
    W = np.stack([row, weak])
    out = connected_weights(W, 15)
    assert out[0].tolist() == [0, 0, 0, 15, 40]
    assert out[1].tolist() == [0, 0, 14, 0, 0]


def test_init_extraction_uses_features_mult():
    """During NOT_INITIALIZED/INITIALIZING the extractor budget is
    init_features_mult x the runtime budget (src/Tracking.cc:128)."""
    from orb_slam_tpu.config import SystemConfig, CameraConfig, ExtractorConfig
    from orb_slam_tpu.pipeline.tracker import Tracker, TrackState

    cfg = SystemConfig(
        camera=CameraConfig(fx=500, fy=500, cx=160, cy=120,
                            k1=0, k2=0, p1=0, p2=0, k3=0,
                            width=320, height=240),
        extractor=ExtractorConfig(n_features=200, max_keypoints=256,
                                  n_levels=3, init_features_mult=2))
    tr = Tracker.create(cfg)
    img = np.random.default_rng(0).uniform(0, 255, (240, 320)).astype(np.float32)
    assert tr.state == TrackState.NOT_INITIALIZED
    feats = tr.extract(img)
    assert feats.xy.shape[0] == 512          # 2x capacity during init
    tr.state = TrackState.WORKING
    feats = tr.extract(img)
    assert feats.xy.shape[0] == 256          # runtime capacity otherwise


def test_reloc_recent_window_raises_inlier_floor():
    """Tracking.cc:640-647: 50 inliers required within mMaxFrames
    (= max_frames_between_kf) frames of a relocalisation, 30 otherwise.
    The window was 2*fps = 60 frames through r5 — 3.3x the reference —
    which let marginal stretches spiral (each reloc re-armed a long
    50-floor window the next 30-49-inlier frames re-failed)."""
    from orb_slam_tpu.config import SystemConfig, CameraConfig
    from orb_slam_tpu.pipeline.tracker import Tracker

    cfg = SystemConfig(camera=CameraConfig(
        fx=500, fy=500, cx=160, cy=120, k1=0, k2=0, p1=0, p2=0, k3=0,
        width=320, height=240, fps=30.0))
    tr = Tracker.create(cfg)
    w = cfg.tracker.max_frames_between_kf
    assert tr._inlier_floor(100) == cfg.tracker.min_localmap_inliers
    tr.last_reloc_frame_id = 100
    assert tr._inlier_floor(100) == cfg.tracker.min_localmap_inliers_reloc
    assert tr._inlier_floor(100 + w - 1) == \
        cfg.tracker.min_localmap_inliers_reloc
    assert tr._inlier_floor(100 + w) == cfg.tracker.min_localmap_inliers


def _megastep_args():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    return fn, args


def test_megastep_uses_matcher_config():
    import __graft_entry__ as ge
    from orb_slam_tpu.config import SystemConfig, CameraConfig
    from orb_slam_tpu.geometry import camera as cam_mod

    args, cam, cfg = ge._example_tracking_args()
    (cur_xy, cur_desc, cur_level, cur_angle, cur_valid,
     mp_pos, mp_desc, mp_normal, mp_min, mp_max, mp_valid,
     R, t, inv_sigma2) = args
    last_pos = mp_pos[:cur_xy.shape[0]]

    def run(mcfg):
        _, _, assoc, _, _, stats = tk.tracking_megastep(
            cur_xy, cur_desc, cur_level, cur_angle, cur_valid, inv_sigma2,
            last_pos, cur_desc, cur_level, cur_angle, cur_valid,
            mp_pos, mp_desc, mp_normal, mp_min, mp_max, mp_valid,
            R, t, cam, cfg.solver, matcher_cfg=mcfg)
        return int(stats["localmap_matches"]), int(stats["n_inliers"])

    n_default, inl_default = run(MatcherConfig())
    # shrink every search window to (effectively) zero: matching must die
    dead = MatcherConfig(
        radius_f2f=1e-3, radius_f2f_fallback=1e-3,
        radius_view_cos_tight=1e-3, radius_view_cos_wide=1e-3,
        localmap_th=1e-3, localmap_th_coarse=1e-3)
    n_dead, _ = run(dead)
    assert n_default > 50
    assert inl_default > 50
    assert n_dead < 5
