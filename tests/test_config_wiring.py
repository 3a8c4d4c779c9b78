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
