import textwrap

from orb_slam_tpu.dataio.settings import parse_settings, config_from_settings


def write_settings(tmp_path):
    p = tmp_path / "Settings.yaml"
    p.write_text(textwrap.dedent("""\
        %YAML:1.0
        # Camera calibration
        Camera.fx: 268.9633
        Camera.fy: 269.9858
        Camera.cx: 157.6087
        Camera.cy: 114.6369
        Camera.k1:-0.4157
        Camera.k2: 0.2624
        Camera.k3:-0.1178
        Camera.p1: 0.0
        Camera.p2: 0.0
        Camera.fps: 8.0
        Camera.RGB: 1
        ORBextractor.nFeatures: 1000
        ORBextractor.scaleFactor: 1.2
        ORBextractor.nLevels: 8
        ORBextractor.fastTh: 20
        ORBextractor.nScoreType: 1
        UseMotionModel: 1
    """))
    return str(p)


def test_parse_reference_format(tmp_path):
    v = parse_settings(write_settings(tmp_path))
    assert v["Camera.fx"] == 268.9633
    assert v["Camera.k1"] == -0.4157  # no-space-after-colon entry
    assert v["ORBextractor.nFeatures"] == 1000


def test_config_from_settings(tmp_path):
    cfg = config_from_settings(write_settings(tmp_path), width=320, height=240)
    assert abs(cfg.camera.fx - 268.9633) < 1e-6
    assert cfg.camera.fps == 8.0
    assert cfg.extractor.n_features == 1000
    # derived cadence: 18 * 8 / 30 = 4.8 -> 5
    assert cfg.tracker.max_frames_between_kf == 5
    assert cfg.tracker.use_motion_model


def test_real_reference_settings():
    cfg = config_from_settings("/root/reference/Data/Settings.yaml",
                               width=320, height=240)
    assert abs(cfg.camera.fx - 268.9633) < 1e-3
    assert cfg.extractor.n_levels == 8
