"""Aux subsystems: checkpoint/resume, viz export, timing, dataset parsing."""
import os

import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.config import MapConfig
from orb_slam_tpu.mapping import mapstore, checkpoint
from orb_slam_tpu.utils.timing import StageTimer
from orb_slam_tpu.dataio import trajectory as traj


def small_map():
    cfg = MapConfig(max_keyframes=8, max_points=64)
    smap = mapstore.SlamMap.create(cfg, n_slots=16)
    rng = np.random.default_rng(0)
    kf = smap.add_keyframe(
        jnp.eye(3), jnp.zeros(3),
        jnp.asarray(rng.uniform(0, 100, (16, 2)).astype(np.float32)),
        jnp.zeros(16, jnp.int32), jnp.zeros(16),
        jnp.asarray(rng.integers(0, 2**32, (16, 8), dtype=np.uint32)),
        jnp.ones(16, bool), jnp.full(16, -1, jnp.int32),
        frame_id=0, timestamp=0.5)
    ids = smap.add_points(
        jnp.asarray(rng.normal(0, 1, (16, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2**32, (16, 8), dtype=np.uint32)),
        jnp.zeros((16, 3)), jnp.zeros(16), jnp.full(16, np.inf),
        kf, np.ones(16, bool))
    smap.set_observations(kf, jnp.arange(16), jnp.asarray(ids))
    smap.loop_edges.append((0, 0))
    return cfg, smap


def test_checkpoint_roundtrip(tmp_path):
    cfg, smap = small_map()
    p = str(tmp_path / "map.npz")
    checkpoint.save_map(p, smap)
    loaded = checkpoint.load_map(p, cfg)
    assert loaded.n_kf == smap.n_kf
    assert loaded.n_mp == smap.n_mp
    assert loaded.loop_edges == [(0, 0)]
    np.testing.assert_array_equal(
        np.asarray(loaded.state.mp_pos), np.asarray(smap.state.mp_pos))
    np.testing.assert_array_equal(
        np.asarray(loaded.state.kf_obs), np.asarray(smap.state.kf_obs))


def test_viz_export(tmp_path):
    from orb_slam_tpu.utils import viz
    cfg, smap = small_map()
    png = str(tmp_path / "map.png")
    ply = str(tmp_path / "map.ply")
    viz.export_map_png(png, smap)
    viz.export_map_ply(ply, smap)
    assert os.path.getsize(png) > 1000
    assert "element vertex 16" in open(ply).read()


def test_stage_timer():
    t = StageTimer(echo=False)
    with t.stage("tracking", "extract"):
        pass
    with t.stage("tracking", "extract"):
        pass
    s = t.summary()
    assert s["tracking/extract"]["count"] == 2


def test_tum_reader(tmp_path):
    from orb_slam_tpu.dataio.datasets import TumSequence
    root = tmp_path / "seq"
    (root / "rgb").mkdir(parents=True)
    from PIL import Image
    for i in range(3):
        Image.new("L", (32, 24), color=i * 10).save(root / "rgb" / f"{i}.png")
    with open(root / "rgb.txt", "w") as f:
        f.write("# comment\n")
        for i in range(3):
            f.write(f"{i}.0 rgb/{i}.png\n")
    with open(root / "groundtruth.txt", "w") as f:
        for i in range(3):
            f.write(f"{i}.0 0 0 {i} 0 0 0 1\n")
    seq = TumSequence.open(str(root))
    assert len(seq) == 3
    frames = list(seq.frames())
    assert frames[0][1].shape == (24, 32)
    gt = seq.groundtruth()
    assert gt.shape == (3, 8)


def test_associate_by_time():
    a = np.asarray([0.0, 1.0, 2.0])
    b = np.asarray([0.01, 0.99, 5.0])
    ia, ib = traj.associate_by_time(a, b, max_dt=0.05)
    assert list(ia) == [0, 1]
    assert list(ib) == [0, 1]


def test_device_trace_top_ops(tmp_path):
    """utils/profiling captures a device trace and summarizes op times."""
    import jax.numpy as jnp
    from orb_slam_tpu.utils.profiling import device_trace, top_ops

    d = str(tmp_path / "trace")
    with device_trace(d):
        x = jnp.ones((128, 128))
        (x @ x).block_until_ready()
    ops = top_ops(d)
    assert ops and ops[0][0] >= 0.0
    assert any(isinstance(n, str) and n for _, n in ops)
