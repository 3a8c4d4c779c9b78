"""orb_slam_tpu — a TPU-native monocular SLAM engine (JAX/XLA/Pallas).

Brand-new implementation of the full capability surface of the reference
system (worxli/ORB_SLAM, mounted at /root/reference): real-time monocular
tracking, local mapping with bundle adjustment, place recognition,
relocalisation and loop closing — redesigned TPU-first:

 - batched Pallas/XLA kernels replace per-keypoint C++ loops,
 - a flat SoA map (masked fixed-capacity arrays) replaces the pointer graph,
 - pure-functional updates replace per-object mutexes,
 - batched Gauss-Newton/LM with Schur reduction replaces g2o,
 - jax.sharding meshes replace single-host shared memory for scale-out.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache (jax-native, content-addressed).

    Cold compiles through the tunneled-TPU toolchain run tens of seconds to
    minutes per program; the staged tracking paths (init, reloc, mapping)
    comprise dozens of programs.  Caching them on disk makes every process
    after the first start warm — including the driver's bench run.  Honors
    JAX_COMPILATION_CACHE_DIR if the user already set one."""
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax
        cache_dir = _os.environ.get(
            "ORB_SLAM_TPU_CACHE_DIR",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:  # pragma: no cover — never block import on cache setup
        pass


_enable_compilation_cache()

from .config import (  # noqa: F401,E402
    CameraConfig,
    ExtractorConfig,
    MapConfig,
    MatcherConfig,
    MeshConfig,
    SolverConfig,
    SystemConfig,
    TrackerConfig,
)


def load_system(settings_path: str, width: int = 640, height: int = 480):
    """Build a System from a reference-format Settings.yaml (lazy import —
    keeps `import orb_slam_tpu` light).  Image size is not stored in the
    reference's settings format, so pass it explicitly."""
    from .dataio.settings import config_from_settings
    from .pipeline.system import System
    return System.create(config_from_settings(settings_path, width, height))
