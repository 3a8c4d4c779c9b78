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

from .config import SystemConfig  # noqa: F401
