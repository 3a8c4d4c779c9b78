"""Multi-host device meshes: DCN x ICI layout for pod-scale SLAM backends.

Single-host scale-out (dist_ba, dist_pose_graph) shards over the local
chips' ICI. A multi-host deployment adds a DCN dimension: each host runs
one process, `jax.distributed` stitches them into one global device set,
and the mesh is laid out so the heavy collectives stay on ICI:

  * the LANDMARK (data) axis maps to the local chips — the per-LM-iteration
    psum of reduced camera systems ([K,6,6]+[K,6], or [K,6] per CG matvec)
    rides ICI;
  * the KEYFRAME-BLOCK (model) axis, used by the essential-graph solver and
    reserved for map-block ownership at city scale, maps across hosts — its
    per-iteration traffic is the pose deltas of boundary keyframes, small
    enough for DCN.

Environment (standard jax.distributed contract):
  ORB_SLAM_TPU_COORDINATOR  host:port of process 0
  ORB_SLAM_TPU_NUM_PROCS    total processes
  ORB_SLAM_TPU_PROC_ID      this process's index

This module is exercised on virtual device meshes in CI (a single process
with xla_force_host_platform_device_count behaves like n_hosts=1); the
layout logic is host-count independent.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed from the environment if configured.
    Returns True when running multi-process."""
    coord = os.environ.get("ORB_SLAM_TPU_COORDINATOR")
    if not coord:
        return False
    n = int(os.environ.get("ORB_SLAM_TPU_NUM_PROCS", "1"))
    pid = int(os.environ.get("ORB_SLAM_TPU_PROC_ID", "0"))
    if n <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n, process_id=pid)
    return True


def make_host_mesh(data_parallel: Optional[int] = None,
                   model_parallel: Optional[int] = None,
                   data_axis: str = "data",
                   model_axis: str = "model") -> Mesh:
    """2D (model x data) mesh over all global devices with the data axis
    packed along each host's local chips (ICI-contiguous) and the model
    axis spanning hosts (DCN).

    Defaults: data = local device count (ICI width), model = host count.
    """
    devs = jax.devices()
    n_local = jax.local_device_count()
    n_hosts = max(1, len(devs) // max(n_local, 1))
    dp = data_parallel or n_local
    mp = model_parallel or n_hosts
    if dp * mp > len(devs):
        raise ValueError(
            f"mesh {mp}x{dp} needs {mp * dp} devices, have {len(devs)}")
    # jax.devices() orders by process then local id, so reshaping
    # [hosts, local] puts the fast (data) axis on ICI neighbors
    grid = np.array(devs[: mp * dp]).reshape(mp, dp)
    return Mesh(grid, (model_axis, data_axis))
