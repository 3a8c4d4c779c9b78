"""True multi-process distributed execution (VERDICT r2 item 2 /
SURVEY.md §5.8): N local processes joined by jax.distributed (CPU Gloo
collectives), running the REAL distributed solvers across process
boundaries — the correctness half of BASELINE config 5 that a 1-chip box
can prove.  The workers run tests/multiprocess_worker.py."""
import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(nproc: int, local_devices: int, outbase: str):
    worker = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
    env_common = dict(
        os.environ,
        ORB_SLAM_TPU_COORDINATOR=f"127.0.0.1:{_free_port()}",
        ORB_SLAM_TPU_NUM_PROCS=str(nproc),
        ORB_SLAM_TPU_TEST_OUT=outbase,
        XLA_FLAGS=f"--xla_force_host_platform_device_count={local_devices}",
    )
    procs = []
    for pid in range(nproc):
        env = dict(env_common, ORB_SLAM_TPU_PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker rc={p.returncode}\n{o[-4000:]}"
    return [json.load(open(f"{outbase}.{pid}")) for pid in range(nproc)]


@pytest.mark.slow
def test_two_process_distributed_solvers(tmp_path):
    nproc, local = 2, 2
    recs = _launch(nproc, local, str(tmp_path / "mp"))
    for r in recs:
        assert r["process_count"] == nproc
        assert r["local_devices"] == local
        assert r["global_devices"] == nproc * local
        # host mesh: model axis spans hosts, data axis spans local devices
        assert r["mesh_shape"] == [nproc, local]
        assert r["mesh_psum"] == sum(range(nproc * local))
        assert r["ba_ok"], r
        assert r["pg_ok"], r
    # multi-controller contract: replicated outputs identical on every proc
    assert recs[0]["ba_rmse_dist"] == recs[1]["ba_rmse_dist"]
    assert recs[0]["pg_dt_max"] == recs[1]["pg_dt_max"]
