"""Single-process checks of the multi-host helpers (8 virtual devices)."""

import jax
import numpy as np

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
