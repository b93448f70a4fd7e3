"""Worker process for the 2-process DCN test (test_distributed.py).

Run: python tests/_dcn_worker.py <coordinator> <num_processes> <pid>
Each process owns 2 virtual CPU devices; after jax.distributed.initialize
the global runtime sees 4. Prints one JSON line with what this process
observed so the parent can assert cross-process agreement.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ripcurrents_tpu.parallel.distributed import (  # noqa: E402
    all_streams_fps, global_stream_mesh, init_cluster, local_stream_slice)


def main():
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    init_cluster(coordinator, nproc, pid)
    mesh = global_stream_mesh(space=1)
    sl = local_stream_slice(mesh)
    farm = all_streams_fps(100.0 + pid)   # 100 + 101 -> 201 on both
    print(json.dumps({
        "pid": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "stream_axis": mesh.shape["stream"],
        "slice": [sl.start, sl.stop],
        "farm_fps": farm,
    }), flush=True)


if __name__ == "__main__":
    main()
