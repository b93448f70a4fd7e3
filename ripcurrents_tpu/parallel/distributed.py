"""Multi-host scale-out: stream farms over DCN.

The single-host story (parallel/mesh.py) shards independent camera
streams over the chips of one host and frame rows over the 'space' axis;
collectives ride ICI. Scaling past one host follows the standard JAX
multi-controller recipe:

1. every host runs the same program and calls `init_cluster()`
   (jax.distributed.initialize) so all processes join one runtime,
2. `global_stream_mesh()` lays the 'stream' axis across processes —
   stream-parallel work is embarrassingly parallel, so steady-state
   traffic over DCN is zero; only aggregate metrics (psums over the
   'stream' axis) cross hosts,
3. each host decodes its OWN videos (data never crosses hosts) and runs
   the usual mode scans on its local shard via
   `jax.experimental.multihost_utils` helpers or plain per-host
   run_video calls; `all_streams_fps()` gives the farm-wide throughput.

There is no cross-host traffic in the hot path by construction (the
reference is a single-process app, SURVEY.md section 2.6; multi-host here
is a capability extension, tested single-process in CI and structurally
on the virtual mesh).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def init_cluster(coordinator_address: Optional[str] = None,
                 num_processes: Optional[int] = None,
                 process_id: Optional[int] = None) -> None:
    """Join the multi-host JAX runtime (no-op for a single process).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters."""
    if num_processes in (None, 1) and coordinator_address is None \
            and jax.process_count() == 1:
        return  # single-controller run; nothing to initialize
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id)


def global_stream_mesh(space: int = 1) -> Mesh:
    """('stream', 'space') mesh over ALL processes' devices.

    The 'stream' axis is ordered host-major, so each host's streams live
    on its local chips (ICI within a host, DCN only for aggregates)."""
    devs = np.array(jax.devices())
    n = len(devs)
    if n % space:
        raise ValueError(f"{n} devices not divisible by space={space}")
    return Mesh(devs.reshape(n // space, space), ("stream", "space"))


def local_stream_slice(mesh: Mesh) -> slice:
    """The rows of the global stream axis owned by this process."""
    per = mesh.shape["stream"] // jax.process_count()
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def all_streams_fps(local_fps: float) -> float:
    """Farm-wide aggregate throughput (psum over hosts via DCN)."""
    x = jnp.asarray([local_fps], jnp.float32)
    from jax.experimental import multihost_utils
    return float(multihost_utils.process_allgather(x).sum())
