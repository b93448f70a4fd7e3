"""Device-mesh scale-out for multi-stream / spatially-sharded processing.

The reference is single-process with OpenCL offload (SURVEY.md section
2.6); the TPU-native scale-out story is:

- **stream parallelism** (data parallel): independent camera streams vmapped
  over a leading axis and sharded across the 'stream' mesh axis — zero
  cross-chip traffic in steady state, ICI only for aggregate metrics,
- **spatial sharding** (the context-parallel analog for images): frame rows
  sharded across the 'space' mesh axis. Stencil ops (pyramids, polynomial
  expansion, window blurs) get their halo exchanges inserted by GSPMD; the
  histogram/threshold reductions become cross-chip psums.

Everything goes through jax.jit + NamedSharding: annotate the inputs, let
XLA place the collectives on ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, space: int | None = None) -> Mesh:
    """A ('stream', 'space') mesh over the first n devices.

    `space` (rows-sharding factor) defaults to 2 when the device count is
    even, else 1.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if len(devs) < n_devices:
        raise RuntimeError(
            f"requested {n_devices} devices, have {len(devs)}")
    if space is None:
        space = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    grid = np.array(devs).reshape(n_devices // space, space)
    return Mesh(grid, ("stream", "space"))


def shard_streams(mesh: Mesh, batched_frames: jax.Array) -> jax.Array:
    """Place a (S, H, W, ...) frame batch: streams over 'stream', rows over
    'space'."""
    spec = P("stream", "space", *([None] * (batched_frames.ndim - 2)))
    return jax.device_put(batched_frames, NamedSharding(mesh, spec))


def multi_stream_step(step_fn):
    """vmap a single-stream `step(state, frame)` over a leading stream axis.

    Combined with `shard_streams` placement and jit, GSPMD partitions the
    program so each stream group runs on its own devices and any spatial
    shards exchange stencil halos over ICI.
    """
    return jax.vmap(step_fn)


def multi_stream_init(init_fn):
    return jax.vmap(init_fn)


def global_flow_stats(flow: jax.Array) -> jax.Array:
    """Aggregate |flow| mean across every stream/shard — a cross-chip
    reduction that rides ICI when flow is mesh-sharded."""
    return jnp.mean(jnp.sqrt(jnp.sum(flow * flow, axis=-1)))
