"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ripcurrents_tpu.config import FarnebackParams
from ripcurrents_tpu.flow.farneback import farneback
from ripcurrents_tpu.parallel.mesh import (make_mesh, multi_stream_init,
                                           multi_stream_step, shard_streams)
from ripcurrents_tpu.pipelines.common import ModeConfig
from ripcurrents_tpu.pipelines.legacy import make_legacy


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.shape["stream"] * mesh.shape["space"] == 8


def test_sharded_farneback_matches_single_device(mesh, rng):
    """Spatially-sharded flow must equal the single-device result — GSPMD
    halo exchange correctness for the stencil chain."""
    p = FarnebackParams(0.5, 1, 10, 2, 7, 1.2, True)
    clip = rng.uniform(0, 255, (5, 64, 96)).astype(np.float32)
    prev, nxt = jnp.asarray(clip[:-1]), jnp.asarray(clip[1:])

    f = jax.jit(jax.vmap(lambda a, b: farneback(a, b, p)))
    want = np.asarray(f(prev, nxt))

    with mesh:
        sprev = jax.device_put(prev, NamedSharding(mesh, P("stream", "space")))
        snxt = jax.device_put(nxt, NamedSharding(mesh, P("stream", "space")))
        got = np.asarray(f(sprev, snxt))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_multi_stream_legacy_step(mesh, rng):
    """One full multi-stream rip-detection step over the mesh."""
    n_streams = mesh.shape["stream"]
    cfg = ModeConfig(xdim=96, ydim=64, total_frames=8, legacy_seeds=8)
    init, step = make_legacy(cfg)
    raw = jnp.asarray(rng.integers(0, 255, (n_streams, 80, 120, 3),
                                   np.uint8))
    states = multi_stream_init(init)(raw)
    frames = jax.device_put(
        raw, NamedSharding(mesh, P("stream", "space", None, None)))
    with mesh:
        new_states, outs = jax.jit(multi_stream_step(step))(states, frames)
        jax.block_until_ready(outs)
    assert outs.overlay_bgr.shape == (n_streams, 64, 96, 3)
    # streams are independent: equal inputs give equal outputs
    a = np.asarray(outs.mask)
    assert a.shape[0] == n_streams


def test_stream_sharding_independence(mesh, rng):
    """Identical streams produce identical outputs when sharded (no
    cross-stream leakage)."""
    cfg = ModeConfig(xdim=96, ydim=64, total_frames=8, legacy_seeds=8)
    init, step = make_legacy(cfg)
    one = rng.integers(0, 255, (80, 120, 3), np.uint8)
    n_streams = mesh.shape["stream"]
    raw = jnp.asarray(np.stack([one] * n_streams))
    states = multi_stream_init(init)(raw)
    with mesh:
        frames = shard_streams(mesh, raw)
        _, outs = jax.jit(multi_stream_step(step))(states, frames)
        overlay = np.asarray(outs.overlay_bgr)
    for s in range(1, n_streams):
        np.testing.assert_array_equal(overlay[0], overlay[s])
