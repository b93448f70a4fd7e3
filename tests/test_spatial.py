"""shard_map spatial Farneback vs single-device (8 virtual CPU devices)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ripcurrents_tpu.config import FarnebackParams
from ripcurrents_tpu.flow.farneback import farneback
from ripcurrents_tpu.parallel.mesh import make_mesh
from ripcurrents_tpu.parallel.spatial import farneback_spatial


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    return make_mesh(4, space=4)


def _clip(rng, h, w):
    yy = np.mgrid[0:h, 0:w][0].astype(np.float32)
    base = rng.uniform(0, 255, (h, w)).astype(np.float32)
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    def make(t):
        wave = 60 * np.sin(2 * np.pi * (yy / 24.0 - t * 0.11)) * (yy / h)
        return np.clip(np.roll(base, t, axis=1) * 0.7 + wave + 60,
                       0, 255).astype(np.uint8)
    return make(0), make(1)


def test_spatial_matches_single_device(mesh, rng):
    f0, f1 = _clip(rng, 512, 320)
    p = dataclasses.replace(FarnebackParams.windowed(), levels=1)
    want = np.asarray(farneback(jnp.asarray(f0), jnp.asarray(f1), p))
    got = np.asarray(farneback_spatial(
        jnp.asarray(f0), jnp.asarray(f1), p, mesh, halo=128))
    d = np.sqrt(((got - want) ** 2).sum(-1))
    # tile-aligned halo: interior rows match to float noise; the frame's
    # outer rows see the border ramp at the slab edge (module docstring)
    di = d[64:-64]
    assert np.median(di) < 1e-4
    assert di.mean() < 0.01
    assert (di > 0.1).mean() < 0.01
    border = np.concatenate([d[:64], d[-64:]])
    assert border.mean() < 0.1


def test_spatial_output_sharded(mesh, rng):
    f0, f1 = _clip(rng, 256, 320)
    p = dataclasses.replace(FarnebackParams.windowed(), levels=0)
    out = farneback_spatial(jnp.asarray(f0), jnp.asarray(f1), p, mesh,
                            halo=64)
    assert out.shape == (256, 320, 2)


def test_spatial_halo_too_big_rejected(mesh, rng):
    f0, f1 = _clip(rng, 256, 320)
    p = FarnebackParams.windowed()
    with pytest.raises(ValueError, match="halo"):
        farneback_spatial(jnp.asarray(f0), jnp.asarray(f1), p, mesh,
                          halo=96)


def test_spatial_clamped_slab_true_border(mesh, rng):
    """halo <= band/2 takes the clamped-slab exchange (r4): edge shards'
    slabs include the TRUE frame edge, so the engine's border-attenuation
    ramp lands at the real boundary and the frame's outer rows match the
    single-device result too (the replicate-pad scheme left them ~0.03+
    px off; at the production preset 0.3-0.6 px). Needs the full 128
    halo — at halo=64 slab-truncation error reaches every row
    (the stencil neighborhood exceeds the halo)."""
    f0, f1 = _clip(rng, 1024, 320)
    p = dataclasses.replace(FarnebackParams.windowed(), levels=1)
    want = np.asarray(farneback(jnp.asarray(f0), jnp.asarray(f1), p))
    got = np.asarray(farneback_spatial(
        jnp.asarray(f0), jnp.asarray(f1), p, mesh, halo=128))
    d = np.sqrt(((got - want) ** 2).sum(-1))
    assert np.median(d) < 1e-4
    border = np.concatenate([d[:64], d[-64:]])
    assert border.mean() < 0.02, f"border mean {border.mean()}"
