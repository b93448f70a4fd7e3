"""Pallas sparse-LK kernel vs the gather-path tracker (interpret mode).

The Pallas kernel must reproduce flow/lucas_kanade.pyr_lk (which itself
matches the classic OpenCV 3.4 algorithm, tests/test_lucas_kanade.py) up
to its documented border/wander deviations; interior points on smooth
motion must agree tightly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ripcurrents_tpu.config import LKParams
from ripcurrents_tpu.flow.lk_pallas import pyr_lk_pallas
from ripcurrents_tpu.flow.lucas_kanade import pyr_lk


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(77)
    h, w = 160, 200
    yy = np.mgrid[0:h, 0:w][0].astype(np.float32)
    base = rng.uniform(0, 255, (h, w)).astype(np.float32)
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    def make(t):
        wave = 60 * np.sin(2 * np.pi * (yy / 24.0 - t * 0.11)) * (yy / h)
        drift = np.roll(base, shift=t, axis=1)
        return np.clip(drift * 0.7 + wave + 60, 0, 255).astype(np.uint8)
    return make(0), make(1)


@pytest.mark.parametrize("preset", [LKParams.particles, LKParams.dense_grid])
def test_pallas_matches_gather_interior(pair, rng, preset):
    f0, f1 = pair
    p = preset()
    h, w = f0.shape
    # interior points: windows stay inside the image at level 0
    m = max(p.win) // 2 + 6
    pts = np.stack([rng.uniform(m, w - m, 24),
                    rng.uniform(m, h - m, 24)], axis=1).astype(np.float32)
    want = pyr_lk(jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(pts), p)
    got = pyr_lk_pallas(jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(pts),
                        p, interpret=True)
    st = np.asarray(want.status)
    d = np.sqrt(((np.asarray(got.points) - np.asarray(want.points))
                 ** 2).sum(-1))[st]
    assert np.median(d) < 0.05
    assert np.percentile(d, 90) < 0.5
    assert (np.asarray(got.status) == st).mean() > 0.85


@pytest.mark.parametrize("pps", [1, 5])
def test_pallas_batch_size_invariant(pair, rng, pps):
    """Results must not depend on pts_per_step (incl. the padded tail
    when n_pts is not a multiple of the batch)."""
    f0, f1 = pair
    p = LKParams.particles()
    h, w = f0.shape
    m = max(p.win) // 2 + 6
    pts = np.stack([rng.uniform(m, w - m, 18),
                    rng.uniform(m, h - m, 18)], axis=1).astype(np.float32)
    base = pyr_lk_pallas(jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(pts),
                         p, interpret=True, pts_per_step=4)
    got = pyr_lk_pallas(jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(pts),
                        p, interpret=True, pts_per_step=pps)
    np.testing.assert_allclose(np.asarray(got.points),
                               np.asarray(base.points), atol=1e-5)
    assert (np.asarray(got.status) == np.asarray(base.status)).all()


def test_pallas_smem_chunking_matches_single_chunk(pair, rng):
    """Point sets past the SMEM chunk size (384) split across several
    pallas_calls per level — on hardware one call at 1280 points (the
    streaklines shape, 5 x 256-vertex chains) overflowed the ~1 MB SMEM
    budget at 1536 padded bytes/point. Chunked results must equal a
    small set tracked unchunked, point for point."""
    f0, f1 = pair
    p = LKParams.particles()
    h, w = f0.shape
    m = max(p.win) // 2 + 6
    big = np.stack([rng.uniform(m, w - m, 1280),
                    rng.uniform(m, h - m, 1280)], axis=1).astype(np.float32)
    got = pyr_lk_pallas(jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(big),
                        p, interpret=True)
    # the first 100 points tracked alone (single chunk) must match the
    # same points inside the chunked 1280-point call
    small = pyr_lk_pallas(jnp.asarray(f0), jnp.asarray(f1),
                          jnp.asarray(big[:100]), p, interpret=True)
    np.testing.assert_allclose(np.asarray(got.points)[:100],
                               np.asarray(small.points), atol=1e-5)
    assert (np.asarray(got.status)[:100]
            == np.asarray(small.status)).all()


def test_custom_vmap_rule_matches_per_stream(pair, rng):
    """The TPU tracker's custom vmap rule (flow/lucas_kanade._tpu_tracker)
    maps batched trackers sequentially — on hardware jax's automatic
    batching of the pallas_call fails Mosaic lowering (ANY-space blocks
    are batch-1 only), which crashed the multi-stream --videos runner's
    point-tracking modes. Run the rule in interpret mode on a 2-stream
    batch and check it equals per-stream calls."""
    import jax

    from ripcurrents_tpu.flow.lucas_kanade import _tpu_tracker
    f0, f1 = pair
    p = LKParams.particles()
    h, w = f0.shape
    m = max(p.win) // 2 + 6
    pts = np.stack([rng.uniform(m, w - m, 12),
                    rng.uniform(m, h - m, 12)], axis=1).astype(np.float32)
    track = _tpu_tracker(p, interpret=True)
    b0 = jnp.stack([jnp.asarray(f0)] * 2)
    b1 = jnp.stack([jnp.asarray(f1), jnp.asarray(f0)])  # streams differ
    bp = jnp.stack([jnp.asarray(pts), jnp.asarray(pts + 1.0)])
    batched = jax.vmap(track)(b0, b1, bp)
    for s in range(2):
        single = track(b0[s], b1[s], bp[s])
        np.testing.assert_allclose(np.asarray(batched.points)[s],
                                   np.asarray(single.points), atol=1e-5)
        assert (np.asarray(batched.status)[s]
                == np.asarray(single.status)).all()


def test_pallas_out_of_bounds(pair):
    f0, f1 = pair
    pts = jnp.asarray(np.array([[-300.0, -300.0]], np.float32))
    got = pyr_lk_pallas(jnp.asarray(f0), jnp.asarray(f1), pts,
                        LKParams.particles(), interpret=True)
    assert not bool(np.asarray(got.status)[0])
