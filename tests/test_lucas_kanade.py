"""Golden tests: pyramidal LK tracker vs cv2.calcOpticalFlowPyrLK.

A small fraction of points in ambiguous texture can converge to different
local minima from float noise, so bounds are on medians/percentiles.
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from ripcurrents_tpu.config import LKParams
from ripcurrents_tpu.flow.lucas_kanade import pyr_lk


@pytest.fixture(scope="module")
def pair(rng):
    h, w = 160, 200
    yy = np.mgrid[0:h, 0:w][0].astype(np.float32)
    base = rng.uniform(0, 255, (h, w)).astype(np.float32)
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), ax, base)
    def make(t):
        wave = 60 * np.sin(2 * np.pi * (yy / 24.0 - t * 0.11)) * (yy / h)
        drift = np.roll(base, shift=t, axis=1)
        return np.clip(drift * 0.7 + wave + 60, 0, 255).astype(np.uint8)
    return make(0), make(1)


@pytest.mark.parametrize("preset", [LKParams.particles, LKParams.dense_grid])
def test_tracks_match_cv2(pair, rng, preset):
    f0, f1 = pair
    p = preset()
    h, w = f0.shape
    pts = np.stack([rng.uniform(5, w - 5, 40),
                    rng.uniform(5, h - 5, 40)], axis=1).astype(np.float32)
    want, st, _ = cv2.calcOpticalFlowPyrLK(
        f0, f1, pts.reshape(-1, 1, 2), None, winSize=p.win, maxLevel=p.levels,
        criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS,
                  p.max_iters, p.eps),
        flags=0, minEigThreshold=p.min_eig_threshold)
    want = want.reshape(-1, 2)
    st = st.reshape(-1).astype(bool)
    got = pyr_lk(jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(pts), p)
    d = np.sqrt(((np.asarray(got.points) - want) ** 2).sum(-1))[st]
    assert np.median(d) < 0.05
    assert np.percentile(d, 80) < 0.3
    assert (np.asarray(got.status) == st).mean() > 0.9


def test_translation_tracks(rng):
    base = rng.uniform(0, 255, (140, 180)).astype(np.float32)
    k = np.ones(7) / 7
    for ax in (0, 1):
        base = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), ax, base)
    f0 = base[10:110, 10:150].astype(np.uint8)
    f1 = base[8:108, 7:147].astype(np.uint8)  # motion (+3, +2)
    pts = np.array([[40.0, 40.0], [70.0, 50.0], [100.0, 60.0]], np.float32)
    got = pyr_lk(jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(pts),
                 LKParams((21, 21), 3, 30, 0.01, 1e-4))
    moved = np.asarray(got.points) - pts
    assert np.allclose(moved[:, 0], 3.0, atol=0.15)
    assert np.allclose(moved[:, 1], 2.0, atol=0.15)
    assert np.asarray(got.status).all()


def test_out_of_bounds_point(pair):
    f0, f1 = pair
    pts = jnp.asarray(np.array([[-300.0, -300.0]], np.float32))
    got = pyr_lk(jnp.asarray(f0), jnp.asarray(f1), pts, LKParams.particles())
    assert not bool(np.asarray(got.status)[0])
