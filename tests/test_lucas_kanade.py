"""Golden tests: pyramidal LK tracker.

Two oracles, because OpenCV changed LK border-window behavior after the
3.4 era the reference app was built against (RipCurrents_main links
OpenCV 3.4.1):

- tests/lk_oracle34.py — a numpy transcription of the classic 3.4
  fixed-point algorithm. Our tracker must match it closely for ALL points,
  including windows straddling the frame edge.
- the installed cv2 (5.x) — agrees with 3.4 for windows that stay inside
  the image at every pyramid level; those points are compared tightly.
  Edge windows legitimately differ between 3.4 and 5.x (up to several px),
  so they are bounded loosely against 5.x.
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from ripcurrents_tpu.config import LKParams
from ripcurrents_tpu.flow.lucas_kanade import pyr_lk

from lk_oracle34 import build_pyramid as oracle_pyramid, lk34


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(77)
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


def _interior_at_all_levels(pts, shape, p, slack=4.0):
    """Points whose window (incl. bilinear tap and iteration slack) stays
    inside the image at every pyramid level — the regime where OpenCV 3.4
    and 5.x agree."""
    h, w = shape
    nlev, _ = oracle_pyramid(np.zeros(shape, np.uint8), p.win, p.levels)
    hx, hy = (p.win[0] - 1) * 0.5, (p.win[1] - 1) * 0.5
    ok = np.ones(len(pts), bool)
    lh, lw = h, w
    for lvl in range(nlev + 1):
        x = pts[:, 0] / (2.0 ** lvl)
        y = pts[:, 1] / (2.0 ** lvl)
        ok &= (x - hx - slack >= 0) & (x + hx + slack + 1 < lw)
        ok &= (y - hy - slack >= 0) & (y + hy + slack + 1 < lh)
        lh, lw = (lh + 1) // 2, (lw + 1) // 2
    return ok


@pytest.mark.parametrize("preset", [LKParams.particles, LKParams.dense_grid])
def test_tracks_match_classic_34(pair, rng, preset):
    """All points (edge windows included) match the 3.4-era algorithm."""
    f0, f1 = pair
    p = preset()
    h, w = f0.shape
    pts = np.stack([rng.uniform(5, w - 5, 40),
                    rng.uniform(5, h - 5, 40)], axis=1).astype(np.float32)
    want, st = lk34(f0, f1, pts, p.win, p.levels, p.max_iters, p.eps,
                    p.min_eig_threshold)
    got = pyr_lk(jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(pts), p)
    d = np.sqrt(((np.asarray(got.points) - want) ** 2).sum(-1))[st]
    assert np.median(d) < 0.01
    assert np.percentile(d, 95) < 0.05
    assert d.max() < 0.2
    assert (np.asarray(got.status) == st).mean() > 0.95


@pytest.mark.parametrize("preset", [LKParams.particles, LKParams.dense_grid])
def test_tracks_match_cv2(pair, rng, preset):
    f0, f1 = pair
    p = preset()
    h, w = f0.shape
    pts = np.stack([rng.uniform(5, w - 5, 80),
                    rng.uniform(5, h - 5, 80)], axis=1).astype(np.float32)
    want, st, _ = cv2.calcOpticalFlowPyrLK(
        f0, f1, pts.reshape(-1, 1, 2), None, winSize=p.win, maxLevel=p.levels,
        criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS,
                  p.max_iters, p.eps),
        flags=0, minEigThreshold=p.min_eig_threshold)
    want = want.reshape(-1, 2)
    st = st.reshape(-1).astype(bool)
    got = pyr_lk(jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(pts), p)
    d = np.sqrt(((np.asarray(got.points) - want) ** 2).sum(-1))
    interior = _interior_at_all_levels(pts, f0.shape, p)
    di = d[st & interior]
    assert len(di) >= 3  # the fixture must keep exercising this regime
    assert np.median(di) < 0.02
    assert di.max() < 0.1
    # Edge windows: 3.4-vs-5.x border semantics differ; loose sanity bound.
    de = d[st & ~interior]
    if len(de):
        assert np.percentile(de, 80) < 2.0
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
