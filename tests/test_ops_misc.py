"""Goldens for the smaller parity-API ops that no pipeline exercises
directly (library surface per SURVEY.md sections 2.3/5): RGB grayscale,
HSV->RGB, box blur, single-frame histogram threshold, generic polar
colorization, per-stream flow stats, and the standalone streakline step.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ripcurrents_tpu.config import HistogramParams, LKParams
from ripcurrents_tpu.dynamics.particles import (streakline_advance,
                                                streakline_init,
                                                streakline_step)
from ripcurrents_tpu.ops.color import hsv_to_rgb
from ripcurrents_tpu.ops.conv import box_blur
from ripcurrents_tpu.ops.hist import bin_1d, upper_1d, upper_from_1d
from ripcurrents_tpu.ops.image import rgb_to_gray
from ripcurrents_tpu.parallel.mesh import global_flow_stats
from ripcurrents_tpu.viz.color import polar_to_hsv_bgr


def test_rgb_to_gray_matches_cv2(rng):
    img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    want = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    got = np.asarray(rgb_to_gray(jnp.asarray(img)))
    # cv2's RGB2GRAY SIMD path resolves fixed-point ties differently from
    # its BGR2GRAY path (which bgr_to_gray matches bit-exactly): allow
    # one count on the rare tie pixels.
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.01


def test_hsv_to_rgb_matches_bgr_reversal(rng):
    hsv = np.stack([rng.uniform(0, 360, (16, 16)),
                    rng.uniform(0, 1, (16, 16)),
                    rng.uniform(0, 1, (16, 16))], -1).astype(np.float32)
    rgb = np.asarray(hsv_to_rgb(jnp.asarray(hsv)))
    want = cv2.cvtColor(hsv.astype(np.float32), cv2.COLOR_HSV2RGB)
    np.testing.assert_allclose(rgb, want, atol=2e-3)


def test_box_blur_matches_cv2(rng):
    img = rng.uniform(0, 255, (24, 30)).astype(np.float32)
    want = cv2.blur(img, (5, 5), borderType=cv2.BORDER_REPLICATE)
    got = np.asarray(box_blur(jnp.asarray(img), 5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_upper_1d_is_bin_then_walk(rng):
    p = HistogramParams.android()
    mag = jnp.asarray(rng.uniform(0, 8, (40, 50)).astype(np.float32))
    h, s = bin_1d(mag, p)
    np.testing.assert_allclose(float(upper_1d(mag, p)),
                               float(upper_from_1d(h, s, p)))


def test_polar_to_hsv_bgr_hue_wheel():
    """0 deg -> red-dominant BGR, 120 deg -> green, 240 deg -> blue (the
    legend convention of the reference's color wheels)."""
    ang = jnp.asarray([[0.0, 120.0, 240.0]])
    val = jnp.ones((1, 3))
    bgr = np.asarray(polar_to_hsv_bgr(ang, val))[0]
    assert bgr[0].argmax() == 2   # red channel
    assert bgr[1].argmax() == 1   # green
    assert bgr[2].argmax() == 0   # blue


def test_global_flow_stats_matches_numpy(rng):
    flow = rng.normal(size=(4, 8, 10, 2)).astype(np.float32)
    want = np.sqrt((flow ** 2).sum(-1)).mean()
    got = float(global_flow_stats(jnp.asarray(flow)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_streakline_step_equals_track_plus_advance(rng):
    h, w = 120, 160
    f0 = rng.integers(0, 256, (h, w), dtype=np.uint8)
    f1 = np.roll(f0, 2, axis=1)
    st = streakline_init((80.0, 60.0), capacity=8)
    p = LKParams.particles()
    got = streakline_step(st, jnp.asarray(f0), jnp.asarray(f1), p,
                          xdim=w, ydim=h)
    from ripcurrents_tpu.flow.lucas_kanade import pyr_lk
    res = pyr_lk(jnp.asarray(f0), jnp.asarray(f1), st.vertices, p)
    want = streakline_advance(st, res.points, xdim=w, ydim=h)
    np.testing.assert_allclose(np.asarray(got.vertices),
                               np.asarray(want.vertices))
    assert int(got.count) == int(want.count) == 2
    # the generation point is re-inserted at the head every frame
    np.testing.assert_allclose(np.asarray(got.vertices[0]), [80.0, 60.0])
