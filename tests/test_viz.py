"""Tests for drawing primitives and flow colorization."""

import cv2
import jax.numpy as jnp
import numpy as np

from ripcurrents_tpu.viz import draw
from ripcurrents_tpu.viz.color import (color_wheel, histogram_wheel,
                                       vector_to_color)


def test_draw_segments_covers_line():
    img = jnp.zeros((50, 80, 3), jnp.uint8)
    out = np.asarray(draw.draw_segments(
        img, jnp.array([[5.0, 5.0]]), jnp.array([[70.0, 40.0]]),
        jnp.array([True]), (0, 0, 255)))
    # endpoints and midpoint colored
    assert (out[5, 5] == [0, 0, 255]).all()
    assert (out[40, 70] == [0, 0, 255]).all()
    assert (out[23, 37] == [0, 0, 255]).all() or (out[22, 37] == [0, 0, 255]).all()
    # an 8-connected line has ~max(dx, dy) pixels; sampled rasterization
    # should be in the same ballpark (not flooding the image)
    assert 60 <= (out[..., 2] == 255).sum() <= 200


def test_draw_invalid_segments_noop():
    img = jnp.zeros((50, 80, 3), jnp.uint8)
    out = np.asarray(draw.draw_segments(
        img, jnp.array([[5.0, 5.0]]), jnp.array([[70.0, 40.0]]),
        jnp.array([False]), (255, 255, 255)))
    assert out.sum() == 0


def test_draw_circles():
    img = jnp.zeros((50, 80, 3), jnp.uint8)
    out = np.asarray(draw.draw_circles(img, jnp.array([[30.0, 25.0]]), 4,
                                       (100, 0, 0)))
    assert (out[25, 30] == [100, 0, 0]).all()
    assert (out[25, 34] == [100, 0, 0]).all()
    assert (out[25, 35] == 0).all()
    want_area = np.pi * 16
    got_area = (out[..., 0] == 100).sum()
    assert abs(got_area - want_area) < 20


def test_frame_count_renders_digits():
    img = jnp.zeros((60, 120, 3), jnp.uint8)
    out = np.asarray(draw.draw_frame_count(img, 123))
    assert out.sum() > 0
    out0 = np.asarray(draw.draw_frame_count(img, 5))
    # single digit draws fewer pixels than three digits
    assert (out0 > 0).sum() < (out > 0).sum()


def test_vector_to_color_hue_mapping():
    # flow pointing +x -> angle 0 -> hue 0 -> red in HSV(0,255,V)
    flow = jnp.ones((8, 8, 2), jnp.float32) * jnp.array([1.0, 0.0])
    res = vector_to_color(flow, jnp.array(1.0))
    bgr = np.asarray(res.bgr_u8)
    assert (bgr[..., 2] == 255).all() and (bgr[..., 0] == 0).all()
    assert float(res.max_displacement) == 1.0


def test_wheels_shape_and_content():
    w = np.asarray(color_wheel(64))
    assert w.shape == (64, 64, 3)
    assert w.max() > 200
    hw = np.asarray(histogram_wheel(jnp.full(36, 0.5), jnp.full(36, 0.02),
                                    size=64))
    assert hw.shape == (64, 64, 3)


def test_blend_matches_addweighted(rng):
    a = rng.integers(0, 255, (20, 20, 3)).astype(np.uint8)
    b = rng.integers(0, 255, (20, 20, 3)).astype(np.uint8)
    got = np.asarray(draw.blend(jnp.asarray(a), jnp.asarray(b), 0.4, 0.6))
    want = cv2.addWeighted(a, 0.4, b, 0.6, 0)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
