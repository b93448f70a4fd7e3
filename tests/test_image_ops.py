"""Golden tests for ops.image / ops.polar / ops.color / ops.colormap vs OpenCV."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from ripcurrents_tpu.ops import colormap as cmap
from ripcurrents_tpu.ops import color as colorops
from ripcurrents_tpu.ops import conv as convops
from ripcurrents_tpu.ops import image as imops
from ripcurrents_tpu.ops import polar as polarops
from ripcurrents_tpu.ops import warp as warpops


def test_bgr_to_gray_exact(beach_frames):
    img = beach_frames[0]
    got = np.asarray(imops.bgr_to_gray(jnp.asarray(img)))
    want = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("size", [(480, 640), (120, 160), (77, 123)])
def test_resize_bilinear(beach_frames, size):
    img = beach_frames[0]
    got = np.asarray(imops.resize_bilinear(jnp.asarray(img), size)).astype(np.int32)
    want = cv2.resize(img, (size[1], size[0]), interpolation=cv2.INTER_LINEAR).astype(np.int32)
    # OpenCV uses 11-bit fixed point; allow 1 LSB.
    assert np.abs(got - want).max() <= 1


@pytest.mark.parametrize("size", [(60, 80), (48, 64), (33, 57)])
def test_resize_area_downscale(beach_frames, size):
    img = beach_frames[0]
    got = np.asarray(imops.resize_area(jnp.asarray(img), size)).astype(np.int32)
    want = cv2.resize(img, (size[1], size[0]), interpolation=cv2.INTER_AREA).astype(np.int32)
    assert np.abs(got - want).max() <= 1


def test_cart_to_polar(rng):
    x = rng.normal(size=(64, 64)).astype(np.float32) * 3
    y = rng.normal(size=(64, 64)).astype(np.float32) * 3
    mag, ang = polarops.cart_to_polar(jnp.asarray(x), jnp.asarray(y))
    want_mag, want_ang = cv2.cartToPolar(x, y, angleInDegrees=True)
    np.testing.assert_allclose(np.asarray(mag), want_mag[..., 0] if want_mag.ndim == 3 else want_mag, rtol=1e-5, atol=1e-5)
    da = np.abs(np.asarray(ang) - (want_ang[..., 0] if want_ang.ndim == 3 else want_ang))
    da = np.minimum(da, 360 - da)
    # OpenCV's fast atan is accurate to ~0.3 deg.
    assert da.max() < 0.4


def test_hsv_to_bgr_u8(rng):
    hsv = np.stack([rng.integers(0, 180, (50, 50)),
                    rng.integers(0, 256, (50, 50)),
                    rng.integers(0, 256, (50, 50))], axis=-1).astype(np.uint8)
    got = np.asarray(colorops.hsv_to_bgr(jnp.asarray(hsv))).astype(np.int32)
    want = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR).astype(np.int32)
    assert np.abs(got - want).max() <= 1


def test_hsv_to_bgr_float(rng):
    hsv = np.stack([rng.uniform(0, 360, (40, 40)),
                    rng.uniform(0, 1, (40, 40)),
                    rng.uniform(0, 1, (40, 40))], axis=-1).astype(np.float32)
    got = np.asarray(colorops.hsv_to_bgr(jnp.asarray(hsv)))
    want = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bgr_to_hsv_u8(beach_frames):
    img = beach_frames[0]
    got = np.asarray(colorops.bgr_to_hsv(jnp.asarray(img))).astype(np.int32)
    want = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.int32)
    dh = np.abs(got[..., 0] - want[..., 0])
    dh = np.minimum(dh, 180 - dh)
    assert dh.max() <= 1
    assert np.abs(got[..., 1:] - want[..., 1:]).max() <= 1


def test_colormaps(rng):
    img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    for name, cv_id in [("jet", cv2.COLORMAP_JET), ("rainbow", cv2.COLORMAP_RAINBOW)]:
        got = np.asarray(cmap.apply_colormap(jnp.asarray(img), name))
        want = cv2.applyColorMap(img, cv_id)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ksize,sigma", [(3, 0.0), (9, 1.5), (5, 0.5), (15, 1.2)])
def test_gaussian_blur(beach_frames, ksize, sigma):
    img = cv2.cvtColor(beach_frames[0], cv2.COLOR_BGR2GRAY).astype(np.float32)
    got = np.asarray(convops.gaussian_blur(jnp.asarray(img), ksize, sigma))
    want = cv2.GaussianBlur(img, (ksize, ksize), sigma)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pyr_down(beach_frames):
    img = cv2.cvtColor(beach_frames[0], cv2.COLOR_BGR2GRAY).astype(np.float32)
    got = np.asarray(convops.pyr_down(jnp.asarray(img)))
    want = cv2.pyrDown(img)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_translate_matches_warpaffine(beach_frames):
    img = beach_frames[0]
    dx, dy = 3.7, -2.2
    got = np.asarray(warpops.translate(jnp.asarray(img), dx, dy)).astype(np.int32)
    m = np.float32([[1, 0, dx], [0, 1, dy]])
    want = cv2.warpAffine(img, m, (img.shape[1], img.shape[0])).astype(np.int32)
    # interior only (border handling differs by design: cv2 uses constant 0 too,
    # but edge interpolation rounding can differ by 1)
    assert np.abs(got[5:-5, 5:-5] - want[5:-5, 5:-5]).max() <= 1
