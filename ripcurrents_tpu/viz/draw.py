"""Functional rasterization of overlay primitives (lines, circles, arrows,
text) onto device images.

The reference draws with cv::line / cv::circle / cv::arrowedLine /
cv::putText on host Mats between device ops, forcing round-trips. Here
drawing is a scatter program that stays on device: segments are sampled at
a static number of points and scattered with thickness offsets. Rendering
is visually equivalent to OpenCV's 8-connected rasterizer, not bit-equal
(documented deviation — shapes land on the same pixels to within the
rasterization rule).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

def _seg_samples(h: int, w: int) -> int:
    """Static samples per segment: a fully-visible segment's major-axis
    (Chebyshev) length is at most max(h, w), so max(h, w) + 1 samples
    step <= 1 px along the major axis — contiguous like cv::line's
    8-connected raster. Segments with far off-screen endpoints spread
    their samples over the hidden part too and may thin out on-screen
    (pre-existing, documented deviation)."""
    return max(512, max(h, w) + 1)


@functools.lru_cache(maxsize=16)
def _thickness_offsets(thickness: int) -> np.ndarray:
    """Integer offsets of a disc of diameter `thickness` (1 -> single px)."""
    r = max((thickness - 1) / 2.0, 0.0)
    n = int(np.ceil(r))
    offs = [(dy, dx) for dy in range(-n, n + 1) for dx in range(-n, n + 1)
            if dy * dy + dx * dx <= max(r * r, 0.25)]
    return np.array(offs, np.int32)


@functools.lru_cache(maxsize=32)
def _disc_offsets(radius: int) -> np.ndarray:
    offs = [(dy, dx) for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)
            if dy * dy + dx * dx <= radius * radius]
    return np.array(offs, np.int32)


def _scatter_points(img: jax.Array, ys: jax.Array, xs: jax.Array,
                    valid: jax.Array, color) -> jax.Array:
    """Set img[y, x] = color for valid points (ys/xs int32, any shape).

    Invalid/out-of-bounds points are routed to a sentinel row BELOW the
    image (cropped after the scatter). Routing them to a real pixel and
    re-setting its old value would race a genuine draw at that pixel —
    duplicate-index .at[].set picks an unspecified winner."""
    h, w = img.shape[0], img.shape[1]
    inb = valid & (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
    yc = jnp.where(inb, ys, h).reshape(-1)
    xc = jnp.where(inb, jnp.clip(xs, 0, w - 1), 0).reshape(-1)
    color = jnp.asarray(color, img.dtype)
    padded = jnp.concatenate(
        [img, jnp.zeros((1,) + img.shape[1:], img.dtype)], axis=0)
    if img.ndim == 3:
        upd = jnp.broadcast_to(color[None, :], (yc.shape[0],
                                                img.shape[2]))
    else:
        upd = jnp.broadcast_to(color, yc.shape)
    return padded.at[yc, xc].set(upd)[:h]


def draw_segments(img: jax.Array, p0: jax.Array, p1: jax.Array,
                  valid: jax.Array, color, thickness: int = 1) -> jax.Array:
    """Draw N segments p0[i] -> p1[i] ((N, 2) (x, y) float) where valid[i]."""
    t = jnp.linspace(0.0, 1.0,
                     _seg_samples(img.shape[0], img.shape[1]))[None, :, None]
    pts = p0[:, None, :] * (1 - t) + p1[:, None, :] * t      # (N, S, 2)
    xs = jnp.round(pts[..., 0]).astype(jnp.int32)
    ys = jnp.round(pts[..., 1]).astype(jnp.int32)
    v = jnp.broadcast_to(valid[:, None], xs.shape)
    for dy, dx in _thickness_offsets(thickness):
        img = _scatter_points(img, ys + int(dy), xs + int(dx), v, color)
    return img


def draw_polyline(img: jax.Array, pts: jax.Array, color,
                  thickness: int = 1,
                  valid: jax.Array | None = None) -> jax.Array:
    """Connect consecutive points of pts (N, 2); segment i is drawn when
    both endpoints are valid."""
    if valid is None:
        valid = jnp.ones(pts.shape[0], bool)
    segv = valid[:-1] & valid[1:]
    return draw_segments(img, pts[:-1], pts[1:], segv, color, thickness)


def draw_circles(img: jax.Array, centers: jax.Array, radius: int, color,
                 valid: jax.Array | None = None) -> jax.Array:
    """Filled circles at centers (N, 2) (x, y)."""
    if valid is None:
        valid = jnp.ones(centers.shape[0], bool)
    cx = jnp.round(centers[:, 0]).astype(jnp.int32)
    cy = jnp.round(centers[:, 1]).astype(jnp.int32)
    offs = _disc_offsets(radius)
    ys = cy[:, None] + jnp.asarray(offs[:, 0])[None, :]
    xs = cx[:, None] + jnp.asarray(offs[:, 1])[None, :]
    v = jnp.broadcast_to(valid[:, None], ys.shape)
    return _scatter_points(img, ys, xs, v, color)


def draw_arrows(img: jax.Array, starts: jax.Array, ends: jax.Array,
                valid: jax.Array, color, thickness: int = 1,
                tip_frac: float = 0.4) -> jax.Array:
    """cv::arrowedLine equivalent: shaft + two tip barbs at 45 degrees."""
    img = draw_segments(img, starts, ends, valid, color, thickness)
    d = ends - starts
    length = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    tip = length * tip_frac
    ang = jnp.arctan2(d[:, 1], d[:, 0])
    for s in (jnp.pi / 4, -jnp.pi / 4):
        barb = ends - tip * jnp.stack([jnp.cos(ang + s), jnp.sin(ang + s)],
                                      axis=-1)
        img = draw_segments(img, ends, barb, valid, color, thickness)
    return img


def blend(a_u8: jax.Array, b_u8: jax.Array, alpha: float,
          beta: float) -> jax.Array:
    """cv::addWeighted(a, alpha, b, beta, 0)."""
    out = a_u8.astype(jnp.float32) * alpha + b_u8.astype(jnp.float32) * beta
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def paste(img: jax.Array, patch: jax.Array, y: int, x: int) -> jax.Array:
    """Copy `patch` into img at (y, x) — the warpAffine legend placement
    (main.cpp:1161-1162)."""
    return jax.lax.dynamic_update_slice(
        img, patch.astype(img.dtype), (y, x, 0) if img.ndim == 3 else (y, x))


# --- minimal 5x7 digit font for drawFrameCount ------------------------------

_DIGITS = [
    "111101101101111", "010110010010111", "111001111100111",
    "111001111001111", "101101111001001", "111100111001111",
    "111100111101111", "111001001001001", "111101111101111",
    "111101111001111",
]


@functools.lru_cache(maxsize=1)
def _digit_masks() -> np.ndarray:
    m = np.zeros((10, 5, 3), np.uint8)
    for d, s in enumerate(_DIGITS):
        m[d] = np.array([int(c) for c in s], np.uint8).reshape(5, 3)
    return m


def draw_frame_count(img: jax.Array, framecount, pos=(30, 30),
                     scale: int = 2, color=(250, 250, 250)) -> jax.Array:
    """drawFrameCount (ripcurrents_module.cpp:1198-1201): the frame number
    as light text near (30, 30). Bitmap digits instead of Hershey fonts."""
    masks = jnp.asarray(np.kron(_digit_masks(),
                                np.ones((scale, scale), np.uint8)))
    fc = jnp.asarray(framecount, jnp.int32)
    digits = jnp.stack([(fc // 10000) % 10, (fc // 1000) % 10,
                        (fc // 100) % 10, (fc // 10) % 10, fc % 10])
    shown = jnp.concatenate([
        jnp.array([fc >= 10000, fc >= 1000, fc >= 100, fc >= 10]),
        jnp.array([True])])
    x0, y0 = pos
    dh, dw = 5 * scale, 3 * scale
    for i in range(5):
        tile = masks[digits[i]]
        ys = jnp.arange(dh)[:, None] + y0
        xs = jnp.arange(dw)[None, :] + x0 + i * (dw + scale)
        on = (tile > 0) & shown[i]
        img = _scatter_points(img, jnp.broadcast_to(ys, (dh, dw)),
                              jnp.broadcast_to(xs, (dh, dw)), on, color)
    return img
