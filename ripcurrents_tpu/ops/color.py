"""Color-space conversions with OpenCV-matching semantics.

Used by every visualization in the reference: HSV->BGR on float images
(display_histogram, wheel: ripcurrents_module.cpp:246-277,
ripcurrents.cpp:575-609) and on uint8 images (vectorToColor:
ripcurrents_module.cpp:1017-1057; averageVector:386-484), plus
RGB2HSV/HSV2RGB in compute_brightColor (main.cpp:1265-1382).

Conventions (match cv2):
- float images: H in degrees [0, 360), S and V in [0, 1].
- uint8 images: H in [0, 180), S and V in [0, 255].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hsv_to_bgr(hsv: jax.Array) -> jax.Array:
    """(..., 3) HSV -> BGR. Accepts float (H in deg) or uint8 (H in [0,180))."""
    if hsv.dtype == jnp.uint8:
        h = hsv[..., 0].astype(jnp.float32) * 2.0
        s = hsv[..., 1].astype(jnp.float32) / 255.0
        v = hsv[..., 2].astype(jnp.float32) / 255.0
        rgb = _hsv_to_rgb_float(h, s, v)
        bgr = jnp.stack([rgb[2], rgb[1], rgb[0]], axis=-1)
        return jnp.clip(jnp.round(bgr * 255.0), 0, 255).astype(jnp.uint8)
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    r, g, b = _hsv_to_rgb_float(h, s, v)
    return jnp.stack([b, g, r], axis=-1)


def hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    return hsv_to_bgr(hsv)[..., ::-1]


def _hsv_to_rgb_float(h, s, v):
    """OpenCV HSV2RGB on float values: h degrees, s/v in [0,1]."""
    h = (h / 60.0) % 6.0
    sector = jnp.floor(h).astype(jnp.int32)
    f = h - sector
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    # sector table: r,g,b per sector
    r = jnp.select([sector == 0, sector == 1, sector == 2,
                    sector == 3, sector == 4], [v, q, p, p, t], v)
    g = jnp.select([sector == 0, sector == 1, sector == 2,
                    sector == 3, sector == 4], [t, v, v, q, p], p)
    b = jnp.select([sector == 0, sector == 1, sector == 2,
                    sector == 3, sector == 4], [p, p, t, v, v], q)
    return r, g, b


def bgr_to_hsv(img: jax.Array) -> jax.Array:
    """(..., 3) BGR -> HSV matching cv2 ranges (see module docstring)."""
    return _to_hsv(img, order="bgr")


def rgb_to_hsv(img: jax.Array) -> jax.Array:
    return _to_hsv(img, order="rgb")


def _to_hsv(img: jax.Array, order: str) -> jax.Array:
    is_u8 = img.dtype == jnp.uint8
    x = img.astype(jnp.float32)
    if is_u8:
        x = x / 255.0
    if order == "bgr":
        b, g, r = x[..., 0], x[..., 1], x[..., 2]
    else:
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    s = jnp.where(v > 0, c / jnp.maximum(v, 1e-20), 0.0)
    safe_c = jnp.maximum(c, 1e-20)
    h = jnp.where(
        c == 0, 0.0,
        jnp.where(v == r, 60.0 * (g - b) / safe_c,
                  jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe_c,
                            240.0 + 60.0 * (r - g) / safe_c)))
    h = jnp.where(h < 0, h + 360.0, h)
    if is_u8:
        out = jnp.stack([h / 2.0, s * 255.0, v * 255.0], axis=-1)
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return jnp.stack([h, s, v], axis=-1)
