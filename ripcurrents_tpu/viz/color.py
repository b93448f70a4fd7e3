"""Flow colorization and legend images.

Rewrites of vectorToColor (ripcurrents_module.cpp:1017-1057),
display_histogram's HSV wheel (:246-277) and the color-wheel legends
(ripcurrents.cpp:575-609, android jni/ripcurrents.cpp:31-70).

The reference keeps the per-frame max displacement in a function-static
float (a latent data race under forEach); here it is explicit carried
state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ripcurrents_tpu.config import HistogramParams
from ripcurrents_tpu.ops.color import hsv_to_bgr


class VectorColorOut(NamedTuple):
    bgr_u8: jax.Array            # (H, W, 3) colorized flow
    max_displacement: jax.Array  # () new running max (for the next frame)


def vector_to_color(flow: jax.Array, max_displacement_prev) -> VectorColorOut:
    """HSV encoding: H = angle/2, S = 255, V = mag * 255 / prev-frame max."""
    theta = jnp.arctan2(flow[..., 1], flow[..., 0]) * (180.0 / jnp.pi)
    theta = jnp.where(theta < 0, theta + 360.0, theta)
    mag = jnp.sqrt(jnp.sum(flow * flow, axis=-1))
    hsv = jnp.stack([
        jnp.clip(theta / 2.0, 0, 255),
        jnp.full_like(theta, 255.0),
        jnp.clip(mag * 255.0 / jnp.maximum(max_displacement_prev, 1e-6),
                 0, 255),
    ], axis=-1).astype(jnp.uint8)
    return VectorColorOut(hsv_to_bgr(hsv), jnp.maximum(jnp.max(mag), 1e-6))


def polar_to_hsv_bgr(ang_deg: jax.Array, val01: jax.Array,
                     sat01: jax.Array | None = None) -> jax.Array:
    """Generic (angle, value) -> BGR u8 via float HSV, S defaulting to 1."""
    s = jnp.ones_like(val01) if sat01 is None else sat01
    hsv = jnp.stack([ang_deg, s, jnp.clip(val01, 0.0, 1.0)], axis=-1)
    bgr = hsv_to_bgr(hsv.astype(jnp.float32))
    return jnp.clip(jnp.round(bgr * 255.0), 0, 255).astype(jnp.uint8)


def histogram_wheel(upper2d: jax.Array, prop_above_upper: jax.Array,
                    p: HistogramParams = HistogramParams(),
                    size: int = 480) -> jax.Array:
    """display_histogram (ripcurrents_module.cpp:246-277): a polar wheel
    where S=0 beyond each direction's UPPER2d radius and V=0 beyond
    prop_above_upper*10."""
    c = size / 2.0
    ys, xs = jnp.meshgrid(jnp.arange(size, dtype=jnp.float32),
                          jnp.arange(size, dtype=jnp.float32), indexing="ij")
    tx = (xs - c) / c
    ty = (ys - c) / c
    theta = jnp.arctan2(ty, tx) * (180.0 / jnp.pi)
    theta = jnp.where(theta < 0, theta + 360.0, theta)
    r = jnp.sqrt(tx * tx + ty * ty)
    d = jnp.clip((theta * p.directions / 360.0).astype(jnp.int32),
                 0, p.directions - 1)
    hue = d.astype(jnp.float32) * (360.0 / p.directions)
    s = jnp.where(r > upper2d[d] * p.resolution / p.bins, 0.0, 1.0)
    v = jnp.where(r > prop_above_upper[d] * 10.0, 0.0, 1.0)
    hsv = jnp.stack([hue, s, v], axis=-1)
    bgr = hsv_to_bgr(hsv)
    return jnp.clip(jnp.round(bgr * 255.0), 0, 255).astype(jnp.uint8)


def shear_color_chart(height: int = 40, width: int = 256) -> jax.Array:
    """Legend bar for the shearRate mode: the hue ramp of
    analysis/shear.shear_to_color (hue 128 at zero shear down to 0 at the
    running max, S=V=255), left-to-right increasing shear. The reference
    overlays an external colorChart.jpg asset here (main.cpp:1458-1462)
    that is not committed to its repo; this synthesizes the equivalent
    chart from the actual hue mapping so the legend always matches the
    colorization."""
    xs = jnp.linspace(0.0, 1.0, width, dtype=jnp.float32)
    # OpenCV 8-bit hue is 0..180 degrees-over-2; shear_to_color writes
    # hue bytes directly, so convert byte-hue -> degrees for hsv_to_bgr.
    hue = (128.0 - 128.0 * xs) * 2.0
    hsv = jnp.stack([jnp.broadcast_to(hue, (height, width)),
                     jnp.ones((height, width), jnp.float32),
                     jnp.ones((height, width), jnp.float32)], axis=-1)
    bgr = hsv_to_bgr(hsv)
    return jnp.clip(jnp.round(bgr * 255.0), 0, 255).astype(jnp.uint8)


def color_wheel(size: int = 480, directions: int = 36) -> jax.Array:
    """The android legend wheel (jni/ripcurrents.cpp:31-70): hue quantized
    to `directions` sectors, S = radius, V = 1 inside the unit disc."""
    c = size / 2.0
    ys, xs = jnp.meshgrid(jnp.arange(size, dtype=jnp.float32),
                          jnp.arange(size, dtype=jnp.float32), indexing="ij")
    tx = (xs - c) / size
    ty = (ys - c) / size
    theta = jnp.arctan2(ty, tx) * (180.0 / jnp.pi)
    theta = jnp.where(theta < 0, theta + 360.0, theta)
    bin_ = jnp.clip((theta / 360.0 * directions).astype(jnp.int32),
                    0, directions - 1)
    d = jnp.sqrt(tx * tx + ty * ty)
    # 360/directions degrees per sector (= the reference's hard-coded
    # *10 at its fixed 36 directions)
    hue = bin_.astype(jnp.float32) * (360.0 / directions)
    s = jnp.where(d > 1.0, 0.0, d)
    v = jnp.where(d > 1.0, 0.0, 1.0)
    hsv = jnp.stack([hue, s, v], axis=-1)
    bgr = hsv_to_bgr(hsv)
    return jnp.clip(jnp.round(bgr * 255.0), 0, 255).astype(jnp.uint8)
