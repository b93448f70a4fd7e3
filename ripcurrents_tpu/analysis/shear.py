"""Shear-rate (velocity-gradient) analysis.

Rewrite of shearRateToColor (ripcurrents_module.cpp:1059-1138): central
differences of the flow field at +-offset give the 2x2 velocity-gradient
Jacobian; its Frobenius norm drives the hue.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def shear_frobenius(flow: jax.Array, offset: int = 10) -> jax.Array:
    """(H, W) Frobenius norm of [[dvx/dx, dvx/dy], [dvy/dx, dvy/dy]] computed
    as right-left / above-below differences at +-offset (not normalized by
    2*offset — faithful to the reference)."""
    right = jnp.roll(flow, -offset, axis=1)
    left = jnp.roll(flow, offset, axis=1)
    above = jnp.roll(flow, offset, axis=0)   # row - offset
    below = jnp.roll(flow, -offset, axis=0)  # row + offset
    j00 = right[..., 0] - left[..., 0]
    j01 = above[..., 0] - below[..., 0]
    j10 = right[..., 1] - left[..., 1]
    j11 = above[..., 1] - below[..., 1]
    fn = jnp.sqrt(j00 ** 2 + j01 ** 2 + j10 ** 2 + j11 ** 2)
    # The reference only fills the interior (offset-margin) region.
    h, w = fn.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = ((ys >= offset) & (ys < h - offset) &
                (xs >= offset) & (xs < w - offset))
    return jnp.where(interior, fn, 0.0)


class ShearColorOut(NamedTuple):
    hsv_u8: jax.Array       # (H, W, 3) uint8, H = 128 - fn*128/max_prev
    max_frobenius: jax.Array  # () new running max for the next frame


def shear_to_color(flow: jax.Array, max_frobenius_prev,
                   offset: int = 10) -> ShearColorOut:
    fn = shear_frobenius(flow, offset)
    hue = 128.0 - fn * 128.0 / jnp.maximum(max_frobenius_prev, 1e-6)
    hsv = jnp.stack([jnp.clip(hue, 0, 255),
                     jnp.full_like(hue, 255.0),
                     jnp.full_like(hue, 255.0)], axis=-1).astype(jnp.uint8)
    return ShearColorOut(hsv, jnp.maximum(jnp.max(fn), 1e-6))
