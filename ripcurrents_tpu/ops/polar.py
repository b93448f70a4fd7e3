"""Cartesian <-> polar conversion for flow fields.

Reference: cv::cartToPolar(..., angleInDegrees=true) at ripcurrents.cpp:305-309
and the android path jni/ripcurrents.cpp:186-188. OpenCV's atan uses a fast
polynomial (~0.3 deg max error); we use exact atan2, which is at least as
accurate and fully fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cart_to_polar(x: jax.Array, y: jax.Array, degrees: bool = True):
    """Return (magnitude, angle) with angle in [0, 360) degrees (or radians)."""
    mag = jnp.sqrt(x * x + y * y)
    ang = jnp.arctan2(y, x)
    if degrees:
        ang = ang * (180.0 / jnp.pi)
        ang = jnp.where(ang < 0, ang + 360.0, ang)
    else:
        ang = jnp.where(ang < 0, ang + 2 * jnp.pi, ang)
    return mag, ang


def polar_to_cart(mag: jax.Array, ang: jax.Array, degrees: bool = True):
    if degrees:
        ang = ang * (jnp.pi / 180.0)
    return mag * jnp.cos(ang), mag * jnp.sin(ang)


def flow_to_polar(flow: jax.Array, degrees: bool = True):
    """(H, W, 2) flow -> (mag, ang). Channel 0 is dx, channel 1 is dy."""
    return cart_to_polar(flow[..., 0], flow[..., 1], degrees)
