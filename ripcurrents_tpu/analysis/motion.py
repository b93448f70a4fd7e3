"""Motion-history (motempl) global orientation.

Rewrite of globalOrientation (ripcurrents_module.cpp:319-359), which uses
OpenCV-contrib's motempl trio updateMotionHistory / calcMotionGradient /
calcGlobalOrientation on abs-diff silhouettes. Implemented directly in jnp:

- motion history: timestamped decay buffer,
- gradient: Sobel 3x3 orientation of the history surface with validity mask
  (delta bounds on the local min/max spread, as motempl does),
- global orientation: 12-bin orientation histogram vote + recency-weighted
  circular mean around the dominant bin.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ripcurrents_tpu.ops.conv import sep_filter2d


def update_motion_history(mhi: jax.Array, silhouette: jax.Array,
                          timestamp, duration) -> jax.Array:
    """motempl::updateMotionHistory: stamp moving pixels with `timestamp`,
    zero stale ones (older than timestamp - duration)."""
    ts = jnp.asarray(timestamp, jnp.float32)
    mhi = jnp.where(silhouette > 0, ts, mhi)
    return jnp.where((silhouette <= 0) & (mhi < ts - duration), 0.0, mhi)


class MotionGradient(NamedTuple):
    orientation_deg: jax.Array  # (H, W) in [0, 360)
    mask: jax.Array             # (H, W) bool valid gradient


def motion_gradient(mhi: jax.Array, delta1: float, delta2: float,
                    aperture: int = 3) -> MotionGradient:
    """motempl::calcMotionGradient with Sobel aperture 3."""
    sob_smooth = jnp.asarray([1.0, 2.0, 1.0], jnp.float32)
    sob_diff = jnp.asarray([-1.0, 0.0, 1.0], jnp.float32)
    dx = sep_filter2d(mhi, sob_smooth, sob_diff, border="replicate")
    dy = sep_filter2d(mhi, sob_diff, sob_smooth, border="replicate")
    orient = jnp.arctan2(dy, dx) * (180.0 / jnp.pi)
    orient = jnp.where(orient < 0, orient + 360.0, orient)

    # local min/max over the aperture window (erode/dilate)
    r = aperture // 2
    pad_lo = jnp.pad(mhi, r, mode="edge")
    mn = mx = None
    for dy_ in range(aperture):
        for dx_ in range(aperture):
            s = pad_lo[dy_:dy_ + mhi.shape[0], dx_:dx_ + mhi.shape[1]]
            mn = s if mn is None else jnp.minimum(mn, s)
            mx = s if mx is None else jnp.maximum(mx, s)
    d1, d2 = min(delta1, delta2), max(delta1, delta2)
    spread = mx - mn
    mask = (spread >= d1) & (spread <= d2) & \
           ((jnp.abs(dx) > 1e-6) | (jnp.abs(dy) > 1e-6))
    return MotionGradient(orient, mask)


def global_orientation(orientation_deg: jax.Array, mask: jax.Array,
                       mhi: jax.Array, timestamp, duration) -> jax.Array:
    """motempl::calcGlobalOrientation: histogram vote (12 bins) for the base
    orientation, then recency-weighted mean deviation around it."""
    hist_size = 12
    bins = jnp.clip((orientation_deg * hist_size / 360.0).astype(jnp.int32),
                    0, hist_size - 1)
    m = mask & (mhi > 0)
    counts = jnp.zeros(hist_size, jnp.float32).at[
        jnp.where(m, bins, hist_size - 1).reshape(-1)
    ].add(m.astype(jnp.float32).reshape(-1))
    base = jnp.argmax(counts).astype(jnp.float32) * (360.0 / hist_size)

    ts = jnp.asarray(timestamp, jnp.float32)
    w = jnp.where(m, (mhi - (ts - duration)) / duration, 0.0)
    w = jnp.clip(w, 0.0, 1.0)
    rel = orientation_deg - base
    rel = jnp.where(rel < -180.0, rel + 360.0,
                    jnp.where(rel > 180.0, rel - 360.0, rel))
    shift = jnp.sum(w * rel) / jnp.maximum(jnp.sum(w), 1e-6)
    ang = base + shift
    return jnp.where(ang < 0, ang + 360.0, jnp.where(ang >= 360.0, ang - 360.0, ang))


class GlobalOrientationOut(NamedTuple):
    mhi_norm: jax.Array     # (H, W) normalized motion history for display
    angle_deg: jax.Array    # () global motion direction
    orientation: MotionGradient


def global_orientation_step(prev_gray_u8: jax.Array, cur_gray_u8: jax.Array,
                            timestamp: float = 1.0) -> GlobalOrientationOut:
    """The full globalOrientation pipeline on one frame pair
    (ripcurrents_module.cpp:319-337): abs-diff -> threshold 30 -> motion
    history -> normalize -> gradient(0.25, 1) -> global angle."""
    diff = jnp.abs(cur_gray_u8.astype(jnp.int32) -
                   prev_gray_u8.astype(jnp.int32))
    sil = (diff > 30).astype(jnp.float32)
    mhi = update_motion_history(jnp.zeros_like(sil), sil, timestamp, 1.0)
    mx = jnp.maximum(jnp.max(mhi), 1e-6)
    mhi_n = mhi / mx
    grad = motion_gradient(mhi_n, 0.25, 1.0, 3)
    ang = global_orientation(grad.orientation_deg, grad.mask, mhi_n,
                             timestamp, 1.0)
    return GlobalOrientationOut(mhi_n, ang, grad)
