"""Speed classification and temporal wave accumulation.

Rewrites of create_flow (ripcurrents_module.cpp:153-182),
create_accumulationbuffer (:189-212) and create_output (:225-244), plus the
android variants (jni/ripcurrents.cpp:223-246, :264-284, :313-320). The
reference mutates shared Mats from forEach lambdas; here each step is a
pure function over the polar flow and the running accumulator.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ripcurrents_tpu.config import HistogramParams


class ClassifyResult(NamedTuple):
    display_hsv: jax.Array  # (H, W, 3) float32 HSV (deg, [0,1], [0,1]) for viz
    waterclass: jax.Array   # (H, W, 3) float32 classifier colors
    fast_mask: jax.Array    # (H, W) float32 1.0 where val > UPPER


def classify(ang: jax.Array, mag: jax.Array, upper, mid, lower, upper2d,
             p: HistogramParams = HistogramParams()) -> ClassifyResult:
    """Per-pixel classification into fast/slow motion classes.

    The HSV display uses H = angle, V = mag/UPPER2d[direction] (clipped)
    with S = 1 where saturated else 0.7, exactly as create_flow's rescale
    branch.
    """
    d = jnp.clip((ang * p.directions / 360.0).astype(jnp.int32),
                 0, p.directions - 1)
    val = mag

    fast = val > upper
    wx = jnp.where(fast, 0.5, 0.0)
    wz = jnp.where(~fast & (val > mid), 1.0,
                   jnp.where(~fast & (val > lower), 0.5, 0.0))
    wy = jnp.where(~fast & (val <= lower), 0.5, 0.0)
    waterclass = jnp.stack([wx, wy, wz], axis=-1)

    v = val / upper2d[d]
    s = jnp.where(v > 1.0, 1.0, 0.7)
    display = jnp.stack([ang, s, v], axis=-1)
    return ClassifyResult(display, waterclass, fast.astype(jnp.float32))


class AccumulatorViz(NamedTuple):
    out: jax.Array      # (H, W, 3) float32 wave-duty visualization
    outmask: jax.Array  # (H, W) uint8 255 where duty < 10% (candidate rip)


def accumulate_waves(accumulator: jax.Array, fast_mask: jax.Array,
                     framecount, warmup: int = 30) -> jax.Array:
    """accumulator += fast_mask once past the warmup frame
    (ripcurrents.cpp:414-416)."""
    return jnp.where(framecount > warmup, accumulator + fast_mask, accumulator)


def duty_cycle_viz(accumulator: jax.Array, framecount) -> AccumulatorViz:
    """Visualize accumulated wave duty and emit the low-duty mask
    (ripcurrents_module.cpp:196-211). Channel convention: x,y,z like the
    reference's Pixel3 (BGR float)."""
    val = accumulator.astype(jnp.int32).astype(jnp.float32)
    fc = jnp.asarray(framecount, jnp.float32)
    hi = val > 0.1 * fc
    mid = hi & (val < 0.2 * fc)
    out = jnp.stack([
        jnp.where(hi & ~mid, 1.0, 0.0),          # x
        jnp.where(~hi, 0.5, 0.0),                # y
        jnp.where(mid, 1.0, 0.0),                # z
    ], axis=-1)
    outmask = jnp.where(~hi, jnp.uint8(255), jnp.uint8(0))
    return AccumulatorViz(out, outmask)


def burn_mask_red(subframe_bgr_u8: jax.Array, mask_u8: jax.Array) -> jax.Array:
    """create_output (ripcurrents_module.cpp:225-244): set the red channel
    to 255 wherever the mask is nonzero."""
    red = jnp.where(mask_u8 > 0, jnp.uint8(255), subframe_bgr_u8[..., 2])
    return subframe_bgr_u8.at[..., 2].set(red)


# --- android-specific variants (jni/ripcurrents.cpp) -----------------------

def classify_android(ang: jax.Array, mag: jax.Array, upper, mid, lower):
    """jni/ripcurrents.cpp:223-246: classify + rescale val into [0,1]."""
    fast = mag > upper
    rescaled = jnp.where(fast, mag,
                         jnp.where(mag > lower,
                                   (mag - lower) / (upper - lower), 0.0))
    wx = jnp.where(fast, 0.5, 0.0)
    wz = jnp.where(~fast & (mag > mid), 1.0,
                   jnp.where(~fast & (mag > lower), 0.5, 0.0))
    wy = jnp.where(~fast & (mag <= lower), 0.5, 0.0)
    waterclass = jnp.stack([wx, wy, wz], axis=-1)
    return rescaled, waterclass, fast.astype(jnp.float32)


def android_duty_viz(accumulator: jax.Array, i) -> jax.Array:
    """jni/ripcurrents.cpp:271-284: duty fractions in three bands."""
    fi = jnp.asarray(i, jnp.float32)
    val = accumulator.astype(jnp.int32).astype(jnp.float32)
    frac = val / fi
    hi = val > 0.05 * fi
    mid = hi & (val < 0.2 * fi)
    return jnp.stack([
        jnp.where(hi & ~mid, frac, 0.0),   # x
        jnp.where(~hi, frac, 0.0),         # y
        jnp.where(mid, frac, 0.0),         # z
    ], axis=-1)


def android_local_rip(out: jax.Array, localwin: int = 20) -> jax.Array:
    """The 40x40 sliding-window co-occurrence detector
    (jni/ripcurrents.cpp:289-309): windows (stride localwin, size
    2*localwin) where both the hi-duty (z) and low-duty (y) populations
    exceed localwin^2/1.5 vote for their low-duty pixels; pixels covered by
    4 winning windows form the rip overlay.

    Returns uint8 mask where the vote count equals 4.
    """
    h, w = out.shape[0], out.shape[1]
    hi = (out[..., 2] != 0).astype(jnp.float32)
    lo = (out[..., 1] != 0).astype(jnp.float32)
    win = 2 * localwin
    thresh = localwin * localwin / 1.5

    import numpy as np
    # reference loops y < H - 2*localwin (exclusive) — static anchor grid
    ys = np.arange(0, h - win, localwin)
    xs = np.arange(0, w - win, localwin)

    def block_sums(a):
        # sum over win x win blocks anchored at stride-localwin grid points
        c = jnp.cumsum(jnp.cumsum(
            jnp.pad(a, ((1, 0), (1, 0))), axis=0), axis=1)
        return (c[ys[:, None] + win, xs[None, :] + win]
                - c[ys[:, None] + win, xs[None, :]]
                - c[ys[:, None], xs[None, :] + win]
                + c[ys[:, None], xs[None, :]])

    hisum = block_sums(hi)
    losum = block_sums(lo)
    winning = (hisum > thresh) & (losum > thresh)

    votes = jnp.zeros((h, w), jnp.float32)
    # Scatter each winning window's +1 over its block via a dilated upsample:
    win_grid = jnp.zeros((h, w), jnp.float32)
    win_grid = win_grid.at[ys[:, None], xs[None, :]].add(
        winning.astype(jnp.float32))
    # box-sum trick: votes(y,x) = number of winning anchors in
    # [y-win+1, y] x [x-win+1, x] intersected with the anchor grid
    c = jnp.cumsum(jnp.cumsum(jnp.pad(win_grid, ((win, 0), (win, 0))),
                              axis=0), axis=1)
    votes = (c[win:, win:] - c[:-win, win:] - c[win:, :-win] + c[:-win, :-win])
    mask = (votes == 4) & (lo > 0)
    return jnp.where(mask, jnp.uint8(255), jnp.uint8(0))
