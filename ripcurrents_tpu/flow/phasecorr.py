"""FFT phase correlation for translation estimation.

Rewrite of the cv::phaseCorrelate path in compute_phaseCorrelate
(main.cpp:1684-1775): Hann-windowed cross-power spectrum over a beach ROI,
inverse FFT peak with 5x5 weighted-centroid sub-pixel refinement. All
XLA-native (jnp.fft) — this is the jitter stabilizer that stays entirely
on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def hanning_window(h: int, w: int) -> jax.Array:
    """cv2.createHanningWindow: separable sin(pi*i/(N-1)) taper (the square
    root of a Hann window per axis, so the two windowed inputs multiply to a
    true Hann in the correlation)."""
    wy = jnp.sin(jnp.pi * jnp.arange(h) / (h - 1))
    wx = jnp.sin(jnp.pi * jnp.arange(w) / (w - 1))
    return (wy[:, None] * wx[None, :]).astype(jnp.float32)


class PhaseCorrelateOut(NamedTuple):
    shift: jax.Array     # (2,) (dx, dy): translation of src2 relative to src1
    response: jax.Array  # () peak response in [0, 1]


def phase_correlate(src1: jax.Array, src2: jax.Array,
                    window: jax.Array | None = None) -> PhaseCorrelateOut:
    """cv2.phaseCorrelate(src1, src2, window) equivalent."""
    a = src1.astype(jnp.float32)
    b = src2.astype(jnp.float32)
    if window is not None:
        a = a * window
        b = b * window
    fa = jnp.fft.fft2(a)
    fb = jnp.fft.fft2(b)
    cross = jnp.conj(fa) * fb
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-20)
    corr = jnp.real(jnp.fft.ifft2(cross))

    h, w = corr.shape
    idx = jnp.argmax(corr)
    py = idx // w
    px = idx % w

    # 5x5 weighted centroid around the peak (cv::weightedCentroid).
    oy = jnp.arange(-2, 3)
    ox = jnp.arange(-2, 3)
    yy = (py + oy[:, None]) % h
    xx = (px + ox[None, :]) % w
    vals = jnp.maximum(corr[yy, xx], 0.0)
    total = jnp.maximum(jnp.sum(vals), 1e-20)
    # centroid in unwrapped coordinates around the peak
    cy = jnp.sum(vals * (py + oy[:, None])) / total
    cx = jnp.sum(vals * (px + ox[None, :])) / total

    # wrap shifts greater than half the frame to negative displacements
    cx = jnp.where(cx > w / 2.0, cx - w, cx)
    cy = jnp.where(cy > h / 2.0, cy - h, cy)

    response = corr[py, px]
    return PhaseCorrelateOut(jnp.stack([cx, cy]), response)
