"""Binary/grayscale morphology as max/min stencils.

Rewrite of create_edges (ripcurrents_module.cpp:216-220): 5x5 elliptical
dilation followed by a morphological gradient (dilation - erosion). On TPU
these are reduce-window ops that XLA fuses; no host round-trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def ellipse_kernel(h: int, w: int) -> np.ndarray:
    """cv2.getStructuringElement(MORPH_ELLIPSE, (w, h)) as a bool mask.

    Replicates OpenCV's scanline ellipse fill: for each row, the inscribed
    ellipse's horizontal extent is computed from the integer ellipse equation.
    """
    r, c = h // 2, w // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    mask = np.zeros((h, w), bool)
    for i in range(h):
        j = i - r
        if abs(j) <= r:
            if r > 0:
                dx = int(round(c * np.sqrt(max(0.0, 1.0 - j * j * inv_r2))))
            else:
                dx = c
            x1, x2 = max(c - dx, 0), min(c + dx, w - 1)
            mask[i, x1:x2 + 1] = True
    return mask


def _morph(img: jax.Array, kernel: np.ndarray, op: str) -> jax.Array:
    """Dilate/erode (H, W) by a flat structuring element."""
    kh, kw = kernel.shape
    ry, rx = kh // 2, kw // 2
    if img.dtype == jnp.uint8:
        lo, hi = jnp.uint8(0), jnp.uint8(255)
    else:
        lo, hi = -jnp.inf, jnp.inf
    pad_val = lo if op == "max" else hi
    x = jnp.pad(img, ((ry, ry), (rx, rx)), constant_values=pad_val)
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            if not kernel[dy, dx]:
                continue
            sl = x[dy:dy + img.shape[0], dx:dx + img.shape[1]]
            if acc is None:
                acc = sl
            else:
                acc = jnp.maximum(acc, sl) if op == "max" else jnp.minimum(acc, sl)
    return acc


def dilate(img: jax.Array, kernel: np.ndarray) -> jax.Array:
    return _morph(img, kernel, "max")


def erode(img: jax.Array, kernel: np.ndarray) -> jax.Array:
    return _morph(img, kernel, "min")


def morph_gradient(img: jax.Array, kernel: np.ndarray) -> jax.Array:
    """cv2.morphologyEx op #4: dilation - erosion."""
    return dilate(img, kernel) - erode(img, kernel)


def rip_edges(mask_u8: jax.Array) -> jax.Array:
    """create_edges (ripcurrents_module.cpp:216-220): dilate 5x5 ellipse,
    then morphological gradient with the same element."""
    k = ellipse_kernel(5, 5)
    d = dilate(mask_u8, k)
    return morph_gradient(d, k)
