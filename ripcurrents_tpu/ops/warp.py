"""Bilinear sampling and warping.

Used for: flow-guided resampling inside Farneback's matrix update
(the TPU equivalent of OpenCV FarnebackUpdateMatrices' R1 lookup), LK window
gathers, particle advection (ripcurrents_module.cpp:486-679 bilinear
interpolation), and warpAffine translation compensation
(main.cpp:1740-1760 phase-correlate mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jax.Array, xs: jax.Array, ys: jax.Array,
                    border: str = "clamp") -> jax.Array:
    """Sample img (H, W[, C]) at float coords (xs, ys) of any equal shape.

    border='clamp': coordinates clamp to the edge (replicate).
    border='zero' : samples outside return 0.
    Returns shape xs.shape[ + (C,)].
    """
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[..., None] if img.ndim == 3 else (xs - x0)
    fy = (ys - y0)[..., None] if img.ndim == 3 else (ys - y0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        v = img[yc, xc]
        if border == "zero":
            inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            if img.ndim == 3:
                inb = inb[..., None]
            v = jnp.where(inb, v, 0)
        return v

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def translate(img: jax.Array, dx, dy, border: str = "zero") -> jax.Array:
    """warpAffine with pure translation [[1,0,dx],[0,1,dy]] and bilinear interp.

    Matches the reference's jitter compensation (main.cpp:1753-1755): output
    pixel (x, y) samples input at (x - dx, y - dy).
    """
    h, w = img.shape[0], img.shape[1]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    out = bilinear_sample(img.astype(jnp.float32), xs - dx, ys - dy, border=border)
    if img.dtype == jnp.uint8:
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(img.dtype)
