"""Separable correlation/blur primitives with OpenCV border semantics.

These are the stencil building blocks of the Farneback engine (Gaussian
pre-smoothing per pyramid level, polynomial expansion, matrix smoothing)
and of pyrDown in the LK pyramid. On TPU, XLA lowers the separable
formulation to MXU-backed convolutions and fuses the elementwise tails.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# OpenCV getGaussianKernel's fixed small kernels, used when sigma <= 0
# (cv::getGaussianKernel small_gaussian_tab).
_SMALL_GAUSSIAN = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125]),
}


@functools.lru_cache(maxsize=64)
def gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    """1-D Gaussian kernel matching cv::getGaussianKernel (float64, sums to 1)."""
    if sigma <= 0 and ksize in _SMALL_GAUSSIAN:
        return _SMALL_GAUSSIAN[ksize]
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def pad2d(img: jax.Array, top: int, bottom: int, left: int, right: int,
          border: str) -> jax.Array:
    """Pad the two leading spatial dims. border: 'replicate' | 'reflect101' | 'constant'."""
    mode = {"replicate": "edge", "reflect101": "reflect", "constant": "constant"}[border]
    pads = [(top, bottom), (left, right)] + [(0, 0)] * (img.ndim - 2)
    return jnp.pad(img, pads, mode=mode)


def sep_filter2d(img: jax.Array, ky, kx, border: str = "reflect101") -> jax.Array:
    """Separable correlation on the two leading dims of (H, W) or (H, W, C).

    Matches cv2.sepFilter2D / GaussianBlur with the given border type.
    Computed via two 1-D correlations expressed as dot-generals so XLA can
    tile them onto the MXU for wide kernels.
    """
    ky = jnp.asarray(ky, dtype=img.dtype)
    kx = jnp.asarray(kx, dtype=img.dtype)
    ry, rx = (ky.shape[0] - 1) // 2, (kx.shape[0] - 1) // 2
    x = pad2d(img, ry, ry, rx, rx, border)
    x = _corr1d(x, ky, axis=0)
    x = _corr1d(x, kx, axis=1)
    return x


def _corr1d(img: jax.Array, k: jax.Array, axis: int) -> jax.Array:
    """Valid 1-D correlation along `axis` of an (H, W[, C]) array."""
    n = k.shape[0]
    out_len = img.shape[axis] - n + 1
    # Sum of shifted slices: for small n this fuses into one loop nest; for
    # large n XLA turns the stack into an implicit conv.
    acc = None
    for i in range(n):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(i, i + out_len)
        term = img[tuple(sl)] * k[i]
        acc = term if acc is None else acc + term
    return acc


def gaussian_blur(img: jax.Array, ksize: int, sigma: float,
                  border: str = "reflect101") -> jax.Array:
    """cv2.GaussianBlur(img, (ksize, ksize), sigma) with default border."""
    k = jnp.asarray(gaussian_kernel(ksize, sigma), dtype=img.dtype)
    return sep_filter2d(img, k, k, border)


def box_blur(img: jax.Array, ksize: int, border: str = "replicate",
             normalize: bool = True) -> jax.Array:
    """ksize x ksize box filter (cv2.blur semantics with replicate border)."""
    k = jnp.full((ksize,), 1.0 / ksize if normalize else 1.0, dtype=img.dtype)
    return sep_filter2d(img, k, k, border)


def pyr_down(img: jax.Array) -> jax.Array:
    """cv2.pyrDown: blur with [1,4,6,4,1]/16 (reflect101) then take even pixels.

    Output size is ((H+1)//2, (W+1)//2), as in OpenCV.
    """
    k = jnp.asarray(np.array([1, 4, 6, 4, 1], np.float64) / 16.0, dtype=img.dtype)
    x = sep_filter2d(img, k, k, border="reflect101")
    return x[::2, ::2]
