"""cv2.applyColorMap equivalents (JET, RAINBOW) as LUT gathers.

LUTs are snapshots of OpenCV's 256-entry BGR tables (see
tools/gen_colormaps.py). Reference usage: ripcurrents_module.cpp:13-40
(JET over streamline displacement/distance/ratio fields) and :77 (RAINBOW
over the discrete-streamline canvas).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")
_LUTS: dict[str, np.ndarray] = {}


def _lut(name: str) -> np.ndarray:
    if name not in _LUTS:
        _LUTS[name] = np.load(os.path.join(_ASSETS, f"colormap_{name}.npy"))
    return _LUTS[name]


def apply_colormap(img_u8: jax.Array, name: str) -> jax.Array:
    """(H, W) uint8 -> (H, W, 3) uint8 BGR via the named LUT ('jet'|'rainbow')."""
    lut = jnp.asarray(_lut(name))
    return lut[img_u8.astype(jnp.int32)]


def normalize_to_u8(field: jax.Array, max_val: jax.Array | None = None) -> jax.Array:
    """convertTo(CV_8UC1, 255/max) — scale by the field max then saturate.

    Matches the reference pattern minMaxLoc + convertTo
    (ripcurrents_module.cpp:13-40).
    """
    if max_val is None:
        max_val = jnp.max(field)
    scale = 255.0 / jnp.maximum(max_val, 1e-12)
    return jnp.clip(jnp.round(field * scale), 0, 255).astype(jnp.uint8)
