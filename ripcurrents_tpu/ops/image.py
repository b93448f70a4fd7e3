"""Image preparation ops: resize and grayscale, with OpenCV-matching semantics.

The reference preps every frame with
    resize(frame, ..., INTER_LINEAR or INTER_AREA); cvtColor(..., COLOR_BGR2GRAY)
(e.g. RipCurrents_main/main.cpp:142-144, ripcurrents.cpp:209-213). These run
per frame at full rate, so they are implemented as jit-able XLA ops rather
than host code: a separable gather formulation for resize (bilinear weights
are fixed per output size, so XLA folds them into two small matmuls that run
on the MXU) and a fused weighted sum for grayscale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def bgr_to_gray(img: jax.Array) -> jax.Array:
    """BGR (H, W, 3) -> gray (H, W), matching cv2.cvtColor(COLOR_BGR2GRAY).

    For uint8 input, replicates OpenCV's fixed-point arithmetic exactly:
    gray = (B*1868 + G*9617 + R*4899 + (1<<13)) >> 14.
    For float input uses the same coefficients in float.
    """
    if img.dtype == jnp.uint8:
        i = img.astype(jnp.int32)
        acc = i[..., 0] * 1868 + i[..., 1] * 9617 + i[..., 2] * 4899
        return ((acc + (1 << 13)) >> 14).astype(jnp.uint8)
    w = jnp.array([0.114, 0.587, 0.299], dtype=img.dtype)
    return img @ w


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """RGB variant of :func:`bgr_to_gray`."""
    return bgr_to_gray(img[..., ::-1])


@functools.lru_cache(maxsize=64)
def _linear_weights(src: int, dst: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-output-pixel source indices + bilinear weights for one axis.

    Uses OpenCV/standard half-pixel-center convention:
    src_x = (dst_x + 0.5) * src/dst - 0.5, clamped to the valid range.
    Returns (idx (dst, 2) int32, w (dst, 2) float32).
    """
    scale = src / dst
    x = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(np.int64)
    frac = x - x0
    # Clamp like OpenCV: coordinates outside borders replicate the edge.
    frac = np.where(x0 < 0, 0.0, frac)
    x0c = np.clip(x0, 0, src - 1)
    x1c = np.clip(x0 + 1, 0, src - 1)
    idx = np.stack([x0c, x1c], axis=-1).astype(np.int32)
    w = np.stack([1.0 - frac, frac], axis=-1).astype(np.float32)
    return idx, w


@functools.lru_cache(maxsize=64)
def _area_weights(src: int, dst: int) -> tuple[np.ndarray, np.ndarray]:
    """INTER_AREA (downscale) indices/weights for one axis.

    Each output pixel averages the source interval [x*scale, (x+1)*scale)
    with fractional end-cells weighted by coverage — OpenCV's non-integer
    INTER_AREA decimation. Returns (idx (dst, K), w (dst, K)); rows are
    zero-padded to the common max tap count K.
    """
    scale = src / dst
    if scale < 1.0:  # upscale: OpenCV INTER_AREA falls back to bilinear-like
        return _linear_weights(src, dst)
    rows_idx, rows_w = [], []
    for x in range(dst):
        a, b = x * scale, (x + 1) * scale
        i0, i1 = int(np.floor(a)), int(np.ceil(b))
        idx, w = [], []
        for i in range(i0, min(i1, src)):
            cover = min(b, i + 1) - max(a, i)
            if cover > 1e-9:
                idx.append(i)
                w.append(cover / scale)
        rows_idx.append(idx)
        rows_w.append(w)
    k = max(len(r) for r in rows_idx)
    idx = np.zeros((dst, k), np.int32)
    w = np.zeros((dst, k), np.float32)
    for x, (ri, rw) in enumerate(zip(rows_idx, rows_w)):
        idx[x, : len(ri)] = ri
        w[x, : len(rw)] = rw
    return idx, w


@functools.lru_cache(maxsize=128)
def _resize_matrix(src: int, dst: int, idx_b: bytes, w_b: bytes,
                   taps: int) -> np.ndarray:
    """(src, dst) resize matrix from per-output-pixel (idx, w) taps."""
    idx = np.frombuffer(idx_b, np.int32).reshape(dst, taps)
    w = np.frombuffer(w_b, np.float32).reshape(dst, taps)
    m = np.zeros((src, dst), np.float32)
    for t in range(taps):
        np.add.at(m, (idx[:, t], np.arange(dst)), w[:, t])
    return m


def _resize_axis(img: jax.Array, axis: int, idx: np.ndarray, w: np.ndarray) -> jax.Array:
    """Apply per-output-pixel (idx, w) taps along one axis.

    Expressed as a matmul against a sparse-banded (src, dst) matrix so it
    runs on the MXU — per-pixel gathers have no TPU hardware path (the
    gather formulation costs ~0.45 ms for a 540->1080 flow upsample where
    the matmul is ~0.02 ms)."""
    m = jnp.asarray(_resize_matrix(img.shape[axis], idx.shape[0],
                                   idx.tobytes(), w.tobytes(), idx.shape[1]))
    moved = jnp.moveaxis(img, axis, 0)
    flat = moved.reshape(moved.shape[0], -1)
    out = jnp.einsum("sd,sf->df", m, flat,
                     preferred_element_type=jnp.float32)
    return jnp.moveaxis(out.reshape((idx.shape[0],) + moved.shape[1:]),
                        0, axis)


def _resize(img: jax.Array, out_hw: tuple[int, int], weights_fn) -> jax.Array:
    h, w = out_hw
    in_dtype = img.dtype
    x = img.astype(jnp.float32)
    iy, wy = weights_fn(img.shape[0], h)
    ix, wx = weights_fn(img.shape[1], w)
    x = _resize_axis(x, 0, iy, wy)
    x = _resize_axis(x, 1, ix, wx)
    if in_dtype == jnp.uint8:
        # OpenCV rounds to nearest when storing back to uint8.
        x = jnp.clip(jnp.round(x), 0, 255)
    return x.astype(in_dtype)


def resize_bilinear(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """cv2.resize(..., INTER_LINEAR). img is (H, W) or (H, W, C)."""
    return _resize(img, out_hw, _linear_weights)


def resize_bilinear_cf(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """INTER_LINEAR resize of a channels-first (C, H, W) array via two MXU
    matmuls (used for the flow pyramid upsampling in the Farneback driver,
    where flow stays channels-first between levels)."""
    h, w = out_hw
    iy, wy = _linear_weights(img.shape[1], h)
    ix, wx = _linear_weights(img.shape[2], w)
    my = jnp.asarray(_resize_matrix(img.shape[1], h, iy.tobytes(),
                                    wy.tobytes(), 2))
    mx = jnp.asarray(_resize_matrix(img.shape[2], w, ix.tobytes(),
                                    wx.tobytes(), 2))
    t = jnp.einsum("sd,csw->cdw", my, img.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return jnp.einsum("sw,cds->cdw", mx, t,
                      preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=64)
def _resize_matrices_padded(src_true, dst_true, src_pad, dst_pad, scale):
    sh_t, sw_t = src_true
    dh, dw = dst_true
    iy, wy = _linear_weights(sh_t, dh)
    ix, wx = _linear_weights(sw_t, dw)
    my = _resize_matrix(sh_t, dh, iy.tobytes(), wy.tobytes(), 2)
    mx = _resize_matrix(sw_t, dw, ix.tobytes(), wx.tobytes(), 2)
    my_p = np.zeros((src_pad[0], dst_pad[0]), np.float32)
    my_p[:sh_t, :dh] = my * scale
    mx_p = np.zeros((src_pad[1], dst_pad[1]), np.float32)
    mx_p[:sw_t, :dw] = mx
    return my_p, mx_p


@functools.lru_cache(maxsize=64)
def _resize_bands_padded(which, src_true, dst_true, src_pad, dst_pad,
                         scale, bs=128):
    """Decompose one padded resize matrix into per-128-output-block source
    windows: tuple of (src0, W_b (srcw, width) | None, width); None marks
    an all-zero block (the pad margins — skipped at runtime). The
    bilinear resize matrices are 2-tap banded, so each output block reads
    a ~(bs*src/dst + 2)-row source window — a dense matmul would waste
    >90% of its MXU FLOPs (same trick as flow/farneback._banded_blocks)."""
    from ripcurrents_tpu.ops.banded import block_band_windows
    my_p, mx_p = _resize_matrices_padded(src_true, dst_true, src_pad,
                                         dst_pad, scale)
    return block_band_windows(my_p if which == "y" else mx_p, bs)


def resize_bilinear_cf_padded(img: jax.Array, src_true: tuple[int, int],
                              dst_true: tuple[int, int],
                              dst_pad: tuple[int, int],
                              scale: float = 1.0) -> jax.Array:
    """INTER_LINEAR resize of the true (sh, sw) region of a padded
    channels-first (C, SPh, SPw) array into the true region of a
    (C, DPh, DPw) canvas whose pads come out EXACTLY zero, with an
    optional scalar fold (e.g. the 1/pyr_scale flow-magnitude rescale).

    The embedding, the pad zeros and the scale all live inside the two
    resize matrices, so the Farneback pyramid driver can keep flow in the
    padded kernel layout across levels with no per-level jnp.pad / crop /
    multiply passes. Source pad values are ignored (zero matrix rows) —
    callers may leave garbage there. Both passes run as per-128-block
    banded matmuls (the dense form wastes >90% of its FLOPs)."""
    c = img.shape[0]
    key = (tuple(src_true), tuple(dst_true),
           (img.shape[1], img.shape[2]), tuple(dst_pad), float(scale))
    x = img.astype(jnp.float32)

    # y pass: out rows in 128-blocks, each reading a narrow src-row window
    yb = _resize_bands_padded("y", *key)
    rows = []
    for src0, wb, width in yb:
        if wb is None:
            rows.append(jnp.zeros((c, width, img.shape[2]), jnp.float32))
        else:
            rows.append(jnp.einsum(
                "sd,csw->cdw", jnp.asarray(wb),
                jax.lax.slice(x, (0, src0, 0),
                              (c, src0 + wb.shape[0], img.shape[2])),
                preferred_element_type=jnp.float32))
    t = jnp.concatenate(rows, axis=1) if len(rows) > 1 else rows[0]

    # x pass: out cols in 128-blocks
    xb = _resize_bands_padded("x", *key)
    cols = []
    for src0, wb, width in xb:
        if wb is None:
            cols.append(jnp.zeros((c, t.shape[1], width), jnp.float32))
        else:
            cols.append(jnp.einsum(
                "sw,cds->cdw", jnp.asarray(wb),
                jax.lax.slice(t, (0, 0, src0),
                              (c, t.shape[1], src0 + wb.shape[0])),
                preferred_element_type=jnp.float32))
    return jnp.concatenate(cols, axis=2) if len(cols) > 1 else cols[0]


def resize_area(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """cv2.resize(..., INTER_AREA) — used by the reference to preload the
    first frame (main.cpp e.g. :125) and by the android path for every frame."""
    return _resize(img, out_hw, _area_weights)
