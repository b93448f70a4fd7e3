"""Dense pyramidal Lucas-Kanade flow — the TPU-native form of tracking a
point at EVERY pixel.

The reference's farnebackAndLkSpeedComparison benchmarks cv2's sparse LK
over a full 640x480 pixel grid (ripcurrents_module.cpp:696-721, 307k
points). Running the sparse per-point tracker (flow/lucas_kanade.py) over
that grid is pathological on TPU: each point does 4 full-image gathers per
window tap. For a dense grid the math collapses into dense array ops:

- each pixel's window sums of derivative products become box filters
  (banded-matrix matmuls on the MXU, like the Farneback window blur),
- the per-iteration J resampling at x + flow is one flow-conditioned warp
  (the same tiled base + residual shift decomposition as the Farneback
  engine, farneback._warp5_tiled),
- the 2x2 solves and the epsilon / oscillation-damping stopping rules of
  cv::calcOpticalFlowPyrLK run per pixel with convergence masking inside a
  lax.scan (fixed trip count; converged pixels stop moving).

Grid points sit at integer pixels, so the I-window bilinear fraction is
exactly zero and the window sums reduce to pure box filters — the dense
formulation matches the sparse tracker's math for interior pixels (see
tests/test_dense_lk.py).

Rigid-window detail: the sparse tracker displaces each point's whole
window by that point's flow. Warping J by the raw per-pixel flow instead
lets neighbor noise contaminate every window sum (the iteration then
drifts on bilinear-interpolation bias and never meets the epsilon). So
each iteration warps J by the window-MEAN flow and re-centers the
estimate on it — the dense analog of the rigid window. At an exact fixed
point (e.g. integer translation) diffs vanish identically; the output is
implicitly window-smoothed, which sharp motion boundaries feel (a
documented deviation from per-point tracking).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ripcurrents_tpu.config import LKParams
from ripcurrents_tpu.flow.farneback import _banded_replicate, _warp5_tiled
from ripcurrents_tpu.flow.lucas_kanade import _scharr, build_pyramid


def _box_zero(img: jax.Array, win: tuple[int, int]) -> jax.Array:
    """Window-sum with zero border (matches the sparse tracker's
    zero-padded derivative windows), via banded matmuls on the MXU."""
    ky = np.ones(win[1], np.float32)
    kx = np.ones(win[0], np.float32)
    # zero border: plain banded correlation without replicate folding
    by = jnp.asarray(_banded_zero(img.shape[0], ky.tobytes()))
    bx = jnp.asarray(_banded_zero(img.shape[1], kx.tobytes()))
    t = jnp.einsum("sn,sw->nw", by, img, preferred_element_type=jnp.float32)
    return jnp.einsum("sn,hs->hn", bx, t, preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=64)
def _banded_zero(n: int, kbytes: bytes) -> np.ndarray:
    k = np.frombuffer(kbytes, np.float32)
    half = (len(k) - 1) // 2
    b = np.zeros((n, n), np.float32)
    dst = np.arange(n)
    for i, kv in enumerate(k):
        src = dst - half + i
        ok = (src >= 0) & (src < n)
        b[src[ok], dst[ok]] += kv
    return b


def dense_lk(prev: jax.Array, nxt: jax.Array,
             p: LKParams = LKParams.dense_grid(),
             warp_residual: int = 4) -> tuple[jax.Array, jax.Array]:
    """Flow (H, W, 2) + status (H, W) bool from tracking every pixel.

    Semantics follow cv::calcOpticalFlowPyrLK per pixel (window sums,
    min-eigenvalue gate, iteration stopping rules); J resampling uses the
    tiled warp (clamped residual) instead of an exact gather.
    """
    h, w = prev.shape
    levels = p.levels
    while levels > 0 and (min(h, w) >> levels) < max(p.win):
        levels -= 1

    pyr_i = build_pyramid(prev, levels)
    pyr_j = build_pyramid(nxt, levels)
    eps2 = min(max(p.eps, 0.0), 10.0) ** 2
    area = p.win[0] * p.win[1]

    flow = None
    status = None
    for lvl in range(levels, -1, -1):
        i_img = pyr_i[lvl]
        j_img = pyr_j[lvl]
        lh, lw = i_img.shape
        if flow is None:
            flow = jnp.zeros((lh, lw, 2), jnp.float32)
        else:
            from ripcurrents_tpu.ops.image import resize_bilinear
            flow = resize_bilinear(flow, (lh, lw)) * 2.0

        ix, iy = _scharr(i_img)
        kby = (np.ones(p.win[1], np.float32) / p.win[1])
        kbx = (np.ones(p.win[0], np.float32) / p.win[0])
        by = jnp.asarray(_banded_replicate(lh, kby.tobytes()))
        bx = jnp.asarray(_banded_replicate(lw, kbx.tobytes()))

        def box_mean(a):
            t = jnp.einsum("sn,swc->nwc", by, a,
                           preferred_element_type=jnp.float32)
            return jnp.einsum("sn,hsc->hnc", bx, t,
                              preferred_element_type=jnp.float32)

        g11 = _box_zero(ix * ix, p.win)
        g12 = _box_zero(ix * iy, p.win)
        g22 = _box_zero(iy * iy, p.win)
        det = g11 * g22 - g12 * g12
        # OpenCV's 1/1024-scaled eigenvalue frame / window area (the sparse
        # tracker uses the same constant; lucas_kanade.py:164).
        min_eig = ((g22 + g11 - jnp.sqrt((g11 - g22) ** 2 + 4 * g12 ** 2))
                   / (2.0 * 1024.0 * area))
        solvable = (min_eig >= p.min_eig_threshold) & (det > 1e-12)
        inv_det = jnp.where(det > 1e-12, 1.0 / det, 0.0)
        i_win_sum = i_img  # per-pixel I value; window sums happen on diffs

        def body(carry, _):
            fl, prev_delta, done = carry
            flw = box_mean(fl)   # rigid-window flow (module docstring)
            jw, inside = _warp5_tiled(j_img[..., None], flw,
                                      bres=warp_residual)
            diff = jnp.where(inside, jw[..., 0] - i_win_sum, 0.0)
            b1 = _box_zero(diff * ix, p.win)
            b2 = _box_zero(diff * iy, p.win)
            dxx = (g12 * b2 - g22 * b1) * inv_det
            dyy = (g12 * b1 - g11 * b2) * inv_det
            delta = jnp.stack([dxx, dyy], axis=-1)
            active = (~done & solvable & inside)[..., None]
            new_fl = jnp.where(active, flw + delta, fl)
            d2 = jnp.sum(delta * delta, axis=-1)
            converged = d2 <= eps2
            oscillating = ((jnp.abs(delta[..., 0] + prev_delta[..., 0])
                            < 0.01) &
                           (jnp.abs(delta[..., 1] + prev_delta[..., 1])
                            < 0.01))
            new_fl = jnp.where(active & (oscillating & ~converged)[..., None],
                               new_fl - delta * 0.5, new_fl)
            new_done = done | ~inside | converged | oscillating
            new_prev = jnp.where(active, delta, prev_delta)
            return (new_fl, new_prev, new_done), None

        init = (flow,
                jnp.full((lh, lw, 2), jnp.inf, jnp.float32),
                ~solvable)
        (flow, _, _), _ = jax.lax.scan(body, init, None, length=p.max_iters)
        if lvl == 0:
            ys, xs = jnp.meshgrid(jnp.arange(lh, dtype=jnp.float32),
                                  jnp.arange(lw, dtype=jnp.float32),
                                  indexing="ij")
            x1 = jnp.floor(xs + flow[..., 0])
            y1 = jnp.floor(ys + flow[..., 1])
            status = (solvable & (x1 >= 0) & (y1 >= 0) &
                      (x1 < lw - 1) & (y1 < lh - 1))
    return flow, status
