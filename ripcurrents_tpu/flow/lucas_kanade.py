"""Pyramidal Lucas-Kanade sparse optical flow, vmapped over track points.

Replaces every cv::calcOpticalFlowPyrLK call site in the reference:
Streakline advection (Streakline.cpp:32), Timeline/PopulationMap
(ripcurrents_module.cpp:775,1162), dense-grid benchmark (:716) and red
points (:738). OpenCV semantics are preserved:

- pyramid of uint8 images built with pyrDown (5-tap binomial, fixed-point
  rounding), reflect-101 borders for image sampling, zero borders for
  derivative sampling,
- Scharr 3x3 derivatives,
- per-level iterative refinement with the oscillation-damping and epsilon
  stopping rules of cv::calcOpticalFlowPyrLK (fixed trip count with
  convergence masking — the JAX-friendly equivalent of the data-dependent
  loop),
- the min-eigenvalue track-quality gate with OpenCV's exact scaling so the
  default 1e-4 threshold behaves identically.

TPU mapping: each point's window gathers are bilinear gathers from VMEM-
resident pyramid levels; `jax.vmap` batches all points into one program so
the 2x2 solves and window reductions vectorize on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ripcurrents_tpu.config import LKParams
from ripcurrents_tpu.ops.conv import sep_filter2d


class LKResult(NamedTuple):
    points: jax.Array   # (N, 2) float32 — new positions
    status: jax.Array   # (N,) bool — tracking succeeded
    err: jax.Array      # (N,) float32 — min-eigenvalue quality measure


def _pyr_down_u8(img: jax.Array) -> jax.Array:
    """cv2.pyrDown on uint8: binomial blur + decimate, fixed-point rounding."""
    k = jnp.asarray(np.array([1, 4, 6, 4, 1], np.float64) / 16.0, jnp.float32)
    x = sep_filter2d(img.astype(jnp.float32), k, k, border="reflect101")
    x = x[::2, ::2]
    return jnp.clip(jnp.floor(x + 0.5), 0, 255)


def build_pyramid(img: jax.Array, levels: int) -> list[jax.Array]:
    """Image pyramid [level0 ... levelN] as float32 arrays holding u8 values."""
    out = [img.astype(jnp.float32)]
    for _ in range(levels):
        out.append(_pyr_down_u8(out[-1]))
    return out


def _scharr(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Scharr 3x3 derivatives / 32 (intensity units per pixel)."""
    smooth = jnp.asarray([3.0, 10.0, 3.0], jnp.float32) / 32.0
    diff = jnp.asarray([-1.0, 0.0, 1.0], jnp.float32)
    ix = sep_filter2d(img, smooth, diff, border="replicate")
    iy = sep_filter2d(img, diff, smooth, border="replicate")
    return ix, iy


def _win_offsets(win: tuple[int, int]):
    wy, wx = win[1], win[0]
    oy = jnp.arange(wy, dtype=jnp.float32)
    ox = jnp.arange(wx, dtype=jnp.float32)
    return jnp.meshgrid(oy, ox, indexing="ij")


def _bilinear_patch(img, x0, y0, fx, fy, win, border_zero: bool):
    """Sample a win-sized patch at integer corner (x0, y0) + fraction (fx, fy).

    border_zero=True: out-of-image samples are 0 (derivative semantics).
    border_zero=False: reflect-101 coordinates (image semantics).
    """
    h, w = img.shape
    oy, ox = _win_offsets(win)
    xs = x0.astype(jnp.float32) + ox
    ys = y0.astype(jnp.float32) + oy

    def tap(dy, dx, wgt):
        yi = ys.astype(jnp.int32) + dy
        xi = xs.astype(jnp.int32) + dx
        if border_zero:
            inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
            v = jnp.where(inb, v, 0.0)
        else:
            # reflect101: mirror without repeating the edge sample
            yi = _reflect101(yi, h)
            xi = _reflect101(xi, w)
            v = img[yi, xi]
        return v * wgt

    a00 = (1 - fx) * (1 - fy)
    a01 = fx * (1 - fy)
    a10 = (1 - fx) * fy
    a11 = fx * fy
    return (tap(0, 0, a00) + tap(0, 1, a01) + tap(1, 0, a10) + tap(1, 1, a11))


def _reflect101(idx: jax.Array, n: int) -> jax.Array:
    period = 2 * (n - 1)
    idx = jnp.abs(idx)
    idx = idx % period
    return jnp.where(idx >= n, period - idx, idx)


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _tpu_tracker(p: LKParams, interpret: bool = False):
    """Per-params TPU tracker with a custom vmap rule.

    The Pallas kernel DMAs whole pyramid levels from ANY memory space —
    a layout Mosaic only lowers at batch 1, so jax's automatic batching
    of the pallas_call fails (observed: the multi-stream runner vmapping
    a timelines step over camera streams). The custom rule maps the
    batch axis SEQUENTIALLY with lax.map, keeping every kernel instance
    at single-stream shape — the same schedule the multi-stream
    Farneback scheduler ships for the same VMEM-residency reason
    (flow/farneback.py farneback_stream_multi)."""
    from jax.custom_batching import custom_vmap

    from ripcurrents_tpu.flow.lk_pallas import pyr_lk_pallas

    @custom_vmap
    def track(prev_img, next_img, pts):
        return pyr_lk_pallas(prev_img, next_img, pts, p,
                             interpret=interpret)

    @track.def_vmap
    def _track_vmap(axis_size, in_batched, prev_img, next_img, pts):
        pb, nb, tb = in_batched

        def bc(x, batched):
            return x if batched else jnp.broadcast_to(
                x, (axis_size,) + x.shape)

        args = (bc(prev_img, pb), bc(next_img, nb), bc(pts, tb))
        out = jax.lax.map(lambda a: track(*a), args)
        return out, jax.tree.map(lambda _: True, out)

    return track


def pyr_lk(prev_img: jax.Array, next_img: jax.Array, pts: jax.Array,
           p: LKParams = LKParams(), impl: str = "auto") -> LKResult:
    """Track pts (N, 2) in (x, y) pixel coords from prev_img to next_img.

    impl 'auto' routes to the Pallas per-point window kernel on TPU
    (flow/lk_pallas.py — ~200x faster than this gather formulation
    there), wrapped in a custom vmap rule that advances batched
    trackers (e.g. the multi-stream runner's camera streams)
    sequentially at single-stream kernel shapes; 'gather' forces this
    implementation (CPU / parity checks)."""
    if impl == "auto" and jax.default_backend() == "tpu":
        return _tpu_tracker(p)(prev_img, next_img, pts)
    h, w = prev_img.shape
    levels = p.levels
    # Shrink the pyramid if a level would be smaller than the window
    # (cv::buildOpticalFlowPyramid stops early in that case).
    while levels > 0 and (min(h, w) >> levels) < max(p.win):
        levels -= 1

    pyr_prev = build_pyramid(prev_img, levels)
    pyr_next = build_pyramid(next_img, levels)
    derivs = [_scharr(im) for im in pyr_prev]

    half_x = (p.win[0] - 1) * 0.5
    half_y = (p.win[1] - 1) * 0.5
    eps2 = min(max(p.eps, 0.0), 10.0) ** 2

    def track_point(pt):
        next_pt = pt / (2.0 ** levels)
        status = jnp.array(True)
        err = jnp.array(0.0, jnp.float32)

        for lvl in range(levels, -1, -1):
            i_img = pyr_prev[lvl]
            j_img = pyr_next[lvl]
            ix_img, iy_img = derivs[lvl]
            lh, lw = i_img.shape

            prev_pt = pt / (2.0 ** lvl) - jnp.array([half_x, half_y])
            if lvl != levels:
                next_pt = next_pt * 2.0
            next_pt_local = next_pt - jnp.array([half_x, half_y])

            ipx = jnp.floor(prev_pt[0])
            ipy = jnp.floor(prev_pt[1])
            in_bounds = ((ipx >= -p.win[0]) & (ipx < lw) &
                         (ipy >= -p.win[1]) & (ipy < lh))
            fx = prev_pt[0] - ipx
            fy = prev_pt[1] - ipy

            i_patch = _bilinear_patch(i_img, ipx, ipy, fx, fy, p.win, False)
            ix_patch = _bilinear_patch(ix_img, ipx, ipy, fx, fy, p.win, True)
            iy_patch = _bilinear_patch(iy_img, ipx, ipy, fx, fy, p.win, True)

            a11 = jnp.sum(ix_patch * ix_patch)
            a12 = jnp.sum(ix_patch * iy_patch)
            a22 = jnp.sum(iy_patch * iy_patch)
            det = a11 * a22 - a12 * a12
            # OpenCV computes eigenvalues in a 1/1024-scaled fixed-point frame
            # and divides by the window area before applying the threshold.
            min_eig = ((a22 + a11 - jnp.sqrt((a11 - a22) ** 2 + 4 * a12 ** 2))
                       / (2.0 * 1024.0 * p.win[0] * p.win[1]))
            solvable = (min_eig >= p.min_eig_threshold) & (det > 1e-12) & in_bounds
            inv_det = jnp.where(det > 1e-12, 1.0 / det, 0.0)

            def body(_, carry):
                npt, prev_delta, done = carry
                inx = jnp.floor(npt[0])
                iny = jnp.floor(npt[1])
                ok = ((inx >= -p.win[0]) & (inx < lw) &
                      (iny >= -p.win[1]) & (iny < lh))
                gx = npt[0] - inx
                gy = npt[1] - iny
                j_patch = _bilinear_patch(j_img, inx, iny, gx, gy, p.win, False)
                diff = j_patch - i_patch
                b1 = jnp.sum(diff * ix_patch)
                b2 = jnp.sum(diff * iy_patch)
                delta = jnp.array([(a12 * b2 - a22 * b1) * inv_det,
                                   (a12 * b1 - a11 * b2) * inv_det])
                step_ok = ok & ~done & solvable
                new_pt = jnp.where(step_ok, npt + delta, npt)
                converged = jnp.sum(delta * delta) <= eps2
                oscillating = (jnp.abs(delta[0] + prev_delta[0]) < 0.01) & \
                              (jnp.abs(delta[1] + prev_delta[1]) < 0.01)
                new_pt = jnp.where(step_ok & oscillating & ~converged,
                                   new_pt - delta * 0.5, new_pt)
                new_done = done | ~ok | converged | oscillating
                return new_pt, jnp.where(step_ok, delta, prev_delta), new_done

            init = (next_pt_local,
                    jnp.array([jnp.inf, jnp.inf], jnp.float32),
                    ~solvable)
            npt, _, _ = jax.lax.fori_loop(0, p.max_iters, body, init)
            next_pt = npt + jnp.array([half_x, half_y])
            if lvl == 0:
                inx = jnp.floor(npt[0])
                iny = jnp.floor(npt[1])
                final_ok = ((inx >= -p.win[0]) & (inx < lw) &
                            (iny >= -p.win[1]) & (iny < lh))
                status = in_bounds & final_ok
                err = min_eig
        return next_pt, status, err

    new_pts, status, err = jax.vmap(track_point)(pts.astype(jnp.float32))
    return LKResult(new_pts, status, err)
