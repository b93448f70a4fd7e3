"""Pallas TPU kernel: sparse pyramidal Lucas-Kanade point tracker.

The vmapped gather formulation (flow/lucas_kanade.py) does 4 full-image
gathers per window tap per iteration per point — ~2.4 s/frame for the 200
timeline vertices on TPU, since TPU has no per-lane gather. This kernel
keeps cv::calcOpticalFlowPyrLK's per-point algorithm but stages each
point's pyramid neighborhood into VMEM once per level:

- one grid step per point (sequential on the core),
- aligned DMAs bring (I, dIx, dIy) and a wander-halo J block from the
  reflect-101-padded level images in HBM; Mosaic requires (8, 128)-aligned
  DMA offsets, so the sub-block misalignment is applied with hardware
  dynamic rotates (pltpu.roll),
- the I window, its Scharr-derivative windows and the G matrix are built
  once; the refinement loop (a while_loop that exits at convergence —
  cv2 typically needs a handful of its 30 allowed iterations) re-rolls
  the J block by the current integer offset and applies the 4 fractional
  taps at static offsets, with cv2's epsilon and oscillation-damping
  stopping rules on scalars. Each point's four block DMAs are
  double-buffered across grid steps.

Deviations from the gather path (both documented):
- a point that wanders more than the J-block halo (~16 px vertically,
  ~38 px horizontally) within ONE level is frozen at the halo edge and
  reported failed — the pyramid absorbs large motion, so this is rare;
- window reads beyond the padded border clamp instead of reflecting
  twice.

Outputs and semantics otherwise match flow/lucas_kanade.pyr_lk (see
tests/test_lk_pallas.py for the interpret-mode equivalence check).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ripcurrents_tpu.config import LKParams
from ripcurrents_tpu.flow.lucas_kanade import LKResult, build_pyramid, _scharr


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(win, max_iters, eps2, min_eig_thr, lh, lw, level, n_levels,
            by_i, bx_i, by_j, bx_j, hb_y, hb_x,
            pts_ref, state_ref, idd_hbm, j_hbm,
            out_ref, idd_blk, j_blk, sem):
    wx, wy = win
    n = pl.program_id(0)
    n_t = pl.num_programs(0)
    half_x = (wx - 1) * 0.5
    half_y = (wy - 1) * 0.5
    scale = 1.0 / (1 << level)

    # The padded level arrays have a (PAD_Y, PAD_X) border, so index 0 of
    # the true image sits at (PAD_Y, PAD_X). DMA starts are clamped to the
    # aligned grid; the remainder is rotated out inside VMEM.
    ph = idd_hbm.shape[1]
    pw = idd_hbm.shape[2]

    def aligned_start(i0, pad, block, total, align):
        want = (i0 + pad).astype(jnp.int32)
        start = (want // align) * align
        # total and block are multiples of align, so the clip preserves
        # alignment; pl.multiple_of makes that provable for Mosaic.
        start = pl.multiple_of(jnp.clip(start, 0, total - block), align)
        return start, want - start  # remainder >= 0 (can exceed align when
        #                             clamped at the upper edge)

    def point_geom(k):
        """DMA block origins for point k (pure scalar math, recomputable)."""
        ipx_ = jnp.floor(pts_ref[k, 0] * scale - half_x)
        ipy_ = jnp.floor(pts_ref[k, 1] * scale - half_y)
        iy0_, rem_iy_ = aligned_start(ipy_, _PAD_Y, by_i, ph, 8)
        ix0_, rem_ix_ = aligned_start(ipx_, _PAD_X, bx_i, pw, 128)
        nx_ = state_ref[k, 0] * (1.0 if level == n_levels else 2.0) - half_x
        ny_ = state_ref[k, 1] * (1.0 if level == n_levels else 2.0) - half_y
        jy0_, _ = aligned_start(jnp.floor(ny_) - hb_y, _PAD_Y, by_j, ph, 8)
        jx0_, _ = aligned_start(jnp.floor(nx_) - hb_x, _PAD_X, bx_j, pw, 128)
        return iy0_, ix0_, rem_iy_, rem_ix_, jy0_, jx0_, nx_, ny_

    def dmas(k, slot):
        iy0_, ix0_, _, _, jy0_, jx0_, _, _ = point_geom(k)
        # (I, dIx, dIy) are stacked so the whole I-side neighborhood moves
        # in ONE DMA (halving the per-point DMA count alongside J's).
        return [
            pltpu.make_async_copy(
                idd_hbm.at[:, pl.ds(iy0_, by_i), pl.ds(ix0_, bx_i)],
                idd_blk.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(
                j_hbm.at[pl.ds(jy0_, by_j), pl.ds(jx0_, bx_j)],
                j_blk.at[slot], sem.at[slot, 1]),
        ]

    # Double-buffered point prefetch: grid steps are sequential, scratch
    # persists, so point n+1's four block DMAs overlap point n's compute.
    slot = jax.lax.rem(n, 2)

    @pl.when(n == 0)
    def _():
        for c in dmas(0, 0):
            c.start()

    @pl.when(n + 1 < n_t)
    def _():
        for c in dmas(n + 1, jax.lax.rem(n + 1, 2)):
            c.start()

    px = pts_ref[n, 0] * scale
    py = pts_ref[n, 1] * scale
    prev_x = px - half_x
    prev_y = py - half_y
    ipx = jnp.floor(prev_x)
    ipy = jnp.floor(prev_y)
    fx = prev_x - ipx
    fy = prev_y - ipy
    in_bounds = ((ipx >= -wx) & (ipx < lw) & (ipy >= -wy) & (ipy < lh))
    _, _, rem_iy, rem_ix, jy0, jx0, nx, ny = point_geom(n)

    for c in dmas(n, slot):
        c.wait()

    def window(blk_val, rem_y, rem_x, a00, a01, a10, a11):
        b = pltpu.roll(blk_val, jnp.remainder(-rem_y, blk_val.shape[0]),
                       axis=0)
        b = pltpu.roll(b, jnp.remainder(-rem_x, blk_val.shape[1]), axis=1)
        return (a00 * jax.lax.slice(b, (0, 0), (wy, wx)) +
                a01 * jax.lax.slice(b, (0, 1), (wy, wx + 1)) +
                a10 * jax.lax.slice(b, (1, 0), (wy + 1, wx)) +
                a11 * jax.lax.slice(b, (1, 1), (wy + 1, wx + 1)))

    a00 = (1 - fx) * (1 - fy)
    a01 = fx * (1 - fy)
    a10 = (1 - fx) * fy
    a11 = fx * fy
    iwin = window(idd_blk[slot, 0], rem_iy, rem_ix, a00, a01, a10, a11)
    dwinx = window(idd_blk[slot, 1], rem_iy, rem_ix, a00, a01, a10, a11)
    dwiny = window(idd_blk[slot, 2], rem_iy, rem_ix, a00, a01, a10, a11)

    g11 = jnp.sum(dwinx * dwinx)
    g12 = jnp.sum(dwinx * dwiny)
    g22 = jnp.sum(dwiny * dwiny)
    det = g11 * g22 - g12 * g12
    min_eig = ((g22 + g11 - jnp.sqrt((g11 - g22) ** 2 + 4 * g12 ** 2))
               / (2.0 * 1024.0 * wx * wy))
    solvable = (min_eig >= min_eig_thr) & (det > 1e-12) & in_bounds
    inv_det = jnp.where(det > 1e-12, 1.0 / det, 0.0)

    jb = j_blk[slot]

    def body(carry):
        it, cx, cy, pdx, pdy, done = carry
        inx = jnp.floor(cx)
        iny = jnp.floor(cy)
        ok = (inx >= -wx) & (inx < lw) & (iny >= -wy) & (iny < lh)
        # offsets of the window inside the J block
        oy = (iny + _PAD_Y - jy0).astype(jnp.int32)
        ox = (inx + _PAD_X - jx0).astype(jnp.int32)
        wander_ok = ((oy >= 0) & (oy + wy + 1 <= by_j) &
                     (ox >= 0) & (ox + wx + 1 <= bx_j))
        oy = jnp.clip(oy, 0, by_j - wy - 1)
        ox = jnp.clip(ox, 0, bx_j - wx - 1)
        gx = cx - inx
        gy = cy - iny
        jwin = window(jb, oy, ox,
                      (1 - gx) * (1 - gy), gx * (1 - gy),
                      (1 - gx) * gy, gx * gy)
        diff = jwin - iwin
        b1 = jnp.sum(diff * dwinx)
        b2 = jnp.sum(diff * dwiny)
        dx_ = (g12 * b2 - g22 * b1) * inv_det
        dy_ = (g12 * b1 - g11 * b2) * inv_det
        step_ok = ok & wander_ok & ~done & solvable
        new_x = jnp.where(step_ok, cx + dx_, cx)
        new_y = jnp.where(step_ok, cy + dy_, cy)
        converged = dx_ * dx_ + dy_ * dy_ <= eps2
        oscillating = (jnp.abs(dx_ + pdx) < 0.01) & (jnp.abs(dy_ + pdy) < 0.01)
        new_x = jnp.where(step_ok & oscillating & ~converged,
                          new_x - dx_ * 0.5, new_x)
        new_y = jnp.where(step_ok & oscillating & ~converged,
                          new_y - dy_ * 0.5, new_y)
        done = done | ~ok | ~wander_ok | converged | oscillating
        return (it + 1, new_x, new_y,
                jnp.where(step_ok, dx_, pdx), jnp.where(step_ok, dy_, pdy),
                done)

    # while_loop with the done flag in the condition: converged points
    # stop iterating (cv2 typically converges in a handful of iterations,
    # so this is ~2-3x cheaper than a fixed 30-trip loop).
    init = (jnp.int32(0), nx, ny,
            jnp.float32(jnp.inf), jnp.float32(jnp.inf), ~solvable)
    _, cx, cy, _, _, done = jax.lax.while_loop(
        lambda c: (c[0] < max_iters) & ~c[5], body, init)

    out_ref[n, 0] = cx + half_x
    out_ref[n, 1] = cy + half_y
    if level == 0:
        inx = jnp.floor(cx)
        iny = jnp.floor(cy)
        final_ok = (inx >= -wx) & (inx < lw) & (iny >= -wy) & (iny < lh)
        out_ref[n, 2] = (in_bounds & final_ok & solvable).astype(jnp.float32)
        out_ref[n, 3] = min_eig


# Padding of the level images (>= window + DMA alignment headroom).
_PAD_Y = 64
_PAD_X = 256


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def pyr_lk_pallas(prev_img: jax.Array, next_img: jax.Array, pts: jax.Array,
                  p: LKParams = LKParams(),
                  interpret: bool = False) -> LKResult:
    """TPU Pallas implementation of pyr_lk (same signature/result).
    interpret=True runs the kernel in the Pallas interpreter (CPU tests)."""
    h, w = prev_img.shape
    levels = p.levels
    while levels > 0 and (min(h, w) >> levels) < max(p.win):
        levels -= 1

    pyr_i = build_pyramid(prev_img, levels)
    pyr_j = build_pyramid(next_img, levels)
    wx, wy = p.win
    eps2 = min(max(p.eps, 0.0), 10.0) ** 2

    # Block sizes (static per win): I needs win+1 plus the alignment
    # remainder; J additionally the wander halo.
    by_i = _round_up(wy + 1 + 8, 8)
    bx_i = _round_up(wx + 1 + 128, 128)
    hb_y, hb_x = 16, 38
    by_j = _round_up(wy + 1 + 8 + 2 * hb_y, 8)
    bx_j = _round_up(wx + 1 + 128 + 2 * hb_x, 128)

    n_pts = pts.shape[0]
    pts0 = pts.astype(jnp.float32)
    state = jnp.zeros((n_pts, 4), jnp.float32)
    state = state.at[:, :2].set(pts0 / (2.0 ** levels))

    for level in range(levels, -1, -1):
        i_img = pyr_i[level]
        j_img = pyr_j[level]
        lh, lw = i_img.shape
        # Right/bottom pads rounded so the padded dims are (8, 128)
        # multiples — keeps the clipped aligned DMA starts provably
        # aligned for Mosaic.
        pb_y = _round_up(lh + 2 * _PAD_Y, 8) - lh - _PAD_Y
        pb_x = _round_up(lw + 2 * _PAD_X, 128) - lw - _PAD_X
        ip = jnp.pad(i_img, ((_PAD_Y, pb_y), (_PAD_X, pb_x)),
                     mode="reflect")
        jp = jnp.pad(j_img, ((_PAD_Y, pb_y), (_PAD_X, pb_x)),
                     mode="reflect")
        dx_l, dy_l = _scharr(i_img)
        dxp = jnp.pad(dx_l, ((_PAD_Y, pb_y), (_PAD_X, pb_x)))
        dyp = jnp.pad(dy_l, ((_PAD_Y, pb_y), (_PAD_X, pb_x)))
        idd = jnp.stack([ip, dxp, dyp], axis=0)

        kern = functools.partial(
            _kernel, p.win, p.max_iters, eps2, p.min_eig_threshold,
            lh, lw, level, levels, by_i, bx_i, by_j, bx_j, hb_y, hb_x)
        state = pl.pallas_call(
            kern,
            grid=(n_pts,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # original pts
                pl.BlockSpec(memory_space=pltpu.SMEM),   # running state
                pl.BlockSpec(memory_space=pl.ANY),    # (I, dIx, dIy)
                pl.BlockSpec(memory_space=pl.ANY),    # J padded
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((n_pts, 4), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 3, by_i, bx_i), jnp.float32),
                pltpu.VMEM((2, by_j, bx_j), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            input_output_aliases={1: 0},  # carry state across levels
            interpret=interpret,
        )(pts0, state, idd, jp)

    return LKResult(state[:, :2], state[:, 2] > 0.5, state[:, 3])
