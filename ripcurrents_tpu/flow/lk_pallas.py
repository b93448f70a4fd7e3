"""Pallas TPU kernel: sparse pyramidal Lucas-Kanade point tracker.

The vmapped gather formulation (flow/lucas_kanade.py) does 4 full-image
gathers per window tap per iteration per point — ~2.4 s/frame for the 200
timeline vertices on TPU, since TPU has no per-lane gather. This kernel
keeps cv::calcOpticalFlowPyrLK's per-point algorithm but stages each
point's pyramid neighborhood into VMEM once per level:

- a BATCH of `pts_per_step` points per grid step (sequential on the
  core): the batch amortizes the per-step grid overhead, issues all the
  batch's block DMAs together (a deeper copy pipeline than one point's
  two copies), and runs the refinement solve vectorized across the
  batch,
- aligned DMAs bring (I, dIx, dIy) and a wander-halo J block from the
  reflect-101-padded level images in HBM; Mosaic requires (8, 128)-aligned
  DMA offsets, so the sub-block misalignment is applied with hardware
  dynamic rotates (pltpu.roll),
- each point's I window, Scharr-derivative windows and G matrix are built
  once; the refinement loop (a while_loop that exits when EVERY point in
  the batch converged — cv2 typically needs a handful of its 30 allowed
  iterations) re-rolls each J block by its point's current integer offset
  and applies the 4 fractional taps at static offsets, with cv2's epsilon
  and oscillation-damping stopping rules masked per point. The batch's
  block DMAs are double-buffered across grid steps.

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
            by_i, bx_i, by_j, bx_j, hb_y, hb_x, pps,
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

    def dmas(nb, slot):
        # (I, dIx, dIy) are stacked so each point's I-side neighborhood
        # moves in ONE DMA (halving the per-point DMA count alongside
        # J's); the whole batch's 2*pps copies are issued back to back.
        cs = []
        for i in range(pps):
            iy0_, ix0_, _, _, jy0_, jx0_, _, _ = point_geom(nb * pps + i)
            cs.append(pltpu.make_async_copy(
                idd_hbm.at[:, pl.ds(iy0_, by_i), pl.ds(ix0_, bx_i)],
                idd_blk.at[slot, i], sem.at[slot, i, 0]))
            cs.append(pltpu.make_async_copy(
                j_hbm.at[pl.ds(jy0_, by_j), pl.ds(jx0_, bx_j)],
                j_blk.at[slot, i], sem.at[slot, i, 1]))
        return cs

    # Double-buffered batch prefetch: grid steps are sequential, scratch
    # persists, so batch n+1's block DMAs overlap batch n's compute.
    slot = jax.lax.rem(n, 2)

    @pl.when(n == 0)
    def _():
        for c in dmas(0, 0):
            c.start()

    @pl.when(n + 1 < n_t)
    def _():
        for c in dmas(n + 1, jax.lax.rem(n + 1, 2)):
            c.start()

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

    # Per-point template windows and G matrices (unrolled over the batch;
    # all per-point quantities stay SCALARS — tuples across the batch —
    # so the solve math lives in scalar registers like the per-point
    # kernel's did).
    iwins, dwinxs, dwinys = [], [], []
    inbl, g11l, g12l, g22l = [], [], [], []
    minel, solvl, invdl, jy0l, jx0l, nxl, nyl = ([] for _ in range(7))
    for i in range(pps):
        k = n * pps + i
        prev_x = pts_ref[k, 0] * scale - half_x
        prev_y = pts_ref[k, 1] * scale - half_y
        ipx = jnp.floor(prev_x)
        ipy = jnp.floor(prev_y)
        fx = prev_x - ipx
        fy = prev_y - ipy
        inbl.append((ipx >= -wx) & (ipx < lw) & (ipy >= -wy) & (ipy < lh))
        _, _, rem_iy, rem_ix, jy0_, jx0_, nx_, ny_ = point_geom(k)
        jy0l.append(jy0_)
        jx0l.append(jx0_)
        nxl.append(nx_)
        nyl.append(ny_)
        a00 = (1 - fx) * (1 - fy)
        a01 = fx * (1 - fy)
        a10 = (1 - fx) * fy
        a11 = fx * fy
        iwins.append(window(idd_blk[slot, i, 0], rem_iy, rem_ix,
                            a00, a01, a10, a11))
        dwinxs.append(window(idd_blk[slot, i, 1], rem_iy, rem_ix,
                             a00, a01, a10, a11))
        dwinys.append(window(idd_blk[slot, i, 2], rem_iy, rem_ix,
                             a00, a01, a10, a11))
        g11 = jnp.sum(dwinxs[i] * dwinxs[i])
        g12 = jnp.sum(dwinxs[i] * dwinys[i])
        g22 = jnp.sum(dwinys[i] * dwinys[i])
        g11l.append(g11)
        g12l.append(g12)
        g22l.append(g22)
        det = g11 * g22 - g12 * g12
        min_eig = ((g22 + g11 - jnp.sqrt((g11 - g22) ** 2 + 4 * g12 ** 2))
                   / (2.0 * 1024.0 * wx * wy))
        minel.append(min_eig)
        solvl.append((min_eig >= min_eig_thr) & (det > 1e-12) & inbl[i])
        invdl.append(jnp.where(det > 1e-12, 1.0 / det, 0.0))

    def body(carry):
        it, cx, cy, pdx, pdy, done = carry
        ncx, ncy, npdx, npdy, ndone = ([] for _ in range(5))
        for i in range(pps):
            inx = jnp.floor(cx[i])
            iny = jnp.floor(cy[i])
            ok = (inx >= -wx) & (inx < lw) & (iny >= -wy) & (iny < lh)
            # offsets of the window inside this point's J block
            oy = (iny + _PAD_Y - jy0l[i]).astype(jnp.int32)
            ox = (inx + _PAD_X - jx0l[i]).astype(jnp.int32)
            wander_ok = ((oy >= 0) & (oy + wy + 1 <= by_j) &
                         (ox >= 0) & (ox + wx + 1 <= bx_j))
            oy = jnp.clip(oy, 0, by_j - wy - 1)
            ox = jnp.clip(ox, 0, bx_j - wx - 1)
            gx = cx[i] - inx
            gy = cy[i] - iny
            jwin = window(j_blk[slot, i], oy, ox,
                          (1 - gx) * (1 - gy), gx * (1 - gy),
                          (1 - gx) * gy, gx * gy)
            diff = jwin - iwins[i]
            b1 = jnp.sum(diff * dwinxs[i])
            b2 = jnp.sum(diff * dwinys[i])
            dx_ = (g12l[i] * b2 - g22l[i] * b1) * invdl[i]
            dy_ = (g12l[i] * b1 - g11l[i] * b2) * invdl[i]
            step_ok = ok & wander_ok & ~done[i] & solvl[i]
            new_x = jnp.where(step_ok, cx[i] + dx_, cx[i])
            new_y = jnp.where(step_ok, cy[i] + dy_, cy[i])
            converged = dx_ * dx_ + dy_ * dy_ <= eps2
            oscillating = ((jnp.abs(dx_ + pdx[i]) < 0.01) &
                           (jnp.abs(dy_ + pdy[i]) < 0.01))
            new_x = jnp.where(step_ok & oscillating & ~converged,
                              new_x - dx_ * 0.5, new_x)
            new_y = jnp.where(step_ok & oscillating & ~converged,
                              new_y - dy_ * 0.5, new_y)
            ncx.append(new_x)
            ncy.append(new_y)
            npdx.append(jnp.where(step_ok, dx_, pdx[i]))
            npdy.append(jnp.where(step_ok, dy_, pdy[i]))
            ndone.append(done[i] | ~ok | ~wander_ok | converged
                         | oscillating)
        return (it + 1, tuple(ncx), tuple(ncy), tuple(npdx), tuple(npdy),
                tuple(ndone))

    def cond(c):
        alive = ~c[5][0]
        for i in range(1, pps):
            alive = alive | ~c[5][i]
        return (c[0] < max_iters) & alive

    # while_loop with the done flags in the condition: the batch stops
    # iterating once every point converged (cv2 typically converges in a
    # handful of iterations, so this is ~2-3x cheaper than a fixed
    # 30-trip loop); already-done points are masked out inside the body,
    # exactly where the per-point loop would have stopped them.
    inf = jnp.float32(jnp.inf)
    init = (jnp.int32(0), tuple(nxl), tuple(nyl),
            (inf,) * pps, (inf,) * pps,
            tuple(~s for s in solvl))
    _, cx, cy, _, _, done = jax.lax.while_loop(cond, body, init)

    for i in range(pps):
        k = n * pps + i
        out_ref[k, 0] = cx[i] + half_x
        out_ref[k, 1] = cy[i] + half_y
        if level == 0:
            inx = jnp.floor(cx[i])
            iny = jnp.floor(cy[i])
            final_ok = (inx >= -wx) & (inx < lw) & (iny >= -wy) & (iny < lh)
            out_ref[k, 2] = (inbl[i] & final_ok
                             & solvl[i]).astype(jnp.float32)
            out_ref[k, 3] = minel[i]


# Padding of the level images (>= window + DMA alignment headroom).
_PAD_Y = 64
_PAD_X = 256


@functools.partial(jax.jit,
                   static_argnames=("p", "interpret", "pts_per_step"))
def pyr_lk_pallas(prev_img: jax.Array, next_img: jax.Array, pts: jax.Array,
                  p: LKParams = LKParams(),
                  interpret: bool = False,
                  pts_per_step: int = 4) -> LKResult:
    """TPU Pallas implementation of pyr_lk (same signature/result).
    interpret=True runs the kernel in the Pallas interpreter (CPU tests).
    pts_per_step points are tracked per grid step (padded internally)."""
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
    pps = max(1, min(pts_per_step, n_pts))
    # SMEM chunking: the kernel's point buffers (pts, carried state,
    # out) live in SMEM, where Mosaic pads the trailing dim to 128
    # lanes — 3 buffers x n x 128 x 4 B = 1536 B/point against the
    # ~1 MB SMEM budget, so one pallas_call OOMs past ~680 points
    # (observed: streaklines' 5 x 256-vertex chains at 1280 points,
    # 1.88 MB requested). Split the point set into <= 384-point chunks
    # (576 KB) per call; the level images stay shared ANY-space
    # operands, so only the cheap per-point buffers are re-sliced.
    chunk = _round_up(384, pps)
    n_pad = _round_up(n_pts, pps if n_pts <= chunk else chunk)
    pts0 = jnp.zeros((n_pad, 2), jnp.float32).at[:n_pts].set(
        pts.astype(jnp.float32))
    state = jnp.zeros((n_pad, 4), jnp.float32)
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
            lh, lw, level, levels, by_i, bx_i, by_j, bx_j, hb_y, hb_x, pps)

        def level_call(pts_c, state_c):
            return pl.pallas_call(
                kern,
                grid=(pts_c.shape[0] // pps,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # original pts
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # running state
                    pl.BlockSpec(memory_space=pl.ANY),    # (I, dIx, dIy)
                    pl.BlockSpec(memory_space=pl.ANY),    # J padded
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (pts_c.shape[0], 4), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((2, pps, 3, by_i, bx_i), jnp.float32),
                    pltpu.VMEM((2, pps, by_j, bx_j), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, pps, 2)),
                ],
                input_output_aliases={1: 0},  # carry state across levels
                interpret=interpret,
            )(pts_c, state_c, idd, jp)

        if n_pad <= chunk:
            state = level_call(pts0, state)
        else:
            state = jnp.concatenate(
                [level_call(pts0[c:c + chunk], state[c:c + chunk])
                 for c in range(0, n_pad, chunk)], axis=0)

    return LKResult(state[:n_pts, :2], state[:n_pts, 2] > 0.5,
                    state[:n_pts, 3])
