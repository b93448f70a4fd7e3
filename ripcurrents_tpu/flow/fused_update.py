"""Pallas TPU kernel: fused Farneback matrix update (warp + normal equations).

This is the production hot loop of the Farneback engine (the iteration body
of cv2-style calcOpticalFlowFarneback — reference call sites
RipCurrents_main/main.cpp:264,609,961,1119,1481). Per output tile it fuses:

1. the tiled base + residual warp of the second frame's polynomial
   expansion (see flow/farneback.py _warp5_tiled for the algebra): the
   rounded tile-mean displacement (the "base") plus a per-pixel remainder
   clamped to +-bres, resolved by a short shift-decomposition sum over
   (2*bres+2)^2 terms computed entirely in VMEM,
2. the normal-equation tail of FarnebackUpdateMatrices: constraint terms,
   prior-flow fold-back, border down-weighting, and the 5 matrix channels
   G11, G12, G22, h1, h2.

Compared to running the unfused XLA ops, the expansion block is streamed
from HBM once per tile instead of once per shift term (~36x less HBM
traffic at bres=2), and the warped expansion never round-trips through HBM.

Two kernels share this machinery:
- `_kernel` / fused_update: the matrix update from a given flow field
  (the first update of each pyramid level, from the upsampled flow);
- `_iter_kernel` / fused_iter_prepped: one FULL iteration — window-blur
  the previous normal equations (banded matmuls on the MXU), solve the
  2x2 systems, derive the tile-mean base, then warp + update — so the
  intermediate flow never leaves VMEM between iterations.

Mosaic constraint note: DMA slice starts must respect the (8, 128) tiling,
so the per-tile base displacement CANNOT be a dynamic DMA offset. Instead
each tile DMAs a halo block at a static aligned offset and applies the base
with `pltpu.roll` (hardware dynamic rotate) inside VMEM. This bounds the
supported base to +-(halo - bres - 1) px per axis (defaults: +-29 y,
+-125 x); larger tile-mean motion degrades gracefully via the residual
clamp rather than erroring.

Layout is channels-first (5, H, W): W on the 128-wide lane dimension,
H on sublanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Halo sizes (per side). Must be multiples of the f32 tiling (8, 128) so
# DMA'd block shapes stay tile-aligned; must exceed bres + 1.
HALO_Y = 32
HALO_X = 128


def _kernel(bres, th, tw, tx_n, h_true, w_true,
            by_ref, bx_ref, dx_ref, dy_ref, r0_ref, scale_ref, p_hbm,
            out_ref, scratch, sem):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    i = t // tx_n
    j = t % tx_n
    by = by_ref[i, j]
    bx = bx_ref[i, j]
    sh, sw = th + 2 * HALO_Y, tw + 2 * HALO_X

    def dma(tile, slot):
        ti = tile // tx_n
        tj = tile % tx_n
        return pltpu.make_async_copy(
            p_hbm.at[:, pl.ds(ti * th, sh), pl.ds(tj * tw, sw)],
            scratch.at[slot], sem.at[slot])

    # Double-buffered halo-block prefetch: grid steps run sequentially on
    # the core and scratch persists across them, so tile t+1's DMA is
    # issued before tile t's compute and overlaps it.
    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < n_t)
    def _():
        dma(t + 1, jax.lax.rem(t + 1, 2)).start()

    dx = dx_ref[:]
    dy = dy_ref[:]
    # Residuals past the budget are clamped to its edge (bounded sample
    # misplacement beats zeroing; see _warp5_tiled).
    rx = jnp.clip(dx - bx.astype(jnp.float32), -float(bres), float(bres))
    ry = jnp.clip(dy - by.astype(jnp.float32), -float(bres), float(bres))

    # Horizontal hat weights are sy-independent: compute once.
    wxs = [jnp.clip(1.0 - jnp.abs(rx - sx), 0.0, 1.0)
           for sx in range(-bres, bres + 2)]

    dma(t, slot).wait()

    # Apply the integer base as a circular rotate toward lower indices; the
    # halo guarantees the window of interest never reads wrapped data while
    # |base| <= halo - bres - 1 (enforced host-side by clipping).
    # f32 before the rotates: tpu.dynamic_rotate does not support bf16 on
    # the sublane axis. The DMA above already moved the halo block at its
    # narrow storage dtype, which is what the bf16 table buys.
    blk = scratch[slot].astype(jnp.float32)
    blk = pltpu.roll(blk, jnp.remainder(sh - by, sh), axis=1)
    blk = pltpu.roll(blk, jnp.remainder(sw - bx, sw), axis=2)

    # Static double unroll (Mosaic needs statically-known vector-slice
    # offsets); at bres=2 the 36 terms fit register/stack accumulation.
    r1s = jnp.zeros((5, th, tw), jnp.float32)
    for sy in range(-bres, bres + 2):
        wy = jnp.clip(1.0 - jnp.abs(ry - sy), 0.0, 1.0)
        row = jnp.zeros((5, th, tw), jnp.float32)
        for k, sx in enumerate(range(-bres, bres + 2)):
            sub = jax.lax.slice(
                blk, (0, HALO_Y + sy, HALO_X + sx),
                (5, HALO_Y + sy + th, HALO_X + sx + tw))
            row = row + wxs[k][None, :, :] * sub
        r1s = r1s + wy[None, :, :] * row

    # --- FarnebackUpdateMatrices tail ---
    r0 = r0_ref[:]

    ys = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
          + i * th).astype(jnp.float32)
    xs = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
          + j * tw).astype(jnp.float32)
    x1 = jnp.floor(xs + dx)
    y1 = jnp.floor(ys + dy)
    inside = ((x1 >= 0.0) & (y1 >= 0.0) &
              (x1 < float(w_true) - 1) & (y1 < float(h_true) - 1))

    r2 = jnp.where(inside, (r0[0] - r1s[0]) * 0.5, r0[0] * 0.5)
    r3 = jnp.where(inside, (r0[1] - r1s[1]) * 0.5, r0[1] * 0.5)
    r4 = jnp.where(inside, (r0[2] + r1s[2]) * 0.5, r0[2])
    r5 = jnp.where(inside, (r0[3] + r1s[3]) * 0.5, r0[3])
    r6 = jnp.where(inside, (r0[4] + r1s[4]) * 0.25, r0[4] * 0.5)

    r2 = r2 + r4 * dx + r6 * dy
    r3 = r3 + r6 * dx + r5 * dy

    scale = scale_ref[:]
    r2 = r2 * scale
    r3 = r3 * scale
    r4 = r4 * scale
    r5 = r5 * scale
    r6 = r6 * scale

    out_ref[0] = r4 * r4 + r6 * r6
    out_ref[1] = (r4 + r5) * r6
    out_ref[2] = r5 * r5 + r6 * r6
    out_ref[3] = r4 * r2 + r6 * r3
    out_ref[4] = r6 * r2 + r5 * r3


# Halo of the M-matrix block in the fused-iteration kernel (window blur
# reach is winsize//2 <= 10 for every reference preset; multiples of the
# (8, 128) tiling for aligned DMA).
MHALO_Y = 16
MHALO_X = 128


def _iter_kernel(bres, th, tw, tx_n, h_true, w_true, blur_k,
                 counts_ref, by_ref2, bx_ref2, r0_ref, scale_ref, p_hbm,
                 m_hbm, out_ref, scratch, m_scratch, sem, m_sem):
    """One full Farneback iteration per tile: window-blur the previous
    normal equations, solve for flow, derive the tile base, warp + update.
    M never round-trips through separate XLA ops between iterations."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    i = t // tx_n
    j = t % tx_n
    sh, sw = th + 2 * HALO_Y, tw + 2 * HALO_X
    mh, mw = th + 2 * MHALO_Y, tw + 2 * MHALO_X
    half = (len(blur_k) - 1) // 2

    def dma_tbl(tile, slot):
        ti = tile // tx_n
        tj = tile % tx_n
        return pltpu.make_async_copy(
            p_hbm.at[:, pl.ds(ti * th, sh), pl.ds(tj * tw, sw)],
            scratch.at[slot], sem.at[slot])

    def dma_m(tile, slot):
        ti = tile // tx_n
        tj = tile % tx_n
        return pltpu.make_async_copy(
            m_hbm.at[:, pl.ds(ti * th, mh), pl.ds(tj * tw, mw)],
            m_scratch.at[slot], m_sem.at[slot])

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        dma_tbl(0, 0).start()
        dma_m(0, 0).start()

    @pl.when(t + 1 < n_t)
    def _():
        nslot = jax.lax.rem(t + 1, 2)
        dma_tbl(t + 1, nslot).start()
        dma_m(t + 1, nslot).start()

    dma_m(t, slot).wait()
    mblk = m_scratch[slot]

    # Separable window blur as banded matmuls on the MXU, unrolled per
    # channel with plain 2-D dots (Mosaic cannot reshape the 3-D
    # dot_general operands). The VPU tap chain this replaces put ~1 G
    # multiply-adds on the kernel's critical path (~20% end-to-end).
    by_t = by_ref2[:]   # (th, th+2*half)
    bx_b = bx_ref2[:]   # (tw+2*half, tw)
    mbs = []
    for c in range(5):
        msub_c = jax.lax.slice(
            mblk, (c, MHALO_Y - half, MHALO_X - half),
            (c + 1, MHALO_Y + half + th, MHALO_X + half + tw))[0]
        t_c = jnp.dot(by_t, msub_c, preferred_element_type=jnp.float32)
        mbs.append(jnp.dot(t_c, bx_b, preferred_element_type=jnp.float32))
    mb = jnp.stack(mbs, axis=0)

    # Per-pixel 2x2 solve of the blurred normal equations.
    idet = 1.0 / (mb[0] * mb[2] - mb[1] * mb[1] + 1e-3)
    dx = (mb[2] * mb[3] - mb[1] * mb[4]) * idet
    dy = (mb[0] * mb[4] - mb[1] * mb[3]) * idet

    # Tile-mean base over real pixels only (pad rows/cols masked out).
    ys = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
          + i * th).astype(jnp.float32)
    xs = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
          + j * tw).astype(jnp.float32)
    valid = (ys < float(h_true)) & (xs < float(w_true))
    cnt = counts_ref[i, j]
    bx = jnp.clip(jnp.round(jnp.sum(jnp.where(valid, dx, 0.0)) / cnt),
                  -(HALO_X - bres - 1), HALO_X - bres - 1).astype(jnp.int32)
    by = jnp.clip(jnp.round(jnp.sum(jnp.where(valid, dy, 0.0)) / cnt),
                  -(HALO_Y - bres - 1), HALO_Y - bres - 1).astype(jnp.int32)

    rx = jnp.clip(dx - bx.astype(jnp.float32), -float(bres), float(bres))
    ry = jnp.clip(dy - by.astype(jnp.float32), -float(bres), float(bres))
    wxs = [jnp.clip(1.0 - jnp.abs(rx - sx), 0.0, 1.0)
           for sx in range(-bres, bres + 2)]

    dma_tbl(t, slot).wait()
    blk = scratch[slot].astype(jnp.float32)
    blk = pltpu.roll(blk, jnp.remainder(sh - by, sh), axis=1)
    blk = pltpu.roll(blk, jnp.remainder(sw - bx, sw), axis=2)

    r1s = jnp.zeros((5, th, tw), jnp.float32)
    for sy in range(-bres, bres + 2):
        wy = jnp.clip(1.0 - jnp.abs(ry - sy), 0.0, 1.0)
        row = jnp.zeros((5, th, tw), jnp.float32)
        for k, sx in enumerate(range(-bres, bres + 2)):
            sub = jax.lax.slice(
                blk, (0, HALO_Y + sy, HALO_X + sx),
                (5, HALO_Y + sy + th, HALO_X + sx + tw))
            row = row + wxs[k][None, :, :] * sub
        r1s = r1s + wy[None, :, :] * row

    r0 = r0_ref[:]
    x1 = jnp.floor(xs + dx)
    y1 = jnp.floor(ys + dy)
    inside = ((x1 >= 0.0) & (y1 >= 0.0) &
              (x1 < float(w_true) - 1) & (y1 < float(h_true) - 1))

    r2 = jnp.where(inside, (r0[0] - r1s[0]) * 0.5, r0[0] * 0.5)
    r3 = jnp.where(inside, (r0[1] - r1s[1]) * 0.5, r0[1] * 0.5)
    r4 = jnp.where(inside, (r0[2] + r1s[2]) * 0.5, r0[2])
    r5 = jnp.where(inside, (r0[3] + r1s[3]) * 0.5, r0[3])
    r6 = jnp.where(inside, (r0[4] + r1s[4]) * 0.25, r0[4] * 0.5)

    r2 = r2 + r4 * dx + r6 * dy
    r3 = r3 + r6 * dx + r5 * dy

    scale = scale_ref[:]
    r2 = r2 * scale
    r3 = r3 * scale
    r4 = r4 * scale
    r5 = r5 * scale
    r6 = r6 * scale

    out_ref[0] = r4 * r4 + r6 * r6
    out_ref[1] = (r4 + r5) * r6
    out_ref[2] = r5 * r5 + r6 * r6
    out_ref[3] = r4 * r2 + r6 * r3
    out_ref[4] = r6 * r2 + r5 * r3


def _blur_kernel_taps(winsize: int, gaussian: bool):
    half = winsize // 2
    if gaussian:
        x = np.arange(-half, half + 1, dtype=np.float64)
        sig = max(half * 0.3, 1e-6)
        k = np.exp(-(x * x) / (2 * sig * sig))
        k = k / k.sum()
    else:
        k = np.full((2 * half + 1,), 1.0 / (2 * half + 1))
    return tuple(float(v) for v in k)


@functools.partial(jax.jit, static_argnames=("winsize", "gaussian", "bres",
                                             "th", "tw", "hw"))
def _fused_iter_prepped(r0p, p, scale_p, counts, m, hw, winsize, gaussian,
                        bres, th, tw):
    h, w = hw
    _, hp, wp = r0p.shape
    ty_n, tx_n = hp // th, wp // tw
    blur_k = _blur_kernel_taps(winsize, gaussian)
    half = winsize // 2
    assert half <= MHALO_Y and half <= MHALO_X
    # Replicate-pad the true-image region of M so the in-kernel blur sees
    # cv2 border semantics at the frame edge.
    m_pad = jnp.pad(m, ((0, 0), (MHALO_Y, MHALO_Y + hp - h),
                        (MHALO_X, MHALO_X + wp - w)), mode="edge")

    kk = np.asarray(blur_k, np.float32)
    by_band = np.zeros((th + 2 * half, th), np.float32)
    bx_band = np.zeros((tw + 2 * half, tw), np.float32)
    for o, kv in enumerate(kk):
        by_band[np.arange(th) + o, np.arange(th)] = kv
        bx_band[np.arange(tw) + o, np.arange(tw)] = kv
    by_band = by_band.T   # left-multiply form: (th, th+2*half)

    kern = functools.partial(_iter_kernel, bres, th, tw, tx_n, h, w, blur_k)
    ij = lambda t: (t // tx_n, t % tx_n)  # noqa: E731
    out = pl.pallas_call(
        kern,
        grid=(ty_n * tx_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # counts
            pl.BlockSpec(memory_space=pltpu.VMEM),   # y band matrix
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x band matrix
            pl.BlockSpec((5, th, tw), lambda t: (0, *ij(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), ij, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),    # expansion table
            pl.BlockSpec(memory_space=pltpu.ANY),    # padded M
        ],
        out_specs=pl.BlockSpec((5, th, tw), lambda t: (0, *ij(t)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 5, th + 2 * HALO_Y, tw + 2 * HALO_X), p.dtype),
            pltpu.VMEM((2, 5, th + 2 * MHALO_Y, tw + 2 * MHALO_X),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(counts, jnp.asarray(by_band), jnp.asarray(bx_band), r0p, scale_p,
      p, m_pad)
    return out[:, :h, :w]


def fused_iter_prepped(prep, m, winsize: int, gaussian: bool,
                       bres: int = 2, th: int = 64,
                       tw: int = 256) -> jax.Array:
    """One fused Farneback iteration: m -> updated m (flow stays internal;
    the caller runs the cheap final blur+solve after the last call)."""
    return _fused_iter_prepped(prep["r0p"], prep["p"], prep["scale_p"],
                               prep["counts"], m, tuple(prep["hw"]),
                               winsize, gaussian, bres, th, tw)


def prepare_expansions(r0cf: jax.Array, r1cf: jax.Array, scale: jax.Array,
                       th: int = 64, tw: int = 256,
                       table_dtype=jnp.bfloat16):
    """Pad the per-level constants once (the iteration loop reuses them):
    r0 tile-aligned, r1 halo-padded for the kernel DMA (bf16 by default,
    halving the per-tile halo traffic; the warp fma accumulates in f32
    and the sampled-value noise is on par with the banded polynomial
    expansion's), border scale tile-aligned."""
    _, h, w = r0cf.shape
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    r0p = jnp.pad(r0cf, ((0, 0), (0, hp - h), (0, wp - w)))
    p = jnp.pad(r1cf, ((0, 0), (HALO_Y, HALO_Y + hp - h),
                       (HALO_X, HALO_X + wp - w))).astype(table_dtype)
    scale_p = jnp.pad(scale, ((0, hp - h), (0, wp - w)))
    # Per-tile REAL-pixel counts for the masked tile-mean base (the pad
    # region carries zero flow and must not bias the mean); flow-
    # independent, so hoisted out of the iteration loop.
    ty_n, tx_n = hp // th, wp // tw
    valid = jnp.zeros((hp, wp), jnp.float32).at[:h, :w].set(1.0)
    counts = jnp.maximum(
        valid.reshape(ty_n, th, tx_n, tw).sum((1, 3)), 1.0)
    return {"r0p": r0p, "p": p, "scale_p": scale_p, "counts": counts,
            "hw": (h, w)}


@functools.partial(jax.jit, static_argnames=("bres", "th", "tw", "hw"))
def _fused_update_prepped(r0p, p, scale_p, counts, flow, hw, bres, th, tw):
    h, w = hw
    _, hp, wp = r0p.shape

    dx = jnp.pad(flow[..., 0], ((0, hp - h), (0, wp - w)))
    dy = jnp.pad(flow[..., 1], ((0, hp - h), (0, wp - w)))

    ty_n, tx_n = hp // th, wp // tw

    def tile_mean(a):
        return a.reshape(ty_n, th, tx_n, tw).sum((1, 3)) / counts

    base_x = jnp.clip(jnp.round(tile_mean(dx)), -(HALO_X - bres - 1),
                      HALO_X - bres - 1).astype(jnp.int32)
    base_y = jnp.clip(jnp.round(tile_mean(dy)), -(HALO_Y - bres - 1),
                      HALO_Y - bres - 1).astype(jnp.int32)

    kern = functools.partial(_kernel, bres, th, tw, tx_n, h, w)
    ij = lambda t: (t // tx_n, t % tx_n)  # noqa: E731
    out = pl.pallas_call(
        kern,
        grid=(ty_n * tx_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((th, tw), ij, memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), ij, memory_space=pltpu.VMEM),
            pl.BlockSpec((5, th, tw), lambda t: (0, *ij(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), ij, memory_space=pltpu.VMEM),
            # The expansion table stays in HBM; halo blocks are DMA'd
            # manually (double-buffered) at static tile-aligned offsets.
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((5, th, tw), lambda t: (0, *ij(t)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 5, th + 2 * HALO_Y, tw + 2 * HALO_X), p.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # The default 16MB scoped-vmem budget is borderline for the
            # double-buffered blocks + rolled halo block at tw=256.
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(base_y, base_x, dx, dy, r0p, scale_p, p)
    return out[:, :h, :w]


def fused_update(r0cf: jax.Array, r1cf: jax.Array, flow: jax.Array,
                 scale: jax.Array, bres: int = 2, th: int = 64,
                 tw: int = 256) -> jax.Array:
    """Fused update_matrices: (5, H, W) expansions + (H, W, 2) flow ->
    (5, H, W) normal-equation channels. Matches
    farneback.update_matrices(..., warp_impl='tiled') semantics (with the
    base-range bound documented in the module docstring). For the
    iteration loop, call prepare_expansions once and
    fused_update_prepped per iteration instead."""
    prep = prepare_expansions(r0cf, r1cf, scale, th, tw)
    return fused_update_prepped(prep, flow, bres=bres, th=th, tw=tw)


def fused_update_prepped(prep, flow, bres: int = 2, th: int = 64,
                         tw: int = 256) -> jax.Array:
    return _fused_update_prepped(prep["r0p"], prep["p"], prep["scale_p"],
                                 prep["counts"], flow, tuple(prep["hw"]),
                                 bres, th, tw)
