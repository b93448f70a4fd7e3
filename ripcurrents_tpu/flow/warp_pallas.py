"""Pallas TPU kernel: flow-conditioned bilinear warp via shift decomposition.

The Farneback matrix update must resample the second frame's polynomial
expansion at x + flow(x) (see flow/farneback.py). TPUs have no per-lane
gather, so the XLA gather lowering costs ~4-10 ns/pixel-row; the
shift-decomposition identity

    bilinear(T, p + d) = sum_s hat(dx - sx) * hat(dy - sy) * T(p + s)

turns it into dense VPU work. This kernel evaluates that sum per output
tile with the table block staged HBM -> VMEM once per tile:

- channel-first layout (5, H, W) so the lane dimension is W,
- one async DMA brings the (5, TH+2P, TW+2P) halo block into VMEM scratch,
- a fori_loop over vertical shifts; each iteration hoists the horizontal
  pass (weights are sy-independent) as a second fori_loop of fused
  multiply-adds on VMEM slices.

Exact (float-assoc) for displacements within +-budget px; callers mask
pixels beyond the budget as out-of-frame (farneback.update_matrices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pads(budget: int) -> tuple[int, int]:
    """Halo pads: sublane pad 8-aligned, lane pad 128-aligned, both >=
    budget+1, so DMA'd block shapes respect Mosaic's (8, 128) tiling."""
    need = budget + 1
    pad_y = -(-need // 8) * 8
    pad_x = -(-need // 128) * 128
    return pad_y, pad_x


def _kernel(budget: int, th: int, tw: int,
            dx_ref, dy_ref, p_hbm, out_ref, scratch, row_ref, sem):
    pad_y, pad_x = _pads(budget)
    i = pl.program_id(0)
    j = pl.program_id(1)
    copy = pltpu.make_async_copy(
        p_hbm.at[:, pl.ds(i * th, th + 2 * pad_y),
                 pl.ds(j * tw, tw + 2 * pad_x)],
        scratch, sem)
    copy.start()
    dx = dx_ref[:]
    dy = dy_ref[:]
    copy.wait()

    # Static double unroll: Mosaic only supports statically-known (possibly
    # unaligned) vector-load offsets; dynamic sublane starts must be
    # 8-aligned, so fori_loop over shifts is not an option here. The
    # accumulators live in VMEM refs (in-place adds) so the unrolled sum
    # does not keep O(shifts) temporaries alive.
    out_ref[:] = jnp.zeros((5, th, tw), jnp.float32)
    for sy in range(-budget, budget + 2):
        wy = jnp.clip(1.0 - jnp.abs(dy - sy), 0.0, 1.0)
        row_ref[:] = jnp.zeros((5, th, tw), jnp.float32)
        for sx in range(-budget, budget + 2):
            wx = jnp.clip(1.0 - jnp.abs(dx - sx), 0.0, 1.0)
            blk = scratch[:, pad_y + sy:pad_y + sy + th,
                          pad_x + sx:pad_x + sx + tw]
            row_ref[:] = row_ref[:] + wx[None, :, :] * blk
        out_ref[:] = out_ref[:] + wy[None, :, :] * row_ref[:]


@functools.partial(jax.jit, static_argnames=("budget", "th", "tw"))
def warp5_shift_pallas(r1: jax.Array, flow: jax.Array, budget: int = 16,
                       th: int = 64, tw: int = 256) -> jax.Array:
    """Warp r1 (H, W, 5) by flow (H, W, 2). Returns samples (H, W, 5);
    values where |flow| > budget are meaningless (callers mask them)."""
    h, w = r1.shape[0], r1.shape[1]
    pad_y, pad_x = _pads(budget)
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw

    p = jnp.transpose(r1, (2, 0, 1))
    p = jnp.pad(p, ((0, 0), (pad_y, pad_y + hp - h), (pad_x, pad_x + wp - w)))
    dx = jnp.pad(flow[..., 0], ((0, hp - h), (0, wp - w)))
    dy = jnp.pad(flow[..., 1], ((0, hp - h), (0, wp - w)))

    grid = (hp // th, wp // tw)
    out = pl.pallas_call(
        functools.partial(_kernel, budget, th, tw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((th, tw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((5, th, tw), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((5, th + 2 * pad_y, tw + 2 * pad_x), jnp.float32),
            pltpu.VMEM((5, th, tw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(dx, dy, p)
    return jnp.transpose(out[:, :h, :w], (1, 2, 0))
