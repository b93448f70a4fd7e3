"""Two-kernel Pallas form of the per-level polynomial-expansion prep.

`flow/farneback.poly_exp_level` runs the fused (pre-smooth o resize o
poly-correlation) prep as ~70 per-block XLA matmuls + stacks + concats
per 1080p frame (27 y-pass dots, 15 fused-x3 dots with combine
epilogues); the XLA scheduling and materialization around those small
ops costs ~0.49 ms/frame across the three levels (docs/DESIGN.md
per-stage table) for ~20 GFLOP-bf16 of math. This module runs the SAME
banded-block matmuls — the same `_level_prep_matrices` weights, so
results match to bf16-matmul rounding — as TWO pallas_calls per level:

  y kernel, grid over 128-row blocks of the stacked [g|xg|xxg]
  intermediate t (3*ps, w):
    DMA the source row slab at an 8-aligned offset
    -> (128, hwin) x (hwin, w) bf16 MXU matmul -> t block (bf16)

  x3 kernel, grid over 128-col output blocks:
    DMA t's column strip at a 128-aligned offset
    -> (3*ps, cw) x (cw, 384) bf16 matmul (the fused [g|xg|xxg] weight
       block) -> the five-channel combine epilogue -> (5, ph, 128)

Alignment is absorbed host-side exactly as in ops/resize_pallas: each
block's matrix is shifted by (src0 - aligned src0) zero rows and padded
to one static window, so DMA offsets are sublane/lane aligned and no
traced lane slices are needed.

Opt-in via RIPC_PREP until the hardware A/B (tools/bench_ab.py)
validates it; interpret-mode tests assert agreement with the XLA
blocked path (tests/test_prep_pallas.py). Reference counterpart: the
per-level GaussianBlur + pyramid resize + FarnebackPolyExp inside
cv2.calcOpticalFlowFarneback (invoked at e.g.
RipCurrents_main/main.cpp:1119); cv2 exactness is inherited from the
shared composed matrices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 128          # t-block rows per y-kernel grid step
_SUB_ALIGN = 8    # f32 DMA row-offset alignment
_LANE_ALIGN = 128


@functools.lru_cache(maxsize=64)
def _prep_plan(args):
    """Aligned block plans for both kernels at one level geometry.

    Returns (ok, y plan, x plan): y = (ys0 (n_y,) i32, ym (n_y, hwin, TH)
    f32), x = (xs0 (n_x,) i32, xm (n_x, cw, 384) f32). The x windows use
    the exact max aligned span over blocks (not the worst-case formula)
    so the fused matmul stays as narrow as the data allows."""
    from ripcurrents_tpu.flow.farneback import (_banded_blocks,
                                                _banded_blocks_x3)
    from ripcurrents_tpu.ops.banded import aligned_block_windows
    h, w = args[0], args[1]
    yb = _banded_blocks("y", *args)
    xb = _banded_blocks_x3(*args)

    yp = aligned_block_windows(yb, h, _SUB_ALIGN, TH)
    xp = aligned_block_windows(xb, w, _LANE_ALIGN, 3 * 128)
    if yp is None or xp is None:
        return (False,) + (None,) * 6
    return (True,) + yp + xp


def _plan_args(h, w, lh, lw, n, sigma, smooth_sz, blur_sigma, ph, pw,
               pad_off):
    return (h, w, lh, lw, n, sigma, smooth_sz, blur_sigma, ph, pw,
            tuple(pad_off))


def prep_pallas_ok(*args) -> bool:
    h, w, ph, pw = args[0], args[1], args[8], args[9]
    if w % _LANE_ALIGN or pw % _LANE_ALIGN or ph % _SUB_ALIGN:
        return False
    return _prep_plan(_plan_args(*args))[0]


def poly_exp_level_pallas(img: jax.Array, args, ig11, ig03, ig33, ig55,
                          ps: int, out_dtype=jnp.float32,
                          interpret: bool = False) -> jax.Array:
    """(5, ph, pw) expansion of one level, two pallas_calls. `args` is the
    _level_prep_matrices argument tuple; `ps` the y section stride
    (_y_section_stride(ph)). Caller must check prep_pallas_ok(*args)."""
    h, w = img.shape
    ph, pw = args[8], args[9]
    ok, ys0, ym, hwin_y, xs0, xm, cw = _prep_plan(_plan_args(*args))
    assert ok, "geometry not admissible; use the XLA blocked path"
    n_y, n_x = ym.shape[0], xm.shape[0]
    tp = n_y * TH        # padded rows of t (>= 3*ps)

    # Both kernels are short-matmul, DMA-heavy: double-buffer the manual
    # copies (start step g+1's DMA before computing step g) so the HBM
    # reads hide behind the MXU work, same pattern as the mega-kernel's
    # p0 slabs (flow/fused_update.py).
    def y_kernel(ys0_ref, img_ref, ym_ref, t_ref, slab, sem):
        g = pl.program_id(0)

        def dma(i, s):
            # ys0 is stored pre-divided by _SUB_ALIGN so Mosaic can prove
            # the HBM slice offset divisible by the sublane tiling (a raw
            # SMEM value carries no divisibility fact; `x * 8` does).
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(ys0_ref[i] * _SUB_ALIGN, hwin_y), :],
                slab.at[s], sem.at[s])

        @pl.when(g == 0)
        def _():
            dma(0, 0).start()

        @pl.when(g + 1 < pl.num_programs(0))
        def _():
            dma(g + 1, jax.lax.rem(g + 1, 2)).start()

        sl = jax.lax.rem(g, 2)
        dma(g, sl).wait()
        t_ref[...] = jnp.dot(
            ym_ref[0].T, slab[sl].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    t = pl.pallas_call(
        y_kernel,
        grid=(n_y,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # ys0
            pl.BlockSpec(memory_space=pl.ANY),              # img (HBM)
            pl.BlockSpec((1, hwin_y, TH), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TH, w), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((tp, w), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, hwin_y, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray(ys0) // _SUB_ALIGN, img.astype(jnp.float32),
      jnp.asarray(ym).astype(jnp.bfloat16))

    def x_kernel(xs0_ref, t_ref, xm_ref, out_ref, strip, sem):
        g = pl.program_id(0)

        def dma(i, s):
            # xs0 pre-divided by _LANE_ALIGN, same divisibility-proof
            # trick as the y kernel (lane tiling is 128).
            return pltpu.make_async_copy(
                t_ref.at[:, pl.ds(xs0_ref[i] * _LANE_ALIGN, cw)],
                strip.at[s], sem.at[s])

        @pl.when(g == 0)
        def _():
            dma(0, 0).start()

        @pl.when(g + 1 < pl.num_programs(0))
        def _():
            dma(g + 1, jax.lax.rem(g + 1, 2)).start()

        sl = jax.lax.rem(g, 2)
        dma(g, sl).wait()
        big = jnp.dot(strip[sl], xm_ref[0],
                      preferred_element_type=jnp.float32)   # (tp, 384)
        tgb = big[:, :128]
        b1 = tgb[:ph]
        b3 = tgb[ps:ps + ph]
        b5 = tgb[2 * ps:2 * ps + ph]
        b2 = big[:ph, 128:256]
        b6 = big[ps:ps + ph, 128:256]
        b4 = big[:ph, 256:384]
        odt = out_ref.dtype
        out_ref[0] = (b2 * ig11).astype(odt)
        out_ref[1] = (b3 * ig11).astype(odt)
        out_ref[2] = (b1 * ig03 + b4 * ig33).astype(odt)
        out_ref[3] = (b1 * ig03 + b5 * ig33).astype(odt)
        out_ref[4] = (b6 * ig55).astype(odt)

    return pl.pallas_call(
        x_kernel,
        grid=(n_x,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # xs0
            pl.BlockSpec(memory_space=pl.ANY),              # t (HBM)
            pl.BlockSpec((1, cw, 384), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((5, ph, 128), lambda g: (0, 0, g)),
        out_shape=jax.ShapeDtypeStruct((5, ph, pw), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tp, cw), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(xs0) // _LANE_ALIGN, t,
      jnp.asarray(xm).astype(jnp.bfloat16))
