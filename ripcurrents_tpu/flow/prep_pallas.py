"""Single-kernel Pallas form of the per-level polynomial-expansion prep.

`flow/farneback.poly_exp_level` runs the fused (pre-smooth o resize o
poly-correlation) prep as ~70 per-block XLA matmuls + stacks + concats
per 1080p frame; the XLA scheduling and materialization around those
small ops costs ~0.49 ms/frame across the three levels (docs/DESIGN.md
per-stage table) for ~20 GFLOP-bf16 of math. This module runs the SAME
banded-block matrices — sliced from `_level_prep_matrices`, so results
match the XLA blocked path to bf16-matmul rounding — as ONE pallas_call
per level, gridded over the 128-wide output column blocks:

  per block k:
    DMA the full-height bf16 source column slab img[:, X0_k : X0_k+cwx]
    (double-buffered, 128-lane-aligned offsets)
    -> y pass: n_y static (128, hwin) x (hwin, cwx) MXU matmuls from
       16-aligned static row slices of the slab -> t strip (tp, cwx)
       bf16, VMEM-resident (never touches HBM)
    -> x pass: (tp, cwx) x (cwx, 384) bf16 matmul (the fused [g|xg|xxg]
       weight block embedded at the block's in-slab offset)
    -> five-channel combine epilogue -> out block (5, ph, 128)

Versus the earlier two-kernel split this removes the t HBM round trip
(write + 3x-amplified re-read), the per-step f32 slab DMAs (bf16
halves the bytes; the frame is uint8-valued so the cast is exact), the
3x re-read of source rows by the g/xg/xxg y sections, and the
in-kernel weight transpose (ym is stored pre-transposed). The y-pass
FLOPs are recomputed per column block (window overlap ~3x at level 0),
but the y pass is the cheap pass — the MXU trade wins.

Alignment is absorbed host-side exactly as in ops/resize_pallas: each
block's weights are shifted by (src0 - aligned src0) zero rows inside
one static window, so DMA offsets are lane-aligned and row slices are
16-aligned (the image is zero-row-padded to a 16-multiple height) with
no traced lane slices anywhere.

Opt-in via RIPC_PREP until the hardware A/B (tools/bench_prep.py /
bench_ab.py) validates it; interpret-mode tests assert agreement with
the XLA blocked path (tests/test_prep_pallas.py). Reference
counterpart: the per-level GaussianBlur + pyramid resize +
FarnebackPolyExp inside cv2.calcOpticalFlowFarneback (invoked at e.g.
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

TH = 128          # t rows per y matmul (block_band_windows block size)
_ROW_ALIGN = 16   # bf16 sublane tile: slab row slices stay aligned
_LANE_ALIGN = 128


@functools.lru_cache(maxsize=64)
def _prep_plan(args):
    """Static plan for the fused strip kernel at one level geometry.

    Returns (ok, X0 (nb,) i32 lane-aligned slab starts pre-divided by
    128, xm (nb, cwx, 384) f32 x weights embedded at in-slab offsets,
    cwx, ys0 tuple of static slab row offsets (16-aligned), ymT
    (n_y, TH, hwin) f32 pre-transposed y weights, hwin, h_pad)."""
    from ripcurrents_tpu.flow.farneback import (_banded_blocks,
                                                _banded_blocks_x3)
    from ripcurrents_tpu.ops.banded import aligned_block_windows
    h, w = args[0], args[1]
    h_pad = -(-h // _ROW_ALIGN) * _ROW_ALIGN
    yb = _banded_blocks("y", *args)
    xb = _banded_blocks_x3(*args)

    yp = aligned_block_windows(yb, h_pad, _ROW_ALIGN, TH)
    if yp is None or w % _LANE_ALIGN:
        return (False,) + (None,) * 7
    ys0, ym, hwin = yp
    ymT = np.ascontiguousarray(np.transpose(ym, (0, 2, 1)))

    srcw = max((wb.shape[0] for _, wb, _ in xb if wb is not None),
               default=1)
    cwx = -(-srcw // _LANE_ALIGN) * _LANE_ALIGN + _LANE_ALIGN
    if w < cwx:
        return (False,) + (None,) * 7
    nb = len(xb)
    x0 = np.zeros(nb, np.int32)
    xm = np.zeros((nb, cwx, 384), np.float32)
    for k, (s0, wb, _) in enumerate(xb):
        if wb is None:
            continue
        a = min((s0 // _LANE_ALIGN) * _LANE_ALIGN, w - cwx)
        off = s0 - a
        if off < 0 or off + wb.shape[0] > cwx:
            return (False,) + (None,) * 7
        xm[k, off:off + wb.shape[0], :wb.shape[1]] = wb
        x0[k] = a
    return (True, x0, xm, cwx, tuple(int(v) for v in ys0), ymT,
            int(hwin), h_pad)


def _plan_args(h, w, lh, lw, n, sigma, smooth_sz, blur_sigma, ph, pw,
               pad_off):
    return (h, w, lh, lw, n, sigma, smooth_sz, blur_sigma, ph, pw,
            tuple(pad_off))


def prep_pallas_ok(*args) -> bool:
    w, pw = args[1], args[9]
    if w % _LANE_ALIGN or pw % _LANE_ALIGN:
        return False
    return _prep_plan(_plan_args(*args))[0]


def poly_exp_level_pallas(img: jax.Array, args, ig11, ig03, ig33, ig55,
                          ps: int, out_dtype=jnp.float32,
                          interpret: bool = False) -> jax.Array:
    """(5, ph, pw) expansion of one level as one pallas_call. `args` is
    the _level_prep_matrices argument tuple; `ps` the y section stride
    (_y_section_stride(ph)). Caller must check prep_pallas_ok(*args)."""
    h, w = img.shape
    ph, pw = args[8], args[9]
    ok, x0, xm, cwx, ys0, ymT, hwin, h_pad = _prep_plan(_plan_args(*args))
    assert ok, "geometry not admissible; use the XLA blocked path"
    n_y = ymT.shape[0]
    tp = n_y * TH        # padded rows of the VMEM t strip (>= 3*ps)
    nb = xm.shape[0]

    src = img.astype(jnp.bfloat16)
    if h_pad != h:
        src = jnp.pad(src, ((0, h_pad - h), (0, 0)))

    def kernel(x0_ref, img_ref, ym_ref, xm_ref, out_ref, slab, t_s, sem):
        g = pl.program_id(0)

        def dma(i, s):
            # x0 is stored pre-divided by 128 so Mosaic can prove the
            # HBM lane offset divisible by the tiling (a raw SMEM value
            # carries no divisibility fact; `x * 128` does).
            return pltpu.make_async_copy(
                img_ref.at[:, pl.ds(x0_ref[i] * _LANE_ALIGN, cwx)],
                slab.at[s], sem.at[s])

        @pl.when(g == 0)
        def _():
            dma(0, 0).start()

        @pl.when(g + 1 < pl.num_programs(0))
        def _():
            dma(g + 1, jax.lax.rem(g + 1, 2)).start()

        sl = jax.lax.rem(g, 2)
        dma(g, sl).wait()
        for b in range(n_y):       # static row slices, 16-aligned
            t_s[b * TH:(b + 1) * TH] = jnp.dot(
                ym_ref[b], slab[sl, ys0[b]:ys0[b] + hwin],
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        big = jnp.dot(t_s[...], xm_ref[0],
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
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # x0
            pl.BlockSpec(memory_space=pl.ANY),              # img (HBM)
            pl.BlockSpec((n_y, TH, hwin), lambda g: (0, 0, 0)),
            pl.BlockSpec((1, cwx, 384), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((5, ph, 128), lambda g: (0, 0, g)),
        out_shape=jax.ShapeDtypeStruct((5, ph, pw), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, h_pad, cwx), jnp.bfloat16),
            pltpu.VMEM((tp, cwx), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(x0) // _LANE_ALIGN, src,
      jnp.asarray(ymT).astype(jnp.bfloat16),
      jnp.asarray(xm).astype(jnp.bfloat16))
