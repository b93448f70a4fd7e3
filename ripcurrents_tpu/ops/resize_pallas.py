"""Single-kernel Pallas form of the padded channels-first flow upsample.

`ops.image.resize_bilinear_cf_padded` runs the level-to-level Farneback
flow upsample as ~25 per-128-block XLA einsums + two concatenates; the
XLA scheduling around those small ops costs ~0.26 ms/frame at 1080p
(docs/DESIGN.md per-stage table) for ~20 MFLOP of actual math. This
module runs the SAME per-block banded matmuls — built from the same
`_resize_matrices_padded` dense matrices, so results are bit-identical —
as ONE pallas_call over output row blocks:

  per grid step (one TH-row output block):
    DMA the source row slab (2, HWIN_y, SPw) at an 8-aligned offset
    -> y-pass matmul (TH, HWIN_y) x (HWIN_y, SPw) on the MXU
    -> per output 128-lane block: (TH, HWIN_x) x (HWIN_x, 128) matmul
       against a 128-aligned window of the y result
    -> write (2, TH, 128*n_x)

Alignment is absorbed host-side: each block's matrix is shifted by the
(src0 - aligned src0) rows/lanes and zero-padded to one static window, so
the kernel's DMA offsets are sublane-aligned and its lane slices are
static and 128-aligned (traced lane offsets have no Mosaic lowering).

Used by the Farneback pyramid driver (flow/farneback.py) behind the
RIPC_UPS opt-in until the hardware A/B (tools/bench_ab.py) validates it;
interpret-mode tests assert exact equality with the XLA path
(tests/test_resize_pallas.py). Reference counterpart: the
cv::resize(INTER_LINEAR)+scale of the flow pyramid inside
cv2.calcOpticalFlowFarneback (invoked at e.g.
RipCurrents_main/main.cpp:1119); exactness vs cv2 is inherited from the
shared resize matrices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ripcurrents_tpu.ops.image import _resize_matrices_padded

TH = 128          # output row-block height (f32 sublane multiple)
_SUB_ALIGN = 8    # DMA row-offset alignment (f32 sublanes)
_LANE_ALIGN = 128


@functools.lru_cache(maxsize=64)
def _plan(src_true, dst_true, src_pad, dst_pad, scale):
    """Aligned per-block window plans for both passes: the shared
    block_band_windows -> aligned_block_windows pipeline (ops/banded) —
    the same planner flow/prep_pallas uses. aligned_block_windows
    returns None when the source is too short for the shared window or
    misaligned (the end-of-source clamp is only aligned when the source
    extent itself is; real pyramid layouts always are — row counts are
    8-multiples, widths 128-multiples), and the caller then falls back
    to the XLA path."""
    from ripcurrents_tpu.ops.banded import (aligned_block_windows,
                                            block_band_windows)
    if dst_pad[1] % 128:
        # the kernel's x-pass writes static 128-lane output slices; a
        # misaligned destination width must fall back to the XLA path
        # rather than fail at pallas trace time
        return (False,) + (None,) * 6
    my_p, mx_p = _resize_matrices_padded(src_true, dst_true, src_pad,
                                         dst_pad, scale)
    yp = aligned_block_windows(block_band_windows(my_p, TH),
                               src_pad[0], _SUB_ALIGN, TH)
    xp = aligned_block_windows(block_band_windows(mx_p, 128),
                               src_pad[1], _LANE_ALIGN, 128)
    if yp is None or xp is None:
        return (False,) + (None,) * 6
    ys0, ym, hwin_y = yp
    xs0, xm, hwin_x = xp
    return (True, ys0, ym, hwin_y, tuple(int(s) for s in xs0), xm,
            hwin_x)


def resize_cf_padded_pallas_ok(src_pad: tuple[int, int],
                               src_true, dst_true, dst_pad,
                               scale: float = 1.0) -> bool:
    return _plan(tuple(src_true), tuple(dst_true), tuple(src_pad),
                 tuple(dst_pad), float(scale))[0]


def resize_bilinear_cf_padded_pallas(img: jax.Array,
                                     src_true: tuple[int, int],
                                     dst_true: tuple[int, int],
                                     dst_pad: tuple[int, int],
                                     scale: float = 1.0,
                                     interpret: bool = False) -> jax.Array:
    """Drop-in for ops.image.resize_bilinear_cf_padded (C=2 flow arrays),
    one pallas_call. Caller must check resize_cf_padded_pallas_ok."""
    c, sph, spw = img.shape
    dph, dpw = dst_pad
    ok, ys0, ym, hwin_y, xs0, xm, hwin_x = _plan(
        tuple(src_true), tuple(dst_true), (sph, spw), tuple(dst_pad),
        float(scale))
    assert ok, "source too small for the aligned windows; use the XLA path"
    n_y = ym.shape[0]
    n_x = xm.shape[0]

    def kernel(ys0_ref, flow_ref, ym_ref, xm_ref, out_ref, slab, sem):
        g = pl.program_id(0)

        # double-buffered source-slab DMA: step g+1's copy issues before
        # step g's matmuls so the HBM read hides behind the MXU work
        def dma(i, s):
            # ys0 is stored pre-divided by _SUB_ALIGN: Mosaic must PROVE
            # the HBM slice row offset divisible by the (8,128) tiling,
            # and a raw SMEM value carries no divisibility fact while
            # `x * 8` does (the plan guarantees 8-aligned offsets).
            return pltpu.make_async_copy(
                flow_ref.at[:, pl.ds(ys0_ref[i] * _SUB_ALIGN, hwin_y), :],
                slab.at[s], sem.at[s])

        @pl.when(g == 0)
        def _():
            dma(0, 0).start()

        @pl.when(g + 1 < pl.num_programs(0))
        def _():
            dma(g + 1, jax.lax.rem(g + 1, 2)).start()

        sl = jax.lax.rem(g, 2)
        dma(g, sl).wait()
        ymat = ym_ref[0]                                   # (hwin_y, TH)
        # y pass: one MXU matmul per channel over the slab.
        t = [jnp.dot(ymat.T, slab[sl, ch],
                     preferred_element_type=jnp.float32)   # (TH, SPw)
             for ch in range(c)]
        # x pass: static 128-aligned windows of t, one matmul per
        # output lane block (same banded blocks as the XLA path).
        for j in range(n_x):
            xmat = xm_ref[j]                               # (hwin_x, 128)
            for ch in range(c):
                win = jax.lax.slice(t[ch], (0, xs0[j]),
                                    (TH, xs0[j] + hwin_x))
                out_ref[ch, :, j * 128:(j + 1) * 128] = jnp.dot(
                    win, xmat, preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(n_y,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # ys0
            pl.BlockSpec(memory_space=pl.ANY),              # flow (HBM)
            pl.BlockSpec((1, hwin_y, TH), lambda g: (g, 0, 0)),  # ym
            pl.BlockSpec((n_x, hwin_x, 128), lambda g: (0, 0, 0)),  # xm
        ],
        out_specs=pl.BlockSpec((c, TH, dpw), lambda g: (0, g, 0)),
        out_shape=jax.ShapeDtypeStruct((c, dph, dpw), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, c, hwin_y, spw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray(ys0) // _SUB_ALIGN, img.astype(jnp.float32),
      jnp.asarray(ym), jnp.asarray(xm))
