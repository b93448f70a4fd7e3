"""Block-banded decomposition of sparse-banded matmul matrices.

The composed level-prep / resize matrices used on the MXU are extremely
sparse-banded (a 128-wide output block only touches a short source
window), so a dense matmul would waste >90% of its FLOPs. This helper
slices each per-output-block window EXACTLY out of the dense matrix —
borders, resize phase and padding need no special cases — and is shared
by flow/farneback (_banded_blocks/_banded_blocks_x3) and
ops/image (_resize_bands_padded).
"""

from __future__ import annotations

import numpy as np


def aligned_block_windows(blocks, s_len: int, align: int, ncols: int):
    """Re-plan block_band_windows-style blocks at ALIGNED source offsets
    sharing one static window height — the form the manual-DMA Pallas
    kernels need (flow/prep_pallas, ops/resize_pallas): sublane/lane
    aligned offsets, one static slab shape.

    blocks: sequence of (src0, W_b | None, width) with W_b of shape
    (rows, <= ncols). Returns (src0s (n,) int32 — align multiples, mats
    (n, hwin, ncols) f32, hwin), or None when the source is too short
    for the shared window or not itself a multiple of `align` (the
    end-of-source clamp is only aligned when s_len is). The alignment
    shift is absorbed as zero rows at the top of each block's matrix;
    all-zero blocks keep zero matrices. hwin is the exact max over
    blocks of the (aligned start -> end) span, rounded up to align."""
    ends = [(wb.shape[0] + (s0 - (s0 // align) * align))
            for s0, wb, _ in blocks if wb is not None]
    hwin = -(-max(ends, default=1) // align) * align
    if s_len < hwin or s_len % align:
        return None
    src0s = np.zeros(len(blocks), np.int32)
    mats = np.zeros((len(blocks), hwin, ncols), np.float32)
    for i, (s0, wb, _) in enumerate(blocks):
        if wb is None:
            continue
        a = max(0, min((s0 // align) * align, s_len - hwin))
        mats[i, s0 - a:s0 - a + wb.shape[0], :wb.shape[1]] = wb
        src0s[i] = a
    return src0s, mats, hwin


def block_band_windows(m, bs: int = 128):
    """Decompose dense (src, out) matrices into per-output-block source
    windows: tuple of (src0, W_b (srcw, k*width) | None, width); None
    marks an all-zero output block (padded canvas margins — skipped at
    runtime). All windows share one width (the max nonzero span over all
    blocks and matrices) so the runtime matmuls have a single static
    shape.

    m may be one matrix or a sequence of same-shaped matrices: a
    sequence yields FUSED windows (the k matrices' blocks concatenated
    along the output axis, spans unioned) so one matmul per block
    applies all k maps — the farneback x3 pass."""
    ms = list(m) if isinstance(m, (list, tuple)) else [m]
    s_len, n_len = ms[0].shape
    spans = []
    for b0 in range(0, n_len, bs):
        nz = np.nonzero(np.any(
            [np.any(mm[:, b0:b0 + bs] != 0.0, axis=1) for mm in ms],
            axis=0))[0]
        spans.append((int(nz[0]), int(nz[-1]) + 1) if len(nz) else None)
    srcw = max((sp[1] - sp[0] for sp in spans if sp), default=1)
    out = []
    for i, sp in enumerate(spans):
        width = min(bs, n_len - i * bs)
        if sp is None:
            out.append((0, None, width))
            continue
        src0 = min(max(sp[0], 0), max(s_len - srcw, 0))
        out.append((src0, np.ascontiguousarray(np.concatenate(
            [mm[src0:src0 + srcw, i * bs:i * bs + width] for mm in ms],
            axis=1)), width))
    return tuple(out)
