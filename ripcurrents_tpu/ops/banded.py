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
