"""Configuration dataclasses.

The reference hard-codes all of these as #defines and per-call-site literals
(RipCurrents_main/ripcurrents.hpp:4-13, main.cpp mode bodies). Here every
constant is an explicit, overridable field, and each reference call-site's
parameter set is available as a named preset.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# Working resolution all reference modes resize to
# (reference: ripcurrents.hpp:4-5).
XDIM = 640
YDIM = 480


@dataclasses.dataclass(frozen=True)
class FarnebackParams:
    """Parameters of Farneback dense optical flow.

    Field semantics match cv2.calcOpticalFlowFarneback so that every
    reference call site maps 1:1.
    """

    pyr_scale: float = 0.5
    levels: int = 2          # coarsest level index; sizes = round(dim*scale^k), k=levels..0
    winsize: int = 15
    iterations: int = 3
    poly_n: int = 15
    poly_sigma: float = 1.2
    gaussian: bool = True    # OPTFLOW_FARNEBACK_GAUSSIAN; False = box blur
    # TPU warp strategy (flow/farneback.py):
    #  - warp_budget None  -> exact gather (unbounded, slow on TPU; the
    #    cv2-parity reference path)
    #  - warp_impl 'tiled' -> per-tile base + residual shift decomposition
    #    (unbounded smooth motion, exact within warp_residual px of the
    #    tile-mean displacement) — the production default
    #  - warp_impl 'shift' -> flat shift decomposition, exact for
    #    |flow| <= warp_budget
    #  - warp_impl 'pallas' -> hand-written Pallas kernel of 'shift'
    #  - warp_impl 'fused'  -> Pallas kernel fusing the tiled warp with the
    #    whole matrix update (production default; falls back to 'tiled'
    #    off-TPU and under spatial sharding)
    warp_budget: "int | None" = 16
    warp_impl: str = "fused"
    # Residual budget of the tiled/fused warp: the per-pixel deviation from
    # the block-mean base resolved by the (2b+1)^2-tap shift decomposition.
    # An int applies to every pyramid level; a tuple is indexed by level
    # (finest first, last entry reused for coarser levels) — the finest
    # level dominates the tap cost, while coarse levels set the bases the
    # fine level refines, so e.g. (1, 2) keeps EPE well under the 0.5 px
    # bar at ~2.5x less fine-level warp work than uniform 2.
    # Raise to 6 for near-exact parity (0.03 px).
    warp_residual: "int | Tuple[int, ...]" = 2
    # High-resolution override: frames with h*w >= warp_hires_px use this
    # residual schedule instead (None = never override). At >= 1 MP the
    # per-(tile x subcolumn) base blocks cover a much smaller fraction of
    # the scene, so per-pixel deviation from the block mean shrinks and
    # bres=1 on the fine levels stays accurate: EPE vs cv2 0.32 px mean at
    # 1080p-class content (bound 0.5) at ~1.5x the frame rate of uniform 2
    # (474 vs 314 fps @1080p on v5e). Sub-MP frames (including the 640x480
    # reference working resolution) keep the exact-tradeoff bres=2 path.
    # Coarsest-level budget 2 -> 1 (r5 ladder, tools/bres_ladder.py on
    # v5e 2026-08-21): EPE identical to 4 decimals on BOTH the generic
    # and the high-shear rip 1080p clips (0.3136 / 0.7097 px) at +2.3%
    # fps (914.8 vs 894.5) — the coarsest level's extra residual pass
    # was pure cost. Dropping the FINEST level to 0 breaks the 0.5 px
    # generic gate (0.7325 px) and is not licensed.
    warp_residual_hires: "int | Tuple[int, ...] | None" = (1, 1, 1)
    warp_hires_px: int = 1_000_000
    warp_tile: Tuple[int, int] = (64, 256)  # (th, tw) of the 'tiled' warp
    # Fused-warp subcolumn width (None = widest 128-multiple <= 384
    # dividing the padded width). Narrower subcolumns (128) track local
    # motion tighter — a smaller bres may hold detector accuracy at a
    # fraction of the tap cost ((2b+1)^2 taps vs ~1.8x more rolls); an
    # A/B knob for the detector presets on hardware.
    warp_subcol: "int | None" = None
    # High-resolution subcolumn override (same gating as
    # warp_residual_hires: frames with h*w >= warp_hires_px). At >= 1 MP
    # fewer, WIDER subcolumns shed per-block halo traffic (each block
    # rolls sw+256 lanes, so 3 x 640-wide blocks move ~16% fewer lanes
    # than 5 x 384): measured +1.6% fps at 1080p windowed with EPE vs cv2
    # unchanged (0.2824 -> 0.2830 px, p95 equal; A/B 2026-08-19). Sub-MP
    # frames keep warp_subcol. None = no override. Widths that do not
    # divide a level's padded width fall back per level (_subcol_width).
    warp_subcol_hires: "int | None" = 640
    # High-resolution ITERATION schedule (same gating as
    # warp_residual_hires: frames with h*w >= warp_hires_px use it; None
    # = cv2-exact `iterations` at every level). A tuple is indexed by
    # pyramid level, FINEST first, last entry reused for coarser levels.
    # Rationale: the BASELINE bar is EPE < 0.5 px vs cv2 — not iteration
    # parity — and at >= 1 MP the coarse levels converge in fewer
    # passes while costing a fixed ~0.31 ms per application. Any
    # schedule shipped here must carry an on-chip EPE verdict in
    # docs/DESIGN.md (and the detector golden for detector presets).
    iters_hires: "int | Tuple[int, ...] | None" = None
    # Polynomial expansion: 'banded' runs the 31-tap correlations as MXU
    # banded matmuls (~5x faster at 1080p, bf16 matmul passes on TPU);
    # 'shifted' is the full-f32 VPU chain.
    poly_impl: str = "banded"

    # Reference call-site presets. The small-window presets (winsize 3/5)
    # produce chaotic large flows at weak-texture pixels, so the detector
    # presets run the fused kernels at a WIDER residual budget (bres=4:
    # rip-mask IoU 0.907 vs the cv2 reference pipeline on the golden clip
    # — above the 0.797 the old XLA-tiled/bres6 fallback scored — at
    # ~1050 fps 640x480 on v5e, ~3.5x the tiled path). Off-TPU they fall
    # back to XLA tiled at the same budget (IoU 0.806). On >= 1 MP frames
    # they switch to NARROW 128-wide subcolumn bases at bres=2
    # (warp_subcol=128 + warp_residual_hires=2): at that size the narrow
    # block means track local motion tighter than wide-block bres=4, and
    # the 1080p END-TO-END detector golden (tools/golden_detector_1080p,
    # v5e 2026-08-19, 48-frame rip clip vs the cv2 transcription of
    # ripcurrents.cpp:414-439) adjudicated the residual ladder: duty-mask
    # IoU 0.9863 at bres=2 vs 0.9872 at bres=3 vs 0.9643 for the EXACT
    # gather warp — the bres=2 p95 EPE tail (0.51 px, bench_subcol) is
    # fully absorbed by the top-5% histogram threshold, so the +60% fps
    # config ships. Sub-MP frames (the 640x480 reference resolution)
    # already run 128-wide subcolumns, where bres=4 remains the accuracy
    # winner (bres=3 there: EPE 0.355 vs 0.183).
    @staticmethod
    def streamlines() -> "FarnebackParams":
        # main.cpp:264 — (0.5, 2, 3, 2, 15, 1.2, GAUSSIAN)
        return FarnebackParams(0.5, 2, 3, 2, 15, 1.2, True,
                               warp_residual=4, warp_residual_hires=2,
                               warp_subcol=128, warp_subcol_hires=128)

    @staticmethod
    def subtract_average() -> "FarnebackParams":
        # main.cpp:609 — (0.5, 2, 20, 3, 15, 1.2, GAUSSIAN)
        return FarnebackParams(0.5, 2, 20, 3, 15, 1.2, True)

    @staticmethod
    def windowed() -> "FarnebackParams":
        # main.cpp:1119, :1481 — (0.5, 2, 10, 3, 15, 1.2, GAUSSIAN).
        # >= 1 MP frames run ONE iteration per pyramid level
        # (iters_hires=(1, 1, 1)): adjudicated on v5e 2026-08-20/21
        # (tools/bench_iters.py, two 1080p content types vs cv2) —
        # 897 fps vs 530 at cv2-exact iterations and 815 at round-3's
        # (1,2,2), with mean EPE 0.314 px on the bench clip (budget
        # 0.5; cv2-exact scores 0.283) and STRICTLY BETTER high-shear
        # rip-clip EPE than both (0.710/2.140 mean/p95 vs 0.796/2.452
        # at (1,2,2) and 1.041/3.449 at cv2-exact): each fused-warp
        # pass compounds ~0.2 px of clamped-residual approximation, so
        # a single pass per level is the measured accuracy optimum of
        # this engine at >= 1 MP, not an accuracy trade at all on the
        # content the detector exists for. Sub-MP frames (the 640x480
        # reference resolution) keep cv2-exact iteration counts.
        # docs/DESIGN.md has the full schedule table; the bench quality
        # stage records the EPE guard rows every run. Set
        # iters_hires=None for cv2-exact iteration parity.
        return FarnebackParams(0.5, 2, 10, 3, 15, 1.2, True,
                               iters_hires=(1, 1, 1))

    @staticmethod
    def legacy() -> "FarnebackParams":
        # ripcurrents.cpp:215 — (0.5, 2, 3, 2, 15, 1.2, 0)
        return FarnebackParams(0.5, 2, 3, 2, 15, 1.2, False,
                               warp_residual=4, warp_residual_hires=2,
                               warp_subcol=128, warp_subcol_hires=128)

    @staticmethod
    def android() -> "FarnebackParams":
        # RipCurrents_android jni/ripcurrents.cpp:167,171 — (0.5, 3, 5, 3, 15, 1.2, 0)
        return FarnebackParams(0.5, 3, 5, 3, 15, 1.2, False,
                               warp_residual=4, warp_residual_hires=2,
                               warp_subcol=128, warp_subcol_hires=128)


@dataclasses.dataclass(frozen=True)
class LKParams:
    """Pyramidal Lucas-Kanade sparse flow parameters (cv2.calcOpticalFlowPyrLK)."""

    win: Tuple[int, int] = (50, 50)
    levels: int = 3          # maxLevel; pyramid has levels+1 images
    max_iters: int = 30
    eps: float = 0.1         # TermCriteria epsilon (un-squared, as passed to cv2)
    min_eig_threshold: float = 1e-4

    @staticmethod
    def particles() -> "LKParams":
        # Streakline.cpp:32, ripcurrents_module.cpp:775,1162 —
        # Size(50,50), 3 levels, 30 iters, eps 0.1, minEig 1e-4
        return LKParams((50, 50), 3, 30, 0.1, 1e-4)

    @staticmethod
    def dense_grid() -> "LKParams":
        # ripcurrents_module.cpp:716 — Size(21,21), 3, 30 iters, eps 0.01
        return LKParams((21, 21), 3, 30, 0.01, 1e-4)

    @staticmethod
    def red_points() -> "LKParams":
        # ripcurrents_module.cpp:738 — Size(21,21), 3, 30 iters, eps 0.1
        return LKParams((21, 21), 3, 30, 0.1, 1e-4)


@dataclasses.dataclass(frozen=True)
class HistogramParams:
    """Polar flow-magnitude histogram used to derive motion thresholds.

    Reference: ripcurrents.hpp:7-9 and create_histogram
    (ripcurrents_module.cpp:89-144).
    """

    bins: int = 50           # HIST_BINS
    directions: int = 36     # HIST_DIRECTIONS
    resolution: int = 20     # HIST_RESOLUTION (bins per unit magnitude)
    top_frac: float = 0.05   # top-5% defines UPPER
    upper2d_floor: float = 0.01

    @staticmethod
    def android() -> "HistogramParams":
        # jni/ripcurrents.cpp:11,195-213 — 100 bins, resolution 10, top 3%
        return HistogramParams(bins=100, directions=36, resolution=10,
                               top_frac=0.03)


@dataclasses.dataclass(frozen=True)
class Thresholds:
    """Speed classification thresholds (main.cpp:208-212, ripcurrents.cpp:142-149)."""

    lower: float = 0.2
    mid: float = 0.5
    upper_init: float = 45.0   # main.cpp modes; legacy pipeline uses 100.0


# Misc reference constants
BUFFER_FRAME = 300       # ripcurrents.hpp:11 — ring buffer length for averages
GRID_COUNT = 30          # ripcurrents.hpp:13 — arrows per row/col in averageVector
ACCUM_WARMUP_FRAMES = 30     # ripcurrents.cpp:414 — accumulate fast pixels after this
ANDROID_OVERLAY_WARMUP = 90  # jni/ripcurrents.cpp:313 — draw overlay after this
