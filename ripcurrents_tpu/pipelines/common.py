"""Shared pipeline plumbing: mode registry, frame prep, config."""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ripcurrents_tpu.config import (FarnebackParams, HistogramParams,
                                    LKParams, Thresholds, XDIM, YDIM)
from ripcurrents_tpu.ops.image import bgr_to_gray, resize_area, resize_bilinear


@dataclasses.dataclass(frozen=True)
class ModeConfig:
    """Static configuration threaded into every mode factory.

    Every reference compile-time constant is a field here (the reference's
    'config system' is #defines and literals; SURVEY.md section 5)."""
    xdim: int = XDIM
    ydim: int = YDIM
    total_frames: int = 0        # CAP_PROP_FRAME_COUNT; 0 = filled by runner
    seed: int = 0                # RNG seed for random seed points
    thresholds: Thresholds = Thresholds()
    hist: HistogramParams = HistogramParams()
    lk: LKParams = LKParams.particles()
    # mode-specific knobs (defaults = reference values)
    timeline_start: Tuple[float, float] = (10.0, 150.0)
    timeline_end: Tuple[float, float] = (XDIM - 10.0, 400.0)
    timeline_vertices: int = 200
    max_streaklines: int = 5
    streakline_capacity: int = 256
    population_rect: Tuple[float, float, float, float] = (250, 150, 300, 200)
    population_vertices: int = 50
    population_faithful_bias: bool = True
    window_size: int = 10        # subtructAverageVectorWithWindow
    average_buffer: int = 300    # averageHSV/averageVector ring (BUFFER_FRAME)
    shear_window: int = 100
    timex_window: int = 500
    bright_window: int = 50
    bright_option: int = 0
    n_streamline_seeds: int = 20
    legacy_seeds: int = 250
    phase_roi: Tuple[int, int, int, int] = (XDIM - 50, 50, 50, 50)
    # Optional Farneback warp overrides applied on top of each mode's
    # call-site preset (None = keep the preset's choice).
    warp_impl: "str | None" = None
    warp_residual: "int | None" = None
    warp_subcol: "int | None" = None
    # stabilizeTPU feature engine: 'harris' (corners + patch descriptors)
    # or 'akaze' (TPU-native nonlinear-scale-space det-Hessian keypoints
    # + rotated binary descriptors, flow/akaze_tpu.py — the reference's
    # detector family, main.cpp:1598).
    stab_features: str = "harris"


def fb_preset(preset: FarnebackParams, cfg: "ModeConfig") -> FarnebackParams:
    """Apply ModeConfig warp overrides to a call-site preset."""
    kw = {}
    if cfg.warp_impl is not None:
        kw["warp_impl"] = cfg.warp_impl
    if cfg.warp_residual is not None:
        kw["warp_residual"] = cfg.warp_residual
        # An explicit residual override must actually take effect: the
        # engine prefers warp_residual_hires on >= 1 MP frames, which
        # would silently swallow the user's --warp-residual.
        kw["warp_residual_hires"] = None
    if cfg.warp_subcol is not None:
        kw["warp_subcol"] = cfg.warp_subcol
    return dataclasses.replace(preset, **kw) if kw else preset


def prep_frame(raw_bgr_u8: jax.Array, cfg: ModeConfig, first: bool = False):
    """resize + grayscale, as every reference mode loop does
    (main.cpp:142-144). First frames use INTER_AREA (main.cpp:125).

    Gray-input modes (see GRAY_INPUT) may be fed 2-D gray frames: the
    runner grayscales on the host so only a third of the bytes cross
    host->device; the color canvas slot is then None (those modes never
    read it)."""
    resize = resize_area if first else resize_bilinear
    if raw_bgr_u8.ndim == 2:
        if raw_bgr_u8.shape == (cfg.ydim, cfg.xdim):
            # runner host-preps gray frames to the target size already —
            # don't run identity resize matmuls per frame
            return None, raw_bgr_u8
        return None, resize(raw_bgr_u8, (cfg.ydim, cfg.xdim))
    resized = resize(raw_bgr_u8, (cfg.ydim, cfg.xdim))
    return resized, bgr_to_gray(resized)


class FlowStream(NamedTuple):
    """Scan-carried Farneback stream state: the previous frame's per-level
    polynomial expansions. Consecutive frame pairs share a frame, so each
    frame is expanded ONCE per stream instead of twice per pair (flow
    results are identical to the pairwise farneback() call the reference
    pattern implies — cv2 has no counterpart, it rebuilds both pyramids
    every call)."""
    exp: tuple


def flow_stream_init(gray: jax.Array, fb: FarnebackParams) -> "FlowStream":
    from ripcurrents_tpu.flow.farneback import farneback_precompute
    return FlowStream(farneback_precompute(gray, fb))


def flow_stream_step(fs: "FlowStream", gray: jax.Array,
                     fb: FarnebackParams):
    """-> (flow to the new frame, updated FlowStream)."""
    from ripcurrents_tpu.flow.farneback import farneback_stream
    flow, exp = farneback_stream(fs.exp, gray, fb)
    return flow, FlowStream(exp)


def detector_mask_scan(grays: jax.Array, fb: FarnebackParams,
                       hp=None, upper_init: float = 100.0,
                       warmup: int = 30) -> jax.Array:
    """Detector-core scan: the duty-cycle rip-mask path of the legacy
    pipeline (flow -> polar -> cumulative histogram -> top-5% UPPER ->
    classify -> accumulate -> 10%-duty mask; ripcurrents.cpp:300-439)
    WITHOUT the visualization extras (streamline field, trails, density
    scatter carry state, so the full legacy scan cannot DCE them).
    grays: (T, H, W) grayscale frames. Returns the final (H, W) uint8
    mask (255 = candidate rip zone). Used by the 1080p detector golden
    (tools/golden_detector_1080p.py) and bench.py's detector stage."""
    import jax as _jax

    from ripcurrents_tpu.analysis import classify as cls
    from ripcurrents_tpu.config import HistogramParams, Thresholds
    from ripcurrents_tpu.ops import hist as histops
    from ripcurrents_tpu.ops.polar import flow_to_polar

    hp = hp or HistogramParams()
    thr = Thresholds(upper_init=upper_init)
    h, w = grays.shape[1:]

    def step(state, gray):
        fs, hist, accumulator, fc = state
        fc = fc + 1
        flow, fs = flow_stream_step(fs, gray, fb)
        mag, ang = flow_to_polar(flow)
        hist = histops.accumulate(hist, histops.bin_flow(mag, ang, hp))
        th = histops.thresholds(hist, hp)
        res = cls.classify(ang, mag, th.upper, thr.mid, thr.lower,
                           th.upper2d, hp)
        accumulator = cls.accumulate_waves(accumulator, res.fast_mask,
                                           fc, warmup=warmup)
        viz = cls.duty_cycle_viz(accumulator, fc)
        return (fs, hist, accumulator, fc), viz.outmask

    empty = histops.FlowHistogram(
        jnp.zeros(hp.bins, jnp.int32), jnp.array(0, jnp.int32),
        jnp.zeros((hp.directions, hp.bins), jnp.int32),
        jnp.zeros(hp.directions, jnp.int32))
    state = (flow_stream_init(grays[0], fb), empty,
             jnp.zeros((h, w), jnp.float32), jnp.array(0, jnp.int32))
    scan = _jax.jit(lambda s, gs: _jax.lax.scan(step, s, gs))
    _, masks = scan(state, grays[1:])
    return masks[-1]


# registry: name -> factory(cfg) -> (init_fn, step_fn)
# init_fn(first_raw_frame) -> state
# step_fn(state, raw_frame) -> (state, out_frame_u8)
MODES: Dict[str, Callable] = {}

# Modes whose step consumes ONLY the grayscale frame (their output is a
# pure flow visualization, never the color canvas). The runner feeds these
# host-prepped 2-D gray frames — one third of the host->device transfer
# volume, which is the e2e bottleneck on PCIe-weak links (the reference
# has no counterpart: its UMat copy always ships the gray 640x480 Mat,
# main.cpp:495).
GRAY_INPUT: set = set()


def register(name: str, gray_input: bool = False):
    def deco(fn):
        MODES[name] = fn
        if gray_input:
            GRAY_INPUT.add(name)
        return fn
    return deco
