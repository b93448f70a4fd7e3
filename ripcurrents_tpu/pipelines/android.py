"""The Android/mobile rip-detection pipeline as a scan step.

Rewrite of rip_main (RipCurrents_android/app/src/main/jni/ripcurrents.cpp:
81-347): process 1 of every 3 frames, 2-frame flow averaging (STABILIZE=2),
cartToPolar, 100-bin top-3% threshold, classify + rescale, temporal
accumulation, duty visualization, and the 40x40 local-window hi/low duty
coincidence detector that marks rip pixels red after a 90-frame warmup.

The 3x frame skipping (jni:152-155) is a host-side decode policy (the
runner subsamples); this step consumes the frames it is handed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ripcurrents_tpu.analysis import classify as cls
from ripcurrents_tpu.config import (ANDROID_OVERLAY_WARMUP, FarnebackParams,
                                    HistogramParams, Thresholds)
from ripcurrents_tpu.ops import hist as histops
from ripcurrents_tpu.ops.image import bgr_to_gray, resize_area
from ripcurrents_tpu.ops.polar import flow_to_polar
from ripcurrents_tpu.pipelines.common import (FlowStream, ModeConfig,
                                              fb_preset, flow_stream_init,
                                              flow_stream_step, register)

STABILIZE = 2  # jni/ripcurrents.cpp:10


class AndroidState(NamedTuple):
    fstream: FlowStream
    stable: jax.Array        # (STABILIZE, H, W, 2) flow accumulation buffers
    accumulator: jax.Array   # (H, W) fast-pixel counts
    hist: jax.Array          # (bins,) int32 — CUMULATIVE across frames
    histsum: jax.Array       # () int32      (jni hist/histsum live outside
    i: jax.Array             # iteration counter (post-skip frames)
    #                          the loop and are never reset, jni:126-127)


def make_android(cfg: ModeConfig):
    fb = fb_preset(FarnebackParams.android(), cfg)
    hist_p = HistogramParams.android()
    thr = Thresholds(upper_init=100.0)

    def prep(raw):
        resized = resize_area(raw, (cfg.ydim, cfg.xdim))  # jni:141,163
        return resized, bgr_to_gray(resized)

    def init(first_raw) -> AndroidState:
        _, gray = prep(first_raw)
        return AndroidState(
            flow_stream_init(gray, fb),
            jnp.zeros((STABILIZE, cfg.ydim, cfg.xdim, 2), jnp.float32),
            jnp.zeros((cfg.ydim, cfg.xdim), jnp.float32),
            jnp.zeros(hist_p.bins, jnp.int32),
            jnp.array(0, jnp.int32),
            jnp.array(0, jnp.int32))

    def step(state: AndroidState, raw):
        resized, gray = prep(raw)
        i = state.i + 1
        flow_raw, fs = flow_stream_step(state.fstream, gray, fb)

        # STABILIZE-frame averaging (jni:178-182): every buffer accumulates
        # each frame's flow; the one indexed i%STABILIZE is consumed (mean of
        # the last STABILIZE flows) and reset.
        stable = state.stable + flow_raw[None]
        slot = i % STABILIZE
        current = stable[slot] * (1.0 / STABILIZE)
        stable = stable.at[slot].set(jnp.zeros_like(flow_raw))

        mag, ang = flow_to_polar(current)
        # The jni histogram is CUMULATIVE: hist/histsum are declared
        # outside the loop and never reset (jni:126-127,195-213), so the
        # top-3% threshold sharpens over the whole clip.
        dh, ds = histops.bin_1d(mag, hist_p)
        hist = state.hist + dh
        histsum = state.histsum + ds
        # Overflow guard: the jni's cumulative `int` counters would wrap
        # (UB) after ~2^31/(640*480) ~ 7k frames; halving both counters
        # past 2^30 preserves the top-3% quantile (the threshold depends
        # only on the hist/histsum RATIO; integer-floor drift is <= half
        # a count per bin against ~2^29 totals) and is a no-op on clips
        # short enough for the reference to have run correctly.
        big = histsum > (1 << 30)
        hist = jnp.where(big, hist // 2, hist)
        histsum = jnp.where(big, histsum // 2, histsum)
        upper = histops.upper_from_1d(hist, histsum, hist_p)

        rescaled, waterclass, fast = cls.classify_android(
            ang, mag, upper, thr.mid, thr.lower)
        accumulator = state.accumulator + fast

        out = cls.android_duty_viz(accumulator, i)
        rip_mask = cls.android_local_rip(out, localwin=20)

        # red overlay after warmup (jni:313-320)
        warm = i > ANDROID_OVERLAY_WARMUP
        red = jnp.where(warm & (rip_mask > 0), jnp.uint8(255),
                        resized[..., 2])
        overlay = resized.at[..., 2].set(red)

        return AndroidState(fs, stable, accumulator, hist, histsum,
                            i), overlay

    return init, step


@register("android")
def android_mode(cfg: ModeConfig):
    return make_android(cfg)
