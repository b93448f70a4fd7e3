"""The legacy full rip-current detection pipeline as one scan step.

Rewrite of the original end-to-end detector (ripcurrents.cpp:53-540 —
present in the reference tree but not linked into its CMake build; it is
the richest pipeline and the capability target, SURVEY.md section 3.2):

frame -> Farneback (box, winsize 3) -> per-pixel streamline field +
displacement/distance/ratio JET views + particle-position density ->
discrete streamline trails -> polar -> cumulative histograms -> UPPER /
UPPER2d / prop_above_upper thresholds -> fast/slow classification ->
temporal wave accumulation (after frame 30) -> duty-cycle mask -> elliptical
morphology edges -> red-edge overlay.

Everything runs in one jit: per-pixel loops become array ops, the
sequential histogram walk becomes cumsum/argmax (ops/hist.py), morphology is
a max/min stencil, and all temporal state is an explicit pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ripcurrents_tpu.analysis import classify as cls
from ripcurrents_tpu.config import FarnebackParams, Thresholds
from ripcurrents_tpu.dynamics import advect
from ripcurrents_tpu.ops import hist as histops
from ripcurrents_tpu.ops import morphology as morph
from ripcurrents_tpu.ops.colormap import apply_colormap, normalize_to_u8
from ripcurrents_tpu.ops.color import hsv_to_bgr
from ripcurrents_tpu.ops.polar import flow_to_polar
from ripcurrents_tpu.pipelines.common import (FlowStream, ModeConfig,
                                              fb_preset, flow_stream_init,
                                              flow_stream_step,
                                              prep_frame, register)
from ripcurrents_tpu.pipelines.modes import (_advect_and_draw_trails,
                                             _composite_trails)
from ripcurrents_tpu.viz.color import histogram_wheel


class LegacyState(NamedTuple):
    fstream: FlowStream
    field: advect.FieldState          # per-pixel streamline field
    seeds: jax.Array                  # (N, 2) discrete streamline particles
    overlay: jax.Array                # (H, W) uint8 trail canvas
    hist: histops.FlowHistogram       # cumulative across frames
    upper: jax.Array                  # current UPPER estimate
    accumulator: jax.Array            # (H, W) fast-pixel counts
    framecount: jax.Array


class LegacyOutputs(NamedTuple):
    """One frame's outputs — mirrors the reference's imshow windows and
    three video writers."""
    overlay_bgr: jax.Array            # red-edge composite (video_borders)
    streamlines_bgr: jax.Array        # discrete trails (video_streamlines)
    density_bgr: jax.Array            # particle positions (streamlines_only)
    displacement_bgr: jax.Array       # JET displacement field
    distance_bgr: jax.Array           # JET total-motion field
    ratio_bgr: jax.Array              # JET displacement/distance ratio
    flow_hsv_bgr: jax.Array           # classified polar flow view
    duty_bgr: jax.Array               # accumulated duty visualization
    hist_wheel_bgr: jax.Array         # per-frame threshold wheel
    mask: jax.Array                   # (H, W) uint8 rip mask (pre-edges)


def make_legacy(cfg: ModeConfig):
    fb = fb_preset(FarnebackParams.legacy(), cfg)
    thr = Thresholds(upper_init=100.0)   # ripcurrents.cpp:145

    def init(first_raw) -> LegacyState:
        _, gray = prep_frame(first_raw, cfg, first=True)
        key = jax.random.PRNGKey(cfg.seed)
        seeds = jnp.floor(jax.random.uniform(
            key, (cfg.legacy_seeds, 2),
            maxval=jnp.array([cfg.xdim, cfg.ydim], jnp.float32)))
        p = cfg.hist
        empty = histops.FlowHistogram(
            jnp.zeros(p.bins, jnp.int32), jnp.array(0, jnp.int32),
            jnp.zeros((p.directions, p.bins), jnp.int32),
            jnp.zeros(p.directions, jnp.int32))
        return LegacyState(
            flow_stream_init(gray, fb),
            advect.init_field(cfg.ydim, cfg.xdim), seeds,
            jnp.zeros((cfg.ydim, cfg.xdim), jnp.uint8), empty,
            jnp.array(thr.upper_init, jnp.float32),
            jnp.zeros((cfg.ydim, cfg.xdim), jnp.float32),
            jnp.array(0, jnp.int32))

    def step(state: LegacyState, raw):
        resized, gray = prep_frame(raw, cfg)
        fc = state.framecount + 1
        flow, fs = flow_stream_step(state.fstream, gray, fb)

        # per-pixel streamline field (ripcurrents.cpp:229-231; dt=2, 1 iter)
        field = advect.streamline_field(state.field, flow, 2.0, 1,
                                        state.upper)
        disp_mag = jnp.sqrt(jnp.sum(field.disp ** 2, axis=-1))
        displacement = apply_colormap(normalize_to_u8(disp_mag), "jet")
        distance = apply_colormap(normalize_to_u8(field.dist), "jet")
        ratio = apply_colormap(
            normalize_to_u8(disp_mag / jnp.maximum(field.dist, 1e-12)), "jet")

        # particle position density scatter (ripcurrents.cpp:262-279)
        ys, xs = jnp.meshgrid(
            jnp.arange(cfg.ydim, dtype=jnp.float32),
            jnp.arange(cfg.xdim, dtype=jnp.float32), indexing="ij")
        px = jnp.floor(field.disp[..., 0] + xs).astype(jnp.int32)
        py = jnp.floor(field.disp[..., 1] + ys).astype(jnp.int32)
        ok = (px >= 1) & (py >= 1) & (px + 2 <= cfg.xdim) & (py + 2 <= cfg.ydim)
        density = jnp.zeros((cfg.ydim, cfg.xdim), jnp.float32)
        density = density.at[jnp.where(ok, py, 0).ravel(),
                             jnp.where(ok, px, 0).ravel()].max(
            ok.astype(jnp.float32).ravel())
        density_bgr = (density[..., None] * 255).astype(jnp.uint8) * \
            jnp.ones(3, jnp.uint8)

        # discrete streamlines (dt=2, 1 iteration per frame,
        # ripcurrents.cpp:283-285)
        seeds, overlay = _advect_and_draw_trails(
            state.seeds, state.overlay, flow, fc, cfg, dt=2.0, iters=1,
            upper=state.upper)
        streamlines_bgr = _composite_trails(resized, overlay)

        # polar + cumulative histograms -> thresholds
        mag, ang = flow_to_polar(flow)
        hist = histops.accumulate(state.hist,
                                  histops.bin_flow(mag, ang, cfg.hist))
        th = histops.thresholds(hist, cfg.hist)

        # per-frame threshold wheel (display_histogram is shown every
        # frame in the reference loop, ripcurrents.cpp:368)
        wheel = histogram_wheel(th.upper2d, th.prop_above_upper, cfg.hist,
                                size=min(cfg.ydim, cfg.xdim))

        # classification + display form (angle, sat, val/upper2d)
        res = cls.classify(ang, mag, th.upper, thr.mid, thr.lower,
                           th.upper2d, cfg.hist)
        flow_hsv = res.display_hsv
        flow_bgr = jnp.clip(jnp.round(
            hsv_to_bgr(flow_hsv.astype(jnp.float32)) * 255), 0,
            255).astype(jnp.uint8)

        # temporal accumulation of fast pixels (after frame 30)
        accumulator = cls.accumulate_waves(state.accumulator, res.fast_mask,
                                           fc, warmup=30)
        viz = cls.duty_cycle_viz(accumulator, fc)
        duty_bgr = jnp.clip(jnp.round(viz.out * 255), 0, 255).astype(jnp.uint8)

        # morphology edges + red burn-in
        edges = morph.rip_edges(viz.outmask)
        out = cls.burn_mask_red(resized, edges)

        new_state = LegacyState(fs, field, seeds, overlay, hist, th.upper,
                                accumulator, fc)
        return new_state, LegacyOutputs(out, streamlines_bgr, density_bgr,
                                        displacement, distance, ratio,
                                        flow_bgr, duty_bgr, wheel,
                                        viz.outmask)

    return init, step


@register("legacy")
def legacy_mode(cfg: ModeConfig):
    """Registry wrapper returning just the red-edge overlay frame."""
    init, step = make_legacy(cfg)

    def step_overlay(state, raw):
        state, outs = step(state, raw)
        return state, outs.overlay_bgr

    return init, step_overlay
