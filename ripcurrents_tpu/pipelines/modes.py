"""All desktop reference modes as pure scan-able step functions.

One entry per compute_* driver in RipCurrents_main/main.cpp:92-1775. Each
factory returns (init, step); `step(state, raw_frame) -> (state, out_u8)`
is jit/scan friendly, so the runner processes whole frame chunks per
dispatch and the temporal state (ring buffers, particle positions, running
maxima) is an explicit pytree instead of C++ statics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ripcurrents_tpu.analysis import meanflow
from ripcurrents_tpu.analysis.shear import shear_to_color
from ripcurrents_tpu.analysis.motion import global_orientation_step
from ripcurrents_tpu.config import FarnebackParams
from ripcurrents_tpu.dynamics import advect
from ripcurrents_tpu.dynamics import particles as parts

from ripcurrents_tpu.flow.lucas_kanade import pyr_lk
from ripcurrents_tpu.flow.phasecorr import hanning_window, phase_correlate
from ripcurrents_tpu.ops.color import hsv_to_bgr, rgb_to_hsv
from ripcurrents_tpu.ops.colormap import apply_colormap
from ripcurrents_tpu.ops.image import bgr_to_gray
from ripcurrents_tpu.ops.warp import translate
from ripcurrents_tpu.pipelines.common import (FlowStream, ModeConfig,
                                              fb_preset, flow_stream_init,
                                              flow_stream_step,
                                              prep_frame, register)
from ripcurrents_tpu.viz import draw
from ripcurrents_tpu.viz.color import (color_wheel, shear_color_chart,
                                        vector_to_color)

BLUE = (100, 0, 0)    # CV_RGB(0,0,100)
RED = (0, 0, 100)     # CV_RGB(100,0,0)
GREEN = (0, 100, 0)   # CV_RGB(0,100,0)


# ---------------------------------------------------------------------------
# timelines (the built binary's default mode, main.cpp:446-524)
# ---------------------------------------------------------------------------

@register("timelines")
def timelines(cfg: ModeConfig):
    class State(NamedTuple):
        prev_gray: jax.Array
        timeline: parts.TimelineState
        framecount: jax.Array

    def init(first_raw):
        _, gray = prep_frame(first_raw, cfg, first=True)
        tl = parts.timeline_init(cfg.timeline_start, cfg.timeline_end,
                                 cfg.timeline_vertices)
        return State(gray, tl, jnp.array(0, jnp.int32))

    def step(state, raw):
        resized, gray = prep_frame(raw, cfg)
        tl = parts.timeline_step(state.timeline, state.prev_gray, gray, cfg.lk)
        out = resized
        out = draw.draw_polyline(out, tl.vertices, RED, thickness=2)
        out = draw.draw_circles(out, tl.vertices, 4, BLUE)
        return State(gray, tl, state.framecount + 1), out

    return init, step


# ---------------------------------------------------------------------------
# streaklines (main.cpp:92-175)
# ---------------------------------------------------------------------------

@register("streaklines")
def streaklines(cfg: ModeConfig):
    n, cap = cfg.max_streaklines, cfg.streakline_capacity

    class State(NamedTuple):
        prev_gray: jax.Array
        gens: jax.Array      # (n, 2)
        verts: jax.Array     # (n, cap, 2)
        count: jax.Array     # (n,)
        framecount: jax.Array

    def init(first_raw):
        _, gray = prep_frame(first_raw, cfg, first=True)
        key = jax.random.PRNGKey(cfg.seed)
        gens = jax.random.uniform(
            key, (n, 2),
            minval=jnp.zeros(2),
            maxval=jnp.array([cfg.xdim, cfg.ydim], jnp.float32))
        gens = jnp.floor(gens)
        verts = jnp.tile(gens[:, None, :], (1, cap, 1))
        return State(gray, gens, verts, jnp.ones(n, jnp.int32),
                     jnp.array(0, jnp.int32))

    def step(state, raw):
        resized, gray = prep_frame(raw, cfg)
        flat = state.verts.reshape(n * cap, 2)
        res = pyr_lk(state.prev_gray, gray, flat, cfg.lk)
        tracked = res.points.reshape(n, cap, 2)

        def advance(gen, verts, count, trk):
            st = parts.StreaklineState(gen, verts, count)
            st = parts.streakline_advance(st, trk, cfg.xdim, cfg.ydim)
            return st.vertices, st.count

        verts, count = jax.vmap(advance)(state.gens, state.verts,
                                         state.count, tracked)
        out = resized
        live = jnp.arange(cap)[None, :] < count[:, None]
        for i in range(n):
            out = draw.draw_circles(out, state.gens[i:i + 1], 3, GREEN)
            out = draw.draw_polyline(out, verts[i], RED, 1, valid=live[i])
            out = draw.draw_circles(out, verts[i], 2, BLUE, valid=live[i])
        return State(gray, state.gens, verts, count,
                     state.framecount + 1), out

    return init, step


# ---------------------------------------------------------------------------
# populationMap (main.cpp:790-868)
# ---------------------------------------------------------------------------

@register("populationMap")
def population_map(cfg: ModeConfig):
    class State(NamedTuple):
        prev_gray: jax.Array
        pop: parts.PopulationState
        framecount: jax.Array

    x0, y0, x1, y1 = cfg.population_rect

    def init(first_raw):
        _, gray = prep_frame(first_raw, cfg, first=True)
        pop = parts.population_init((x0, y0), (x1, y1),
                                    cfg.population_vertices,
                                    jax.random.PRNGKey(cfg.seed),
                                    cfg.population_faithful_bias)
        return State(gray, pop, jnp.array(0, jnp.int32))

    def step(state, raw):
        resized, gray = prep_frame(raw, cfg)
        pop = parts.population_step(state.pop, state.prev_gray, gray, cfg.lk)
        # translucent dispersal dots (ripcurrents_module.cpp:1188-1195)
        overlay = draw.draw_circles(resized, pop.vertices, 10, RED)
        out = draw.blend(overlay, resized, 0.5, 0.5)
        return State(gray, pop, state.framecount + 1), out

    return init, step


# ---------------------------------------------------------------------------
# discrete-streamline helpers (get_streamlines, ripcurrents_module.cpp:71-79)
# ---------------------------------------------------------------------------

def _advect_and_draw_trails(seeds, overlay_u8, flow, framecount, cfg,
                            dt=0.1, iters=100, upper=45.0):
    """Advance seeds through `flow`, drawing their trails onto the
    persistent 8-bit canvas with intensity framecount*255/totalframes."""
    res = advect.streamlines(seeds, flow, dt, iters, upper)
    shade = (framecount.astype(jnp.float32) * 255.0 / cfg.total_frames)
    shade = jnp.clip(shade, 0, 255).astype(jnp.uint8)
    for i in range(seeds.shape[0]):
        overlay_u8 = draw.draw_polyline(overlay_u8, res.points[i], shade, 1,
                                        valid=jnp.concatenate(
                                            [jnp.array([True]),
                                             res.seg_valid[i]]))
    return res.final, overlay_u8


def _composite_trails(frame_u8, overlay_u8):
    """applyColorMap(RAINBOW) + masked saturated add (get_streamlines)."""
    colored = apply_colormap(overlay_u8, "rainbow")
    mask = (overlay_u8 > 0)[..., None]
    added = jnp.minimum(frame_u8.astype(jnp.int32) + colored.astype(jnp.int32),
                        255).astype(jnp.uint8)
    return jnp.where(mask, added, frame_u8)


@register("streamlines")
def streamlines_mode(cfg: ModeConfig):
    fb = fb_preset(FarnebackParams.streamlines(), cfg)

    class State(NamedTuple):
        fstream: FlowStream
        seeds: jax.Array
        overlay: jax.Array
        framecount: jax.Array

    def init(first_raw):
        _, gray = prep_frame(first_raw, cfg, first=True)
        seeds = jnp.array([[300.0, 300.0]], jnp.float32)  # main.cpp:240
        return State(flow_stream_init(gray, fb), seeds,
                     jnp.zeros((cfg.ydim, cfg.xdim), jnp.uint8),
                     jnp.array(0, jnp.int32))

    def step(state, raw):
        resized, gray = prep_frame(raw, cfg)
        flow, fs = flow_stream_step(state.fstream, gray, fb)
        fc = state.framecount + 1
        seeds, overlay = _advect_and_draw_trails(
            state.seeds, state.overlay, flow, fc, cfg,
            upper=cfg.thresholds.upper_init)
        out = _composite_trails(resized, overlay)
        return State(fs, seeds, overlay, fc), out

    return init, step


@register("timelinesOnSubtractAverageVector")
def timelines_on_subtract(cfg: ModeConfig):
    fb = fb_preset(FarnebackParams.streamlines(), cfg)  # main.cpp:742 uses winsize 3

    class State(NamedTuple):
        fstream: FlowStream
        seeds: jax.Array
        overlay: jax.Array
        framecount: jax.Array

    def init(first_raw):
        _, gray = prep_frame(first_raw, cfg, first=True)
        key = jax.random.PRNGKey(cfg.seed)
        seeds = jnp.floor(jax.random.uniform(
            key, (cfg.n_streamline_seeds, 2),
            maxval=jnp.array([cfg.xdim, cfg.ydim], jnp.float32)))
        return State(flow_stream_init(gray, fb), seeds,
                     jnp.zeros((cfg.ydim, cfg.xdim), jnp.uint8),
                     jnp.array(0, jnp.int32))

    def step(state, raw):
        resized, gray = prep_frame(raw, cfg)
        flow, fs = flow_stream_step(state.fstream, gray, fb)
        flow = meanflow.subtract_average(flow)
        fc = state.framecount + 1
        seeds, overlay = _advect_and_draw_trails(
            state.seeds, state.overlay, flow, fc, cfg,
            upper=cfg.thresholds.upper_init)
        out = _composite_trails(resized, overlay)
        return State(fs, seeds, overlay, fc), out

    return init, step


@register("timelinesFarne")
def timelines_farne(cfg: ModeConfig):
    fb = fb_preset(FarnebackParams.subtract_average(), cfg)  # main.cpp:961: winsize 20

    class State(NamedTuple):
        fstream: FlowStream
        seeds: jax.Array
        overlay: jax.Array
        framecount: jax.Array

    def init(first_raw):
        _, gray = prep_frame(first_raw, cfg, first=True)
        # vertex line (100,100)-(500,100), 20 vertices (main.cpp:873-889)
        tl = parts.timeline_init((100.0, 100.0), (500.0, 100.0), 20)
        return State(flow_stream_init(gray, fb), tl.vertices[:20],
                     jnp.zeros((cfg.ydim, cfg.xdim), jnp.uint8),
                     jnp.array(0, jnp.int32))

    def step(state, raw):
        resized, gray = prep_frame(raw, cfg)
        flow, fs = flow_stream_step(state.fstream, gray, fb)
        fc = state.framecount + 1
        seeds, overlay = _advect_and_draw_trails(
            state.seeds, state.overlay, flow, fc, cfg,
            upper=cfg.thresholds.upper_init)
        out = resized
        out = draw.draw_circles(out, seeds[:1], 4, BLUE)
        out = draw.draw_polyline(out, seeds, RED, 2)
        out = draw.draw_circles(out, seeds[1:], 4, BLUE)
        out = draw.draw_frame_count(out, fc)
        return State(fs, seeds, overlay, fc), out

    return init, step


# ---------------------------------------------------------------------------
# mean-subtracted HSV modes (main.cpp:526-658, 1023-1192)
# ---------------------------------------------------------------------------

@register("subtructAverageVector", gray_input=True)
def subtract_average_vector(cfg: ModeConfig):
    fb = fb_preset(FarnebackParams.subtract_average(), cfg)

    class State(NamedTuple):
        fstream: FlowStream
        max_disp: jax.Array
        framecount: jax.Array

    def init(first_raw):
        _, gray = prep_frame(first_raw, cfg, first=True)
        return State(flow_stream_init(gray, fb), jnp.array(1e-6, jnp.float32),
                     jnp.array(0, jnp.int32))

    def step(state, raw):
        resized, gray = prep_frame(raw, cfg)
        flow, fs = flow_stream_step(state.fstream, gray, fb)
        flow = meanflow.subtract_average(flow)
        colored = vector_to_color(flow, state.max_disp)
        fc = state.framecount + 1
        out = draw.draw_frame_count(colored.bgr_u8, fc)
        return State(fs, colored.max_displacement, fc), out

    return init, step


@register("subtructAverageVectorWithWindow")
def subtract_average_windowed(cfg: ModeConfig):
    fb = fb_preset(FarnebackParams.windowed(), cfg)
    wheel = None  # built lazily at trace time

    class State(NamedTuple):
        fstream: FlowStream
        ring: meanflow.RingMean
        max_disp: jax.Array
        framecount: jax.Array

    def init(first_raw):
        _, gray = prep_frame(first_raw, cfg, first=True)
        ring = meanflow.ring_init(cfg.window_size,
                                  (cfg.ydim, cfg.xdim, 2))
        return State(flow_stream_init(gray, fb), ring, jnp.array(1e-6, jnp.float32),
                     jnp.array(0, jnp.int32))

    def step(state, raw):
        resized, gray = prep_frame(raw, cfg)
        flow, fs = flow_stream_step(state.fstream, gray, fb)
        ring = meanflow.ring_update(state.ring, flow)
        colored = vector_to_color(ring.mean, state.max_disp)
        fc = state.framecount + 1
        overlay = draw.draw_frame_count(colored.bgr_u8, fc)
        # color-wheel legend at the top-right (main.cpp:1097,1161-1162)
        legend = color_wheel(cfg.ydim // 8)
        overlay = draw.paste(overlay, legend, 0, cfg.xdim - cfg.ydim // 8)
        out = draw.blend(resized, overlay, 0.4, 0.6)
        return State(fs, ring, colored.max_displacement, fc), out

    return init, step


@register("shearRate")
def shear_rate(cfg: ModeConfig):
    fb = fb_preset(FarnebackParams.windowed(), cfg)

    class State(NamedTuple):
        fstream: FlowStream
        ring: meanflow.RingMean
        max_frob: jax.Array
        framecount: jax.Array

    def init(first_raw):
        _, gray = prep_frame(first_raw, cfg, first=True)
        ring = meanflow.ring_init(cfg.shear_window, (cfg.ydim, cfg.xdim, 2))
        return State(flow_stream_init(gray, fb), ring, jnp.array(1e-6, jnp.float32),
                     jnp.array(0, jnp.int32))

    def step(state, raw):
        resized, gray = prep_frame(raw, cfg)
        flow, fs = flow_stream_step(state.fstream, gray, fb)
        ring = meanflow.ring_update(state.ring, flow)
        sheared = shear_to_color(ring.mean, state.max_frob)
        fc = state.framecount + 1
        overlay = hsv_to_bgr(sheared.hsv_u8)
        overlay = draw.draw_frame_count(overlay, fc)
        # shear color-chart legend at the top-right (the reference pastes
        # its colorChart.jpg asset here, main.cpp:1458-1462; ours is
        # synthesized from the actual hue mapping, viz/color.py)
        legend = shear_color_chart(cfg.ydim // 12, cfg.xdim // 4)
        overlay = draw.paste(overlay, legend, 0,
                             cfg.xdim - cfg.xdim // 4)
        out = draw.blend(resized, overlay, 0.5, 0.5)
        return State(fs, ring, sheared.max_frobenius, fc), out

    return init, step


# ---------------------------------------------------------------------------
# temporal exposure modes (main.cpp:1195-1382)
# ---------------------------------------------------------------------------

@register("stabilizeTPU")
def stabilize_tpu(cfg: ModeConfig):
    """TPU-native feature stabilization (flow/feature_stab.py): Harris
    corners + patch matching (default) or the TPU-native AKAZE-class
    engine (--stab-features akaze: nonlinear scale space + det-Hessian +
    rotated binary descriptors, flow/akaze_tpu.py) + RANSAC homography +
    tiled-warp correction — the on-device counterpart of the reference's
    AKAZE pipeline (main.cpp:1556-1682; `--mode stabilize` keeps the
    host-OpenCV path). Like the reference, each frame is registered to
    the previous *corrected* frame (main.cpp:1659: prev = correction)."""
    from ripcurrents_tpu.flow.feature_stab import stabilize_pair

    class State(NamedTuple):
        prev_gray: jax.Array
        key: jax.Array
        framecount: jax.Array

    def init(first_raw):
        _, gray = prep_frame(first_raw, cfg, first=True)
        return State(gray, jax.random.PRNGKey(cfg.seed),
                     jnp.array(0, jnp.int32))

    def step(state, raw):
        resized, gray = prep_frame(raw, cfg)
        key, sub = jax.random.split(state.key)
        corrected, _h, _n = stabilize_pair(state.prev_gray, gray, resized,
                                           sub, features=cfg.stab_features)
        return State(bgr_to_gray(corrected), key,
                     state.framecount + 1), corrected

    return init, step


@register("averageHSV")
def average_hsv(cfg: ModeConfig):
    """averageHSV (ripcurrents_module.cpp:365-376, driven from the dead
    main_old.cpp:360 — dead code counts as capability, SURVEY section 1):
    ring mean of the last BUFFER_FRAME frames. Faithful quirk: despite the
    name, the reference never converts to HSV (its cvtColor is commented
    out at ripcurrents_module.cpp:367) — it averages the BGR subframe."""

    def init(first_raw):
        return meanflow.ring_init(cfg.average_buffer,
                                  (cfg.ydim, cfg.xdim, 3))

    def step(state, raw):
        resized, _ = prep_frame(raw, cfg)
        state = meanflow.ring_update(state, resized.astype(jnp.float32))
        out = jnp.clip(jnp.round(state.mean), 0, 255).astype(jnp.uint8)
        return state, out

    return init, step


@register("timex")
def timex(cfg: ModeConfig):
    class State(NamedTuple):
        sum_rgb: jax.Array
        framecount: jax.Array

    def init(first_raw):
        return State(jnp.zeros((cfg.ydim, cfg.xdim, 3), jnp.float32),
                     jnp.array(0, jnp.int32))

    def step(state, raw):
        resized, _ = prep_frame(raw, cfg)
        s = state.sum_rgb + resized.astype(jnp.float32)
        fc = state.framecount + 1
        avg = s / fc.astype(jnp.float32)
        out = jnp.clip(jnp.round(avg), 0, 255).astype(jnp.uint8)
        out = draw.draw_frame_count(out, fc)
        return State(s, fc), out

    return init, step


@register("brightColor")
def bright_color(cfg: ModeConfig):
    class State(NamedTuple):
        buffer: jax.Array   # (window, H, W, 3) uint8 HSV
        idx: jax.Array
        framecount: jax.Array

    def init(first_raw):
        return State(jnp.zeros((cfg.bright_window, cfg.ydim, cfg.xdim, 3),
                               jnp.uint8),
                     jnp.array(0, jnp.int32), jnp.array(0, jnp.int32))

    def step(state, raw):
        resized, _ = prep_frame(raw, cfg)
        # faithful quirk: the reference converts BGR data with RGB2HSV
        # (main.cpp:1303)
        hsv = rgb_to_hsv(resized)
        buf = state.buffer.at[state.idx].set(hsv)
        reduced = meanflow.bright_color_reduce(buf, cfg.bright_option)
        out = hsv_to_bgr(reduced)[..., ::-1]  # HSV2RGB on BGR layout, as ref
        fc = state.framecount + 1
        out = draw.draw_frame_count(out, fc)
        return State(buf, (state.idx + 1) % cfg.bright_window, fc), out

    return init, step


# ---------------------------------------------------------------------------
# stabilization modes
# ---------------------------------------------------------------------------

@register("phaseCorrelate")
def phase_correlate_mode(cfg: ModeConfig):
    rx, ry, rw, rh = cfg.phase_roi

    class State(NamedTuple):
        prev_resized: jax.Array  # compensated previous frame (BGR u8)
        framecount: jax.Array

    def init(first_raw):
        resized, _ = prep_frame(first_raw, cfg, first=True)
        return State(resized, jnp.array(0, jnp.int32))

    def step(state, raw):
        resized, _ = prep_frame(raw, cfg, first=True)  # INTER_AREA, main.cpp:1736
        pg = bgr_to_gray(state.prev_resized).astype(jnp.float32)
        cg = bgr_to_gray(resized).astype(jnp.float32)
        prev_crop = jax.lax.dynamic_slice(pg, (ry, rx), (rh, rw))
        cur_crop = jax.lax.dynamic_slice(cg, (ry, rx), (rh, rw))
        win = hanning_window(rh, rw)
        pc = phase_correlate(prev_crop, cur_crop, win)
        corrected = translate(resized, -pc.shift[0], -pc.shift[1])
        return State(corrected, state.framecount + 1), corrected

    return init, step


@register("globalOrientation", gray_input=True)
def global_orientation_mode(cfg: ModeConfig):
    """Exposes globalOrientation (ripcurrents_module.cpp:319-359) as a mode:
    motion-history image + global direction arrow + 30-px arrow grid."""
    class State(NamedTuple):
        prev_gray: jax.Array
        framecount: jax.Array

    def init(first_raw):
        _, gray = prep_frame(first_raw, cfg, first=True)
        return State(gray, jnp.array(0, jnp.int32))

    def step(state, raw):
        _, gray = prep_frame(raw, cfg)
        res = global_orientation_step(state.prev_gray, gray)
        img = jnp.clip(jnp.round(res.mhi_norm * 255.0), 0,
                       255).astype(jnp.uint8)
        out = jnp.stack([img, img, img], axis=-1)
        center = jnp.array([[cfg.xdim / 2.0, cfg.ydim / 2.0]])
        ar = res.angle_deg * jnp.pi / 180.0
        tip = center + jnp.stack([jnp.cos(ar) * 10.0,
                                  jnp.sin(ar) * 50.0])[None, :]
        out = draw.draw_circles(out, center, 3, (0, 215, 255))
        out = draw.draw_arrows(out, center, tip, jnp.array([True]),
                               (0, 215, 255), 2, 0.2)
        ys, xs = np.mgrid[0:cfg.ydim:30, 0:cfg.xdim:30]
        grid = jnp.asarray(
            np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32))
        ga = res.orientation.orientation_deg[
            grid[:, 1].astype(jnp.int32), grid[:, 0].astype(jnp.int32)]
        gr = ga * jnp.pi / 180.0
        tips = grid + jnp.stack([jnp.cos(gr), jnp.sin(gr)], -1) * 10.0
        out = draw.draw_circles(out, grid, 1, (0, 215, 0))
        out = draw.draw_arrows(out, grid, tips,
                               jnp.ones(grid.shape[0], bool), (0, 215, 0),
                               1, 0.4)
        return State(gray, state.framecount + 1), out

    return init, step


@register("flowRedPoints")
def flow_red_points(cfg: ModeConfig):
    """flowRedPoints (ripcurrents_module.cpp:732-749): an LK-advected red
    dot cloud seeded on a coarse grid."""
    from ripcurrents_tpu.config import LKParams

    class State(NamedTuple):
        prev_gray: jax.Array
        pts: jax.Array
        framecount: jax.Array

    def init(first_raw):
        _, gray = prep_frame(first_raw, cfg, first=True)
        step_px = max(cfg.xdim // 16, 8)
        ys, xs = np.mgrid[step_px // 2:cfg.ydim:step_px,
                          step_px // 2:cfg.xdim:step_px]
        pts = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1)
                          .astype(np.float32))
        return State(gray, pts, jnp.array(0, jnp.int32))

    def step(state, raw):
        resized, gray = prep_frame(raw, cfg)
        res = pyr_lk(state.prev_gray, gray, state.pts,
                     LKParams.red_points())
        out = draw.draw_circles(resized, res.points, 2, RED)
        return State(gray, res.points, state.framecount + 1), out

    return init, step


@register("averageVector", gray_input=True)
def average_vector_mode(cfg: ModeConfig):
    """The 300-frame counter-flow arrow detector (averageVector,
    ripcurrents_module.cpp:386-484) as a standalone mode."""
    fb = fb_preset(FarnebackParams.subtract_average(), cfg)

    class State(NamedTuple):
        fstream: FlowStream
        av: meanflow.AverageVectorState
        framecount: jax.Array

    def init(first_raw):
        _, gray = prep_frame(first_raw, cfg, first=True)
        return State(flow_stream_init(gray, fb), meanflow.average_vector_init(
            cfg.ydim, cfg.xdim, capacity=cfg.average_buffer),
            jnp.array(0, jnp.int32))

    def step(state, raw):
        resized, gray = prep_frame(raw, cfg)
        flow, fs = flow_stream_step(state.fstream, gray, fb)
        out_av = meanflow.average_vector(state.av, flow,
                                         cfg.thresholds.upper_init)
        img = hsv_to_bgr(out_av.hsv_u8)
        center = jnp.array([[cfg.xdim / 2.0, cfg.ydim / 2.0]])
        tip = center + jnp.stack([jnp.cos(out_av.global_angle_rad) * 10.0,
                                  jnp.sin(out_av.global_angle_rad) * 50.0])[None]
        img = draw.draw_circles(img, center, 3, (0, 215, 255))
        img = draw.draw_arrows(img, center, tip, jnp.array([True]),
                               (0, 215, 255), 2, 0.2)
        # counter-flow grid arrows (rows/cols 1..GRID_COUNT-1)
        gc = out_av.grid_angle_deg.shape[0]
        ch, cw = cfg.ydim // gc, cfg.xdim // gc
        ys, xs = np.mgrid[1:gc, 1:gc]
        anchors = jnp.asarray(np.stack([xs.ravel() * cw, ys.ravel() * ch],
                                       -1).astype(np.float32))
        ang = out_av.grid_angle_deg[1:, 1:].reshape(-1) * jnp.pi / 180.0
        tips = anchors + jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1) * 10.0
        mask = out_av.counter_mask[1:, 1:].reshape(-1)
        img = draw.draw_circles(img, anchors, 1, (0, 255, 0), valid=mask)
        img = draw.draw_arrows(img, anchors, tips, mask, (0, 255, 0), 1, 0.4)
        return State(fs, out_av.state, state.framecount + 1), img

    return init, step
