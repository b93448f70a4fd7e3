"""Smoke + behavior tests for every registered pipeline mode.

Each mode's init/step runs under lax.scan on a tiny synthetic clip; outputs
must be valid frames and mode-specific invariants must hold. ModeConfig
shrinks windows/capacities so CPU test time stays sane.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ripcurrents_tpu.config import LKParams
from ripcurrents_tpu.pipelines.common import MODES, ModeConfig
from ripcurrents_tpu.pipelines import modes as _m  # noqa: F401
from ripcurrents_tpu.pipelines import legacy as _l  # noqa: F401
from ripcurrents_tpu.pipelines import android as _a  # noqa: F401
from ripcurrents_tpu.pipelines.legacy import make_legacy

CFG = ModeConfig(
    xdim=96, ydim=64, total_frames=8, seed=0,
    timeline_start=(5.0, 20.0), timeline_end=(90.0, 50.0),
    timeline_vertices=12, max_streaklines=2, streakline_capacity=8,
    population_rect=(20, 15, 40, 30), population_vertices=6,
    window_size=3, shear_window=4, timex_window=8, bright_window=4,
    n_streamline_seeds=4, legacy_seeds=8,
    lk=LKParams((15, 15), 2, 10, 0.1, 1e-4),
    phase_roi=(96 - 40, 10, 40, 40),
)


def _scan(mode_name, frames, cfg=CFG):
    init, step = MODES[mode_name](cfg)
    state = init(jnp.asarray(frames[0]))
    state, outs = jax.lax.scan(step, state, jnp.asarray(frames[1:]))
    return state, np.asarray(outs)


@pytest.mark.parametrize("mode", sorted(MODES))
def test_mode_produces_frames(mode, beach_frames):
    _, outs = _scan(mode, beach_frames)
    assert outs.shape == (7, CFG.ydim, CFG.xdim, 3)
    assert outs.dtype == np.uint8
    assert outs.max() > 0


def test_timelines_draws_moving_polyline(beach_frames):
    state, outs = _scan("timelines", beach_frames)
    # red polyline pixels exist (BGR red = channel 2 high, others low)
    red = (outs[..., 2] > 80) & (outs[..., 0] < 40)
    assert red.any(axis=(1, 2)).all()
    # vertices moved from initialization
    verts = np.asarray(state.timeline.vertices)
    init_y = np.linspace(20.0, 50.0, 13)
    assert np.abs(verts[:, 1] - init_y).mean() > 0.01


def test_timex_is_running_mean(beach_frames):
    # Exact-value check of main.cpp:1195-1263 semantics: frame t's output
    # is round(mean of the first t resized frames) + the counter overlay.
    from ripcurrents_tpu.pipelines.common import prep_frame
    from ripcurrents_tpu.viz import draw

    state, outs = _scan("timex", beach_frames)
    resized = np.stack([
        np.asarray(prep_frame(jnp.asarray(f), CFG)[0], np.float64)
        for f in beach_frames[1:]])
    csum = np.cumsum(resized, axis=0)
    for t in range(len(outs)):
        avg = np.clip(np.round(csum[t] / (t + 1)), 0, 255).astype(np.uint8)
        want = np.asarray(draw.draw_frame_count(jnp.asarray(avg),
                                                jnp.array(t + 1, jnp.int32)))
        np.testing.assert_array_equal(outs[t], want)


def test_legacy_full_outputs(beach_frames):
    cfg = CFG
    init, step = make_legacy(cfg)
    state = init(jnp.asarray(beach_frames[0]))
    state, outs = jax.lax.scan(step, state, jnp.asarray(beach_frames[1:]))
    assert outs.overlay_bgr.shape == (7, cfg.ydim, cfg.xdim, 3)
    assert outs.mask.dtype == jnp.uint8
    # histograms accumulate across frames
    assert int(state.hist.histsum) > 0
    # UPPER was re-derived from data (not the 100.0 init)
    assert float(state.upper) != 100.0
    # density view nonempty
    assert np.asarray(outs.density_bgr).max() > 0


def test_android_accumulates_and_masks(beach_frames):
    _, outs = _scan("android", beach_frames)
    assert outs.shape[0] == 7


def test_phase_correlate_compensates_translation(rng):
    # build a clip with pure integer jitter; compensation should cancel it
    base = rng.uniform(0, 255, (80, 120)).astype(np.float32)
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    frames = []
    for t, (dy, dx) in enumerate([(0, 0), (2, 3), (-1, 2), (3, -2)]):
        f = np.roll(base, (dy, dx), (0, 1))
        frames.append(np.stack([f, f, f], -1).astype(np.uint8))
    frames = np.stack(frames)
    cfg = dataclasses.replace(CFG, xdim=120, ydim=80,
                              phase_roi=(120 - 50, 10, 50, 50))
    init, step = MODES["phaseCorrelate"](cfg)
    state = init(jnp.asarray(frames[0]))
    state, outs = jax.lax.scan(step, state, jnp.asarray(frames[1:]))
    outs = np.asarray(outs)
    # compensated frames should all be close to the first frame (interior)
    ref = np.asarray(state.prev_resized)
    first = frames[0][10:-10, 10:-10]
    err = np.abs(outs[-1][10:-10, 10:-10].astype(int) - first.astype(int))
    assert err.mean() < 12.0


def test_warp_residual_override_beats_hires_schedule():
    """--warp-residual must take effect even on >= 1 MP frames: fb_preset
    has to clear warp_residual_hires, or the engine's hires schedule
    silently swallows the user's explicit residual budget."""
    import dataclasses as dc

    from ripcurrents_tpu.config import FarnebackParams
    from ripcurrents_tpu.pipelines.common import ModeConfig, fb_preset
    cfg = dc.replace(CFG, warp_residual=6)
    p = fb_preset(FarnebackParams.windowed(), cfg)
    assert p.warp_residual == 6
    assert p.warp_residual_hires is None


def test_warp_subcol_reaches_engine_params():
    """--warp-subcol plumbs through fb_preset into FarnebackParams (and
    stays None, the per-width default, when unset)."""
    import dataclasses as dc

    from ripcurrents_tpu.config import FarnebackParams
    from ripcurrents_tpu.pipelines.common import ModeConfig, fb_preset
    assert fb_preset(FarnebackParams.legacy(), CFG).warp_subcol == 128
    assert fb_preset(FarnebackParams.windowed(), CFG).warp_subcol is None
    cfg = dc.replace(CFG, warp_subcol=256)
    p = fb_preset(FarnebackParams.legacy(), cfg)
    assert p.warp_subcol == 256


def test_shear_rate_legend_pasted(beach_frames):
    """The shearRate mode must overlay the shear color-chart legend at the
    top-right (the reference pastes its colorChart.jpg there,
    main.cpp:1458-1462) — verify the output corner equals the blend of
    the resized frame with the chart."""
    from ripcurrents_tpu.viz.color import shear_color_chart
    _, outs = _scan("shearRate", beach_frames)
    ch, cw = CFG.ydim // 12, CFG.xdim // 4
    chart = np.asarray(shear_color_chart(ch, cw)).astype(np.float32)
    corner = outs[-1][:ch, CFG.xdim - cw:].astype(np.float32)
    # out = 0.5*resized + 0.5*overlay, overlay corner == chart
    resid = corner - 0.5 * chart
    assert (resid >= -1).all() and (resid <= 0.5 * 255 + 1).all()
    # the chart hue ramp must dominate the corner: red channel rises
    # left->right in the legend (hue 128 -> 0)
    reds = chart[ch // 2, :, 2]
    assert reds[-1] > reds[0]
