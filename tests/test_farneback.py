"""Golden tests: Farneback engine vs cv2.calcOpticalFlowFarneback.

Accuracy notes: the implementation is numerically exact (median EPE ~0)
against OpenCV; the mean is dominated by a small tail of ill-conditioned
pixels (normal-equation determinant ~ 0) where both implementations emit
float-noise-amplified values, especially for the tiny winsize=3 presets the
reference uses (main.cpp:264). Bounds below reflect that: tight medians for
every preset, tight means for the well-conditioned winsize>=10 presets.
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from ripcurrents_tpu.config import FarnebackParams
from ripcurrents_tpu.flow.farneback import farneback


def _epe(got, want):
    return np.sqrt(((got - want) ** 2).sum(-1))


def _cv2_flow(f0, f1, p):
    flags = cv2.OPTFLOW_FARNEBACK_GAUSSIAN if p.gaussian else 0
    return cv2.calcOpticalFlowFarneback(
        f0, f1, None, p.pyr_scale, p.levels, p.winsize, p.iterations,
        p.poly_n, p.poly_sigma, flags)


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(88)
    h, w = 120, 160
    base = rng.uniform(0, 255, (h, w)).astype(np.float32)
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    yy = np.mgrid[0:h, 0:w][0].astype(np.float32)
    def make(t):
        wave = 60 * np.sin(2 * np.pi * (yy / 24.0 - t * 0.11)) * (yy / h)
        drift = np.roll(base, shift=t, axis=1)
        return np.clip(drift * 0.7 + wave + 60, 0, 255).astype(np.uint8)
    return make(0), make(1)


@pytest.mark.parametrize("preset,mean_bound", [
    (FarnebackParams.subtract_average, 0.5),   # winsize 20
    (FarnebackParams.windowed, 0.5),           # winsize 10
])
def test_epe_well_conditioned(pair, preset, mean_bound):
    """Mean bound matches the BASELINE.md parity bar (<0.5 px). On this
    120x160 fixture a handful of chaotic-flow pixels carry ~8 px EPE
    regardless of warp budget (bres=6 and the exact gather both show the
    same tail), so the mean sits near 0.35-0.42 while the median is
    sub-0.01."""
    f0, f1 = pair
    p = preset()
    want = _cv2_flow(f0, f1, p)
    got = np.asarray(farneback(jnp.asarray(f0), jnp.asarray(f1), p))
    epe = _epe(got, want)
    assert epe.mean() < mean_bound
    assert np.median(epe) < 0.02


@pytest.mark.parametrize("preset,med_bound", [
    (FarnebackParams.legacy, 0.05),    # winsize 3, box
    (FarnebackParams.android, 0.01),   # winsize 5, box, 4 levels
])
def test_epe_median_small_window(pair, preset, med_bound):
    """Small-window presets produce chaotic large flows at degenerate
    pixels; parity against cv2 there requires the unbounded exact-gather
    warp (warp_budget=None). The production shift-warp path is covered by
    test_epe_well_conditioned and test_shift_warp_matches_gather."""
    import dataclasses
    f0, f1 = pair
    p = dataclasses.replace(preset(), warp_budget=None)
    want = _cv2_flow(f0, f1, p)
    got = np.asarray(farneback(jnp.asarray(f0), jnp.asarray(f1), p))
    epe = _epe(got, want)
    assert np.median(epe) < med_bound


def test_win3_gaussian_downstream_threshold_parity(pair):
    """The winsize-3 GAUSSIAN preset (main.cpp:264) has an effectively
    unregularized per-pixel solve: float noise at ill-conditioned pixels is
    chaotically amplified through the pyramid in BOTH implementations, so
    per-pixel EPE is meaningless on textured video. What the application
    consumes downstream — the histogram-derived UPPER threshold
    (create_histogram) — must agree; plus per-pixel parity on a
    well-conditioned translation fixture."""
    import dataclasses
    from ripcurrents_tpu.config import HistogramParams
    from ripcurrents_tpu.ops import hist as histops
    from ripcurrents_tpu.ops.polar import flow_to_polar

    f0, f1 = pair
    p = dataclasses.replace(FarnebackParams.streamlines(), warp_budget=None)
    want = _cv2_flow(f0, f1, p)
    got = np.asarray(farneback(jnp.asarray(f0), jnp.asarray(f1), p))
    hp = HistogramParams()

    def upper(flow):
        m, a = flow_to_polar(jnp.asarray(flow))
        return float(histops.thresholds(histops.bin_flow(m, a, hp), hp).upper)

    # agreement within one histogram bin (1/HIST_RESOLUTION)
    assert abs(upper(got) - upper(want)) <= 1.0 / hp.resolution + 1e-6


def test_win3_gaussian_translation_fixture(rng):
    import dataclasses
    base = rng.uniform(0, 255, (140, 180)).astype(np.float32)
    k = np.ones(7) / 7
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    f0 = base[10:110, 10:150]
    f1 = base[8:108, 7:147]
    p = dataclasses.replace(FarnebackParams.streamlines(), warp_budget=None)
    want = _cv2_flow(f0, f1, p)
    got = np.asarray(farneback(jnp.asarray(f0), jnp.asarray(f1), p))
    epe = _epe(got, want)
    assert np.median(epe) < 0.1
    assert np.percentile(epe, 75) < 1.0


def test_shift_warp_matches_gather(rng):
    """The TPU shift-decomposition warp is bit-near-exact vs the gather
    warp for displacements within the budget."""
    import jax
    from ripcurrents_tpu.flow.farneback import _warp5_gather, _warp5_shift
    r1 = jnp.asarray(rng.uniform(-1, 1, (60, 80, 5)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-10, 10, (60, 80, 2)).astype(np.float32))
    a, ia = jax.jit(_warp5_gather)(r1, flow)
    b, ib = jax.jit(lambda r, f: _warp5_shift(r, f, 16))(r1, flow)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    mask = np.asarray(ia)
    np.testing.assert_allclose(np.asarray(a)[mask], np.asarray(b)[mask],
                               atol=2e-5)


def test_pure_translation_recovered(rng):
    """Flow on a rigidly shifted image recovers the shift (sanity, no cv2)."""
    base = rng.uniform(0, 255, (140, 180)).astype(np.float32)
    k = np.ones(7) / 7
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    f0 = base[10:110, 10:150]
    f1 = base[8:108, 7:147]  # content moves +3 px in x, +2 px in y
    p = FarnebackParams(0.5, 2, 15, 3, 7, 1.5, True)
    got = np.asarray(farneback(jnp.asarray(f0), jnp.asarray(f1), p))
    inner = got[20:-20, 20:-20]
    assert abs(inner[..., 0].mean() - 3.0) < 0.15
    assert abs(inner[..., 1].mean() - 2.0) < 0.15


def test_batched_vmap(pair):
    import jax
    f0, f1 = pair
    p = FarnebackParams.windowed()
    batch0 = jnp.stack([jnp.asarray(f0)] * 2)
    batch1 = jnp.stack([jnp.asarray(f1)] * 2)
    flows = jax.vmap(lambda a, b: farneback(a, b, p))(batch0, batch1)
    assert flows.shape == (2, 120, 160, 2)
    np.testing.assert_allclose(flows[0], flows[1], atol=1e-6)


def test_stream_chunk_matches_stream(pair):
    """farneback_stream_chunk (B pairs per dispatch, vmapped) must equal
    the per-step farneback_stream scan on the same frame sequence — the
    chunked path is the throughput form of the SAME single stream."""
    import jax

    from ripcurrents_tpu.flow.farneback import (farneback_precompute,
                                                farneback_stream,
                                                farneback_stream_chunk)
    f0, f1 = pair
    p = FarnebackParams.windowed()
    # 4 frames -> 3 pairs, with real motion between consecutive frames
    frames = [f0, f1, np.roll(f1, 2, axis=1), np.roll(f1, 3, axis=0)]
    frames = jnp.asarray(np.stack(frames).astype(np.float32))

    exp = farneback_precompute(frames[0], p)
    want, e = [], exp
    for t in range(1, 4):
        fl, e = farneback_stream(e, frames[t], p)
        want.append(np.asarray(fl))

    # vmap reassociates the matmul reductions -> float noise only
    # (measured max abs diff 3.5e-5 on this fixture)
    got, e_chunk = farneback_stream_chunk(exp, frames[1:], p)
    np.testing.assert_allclose(np.asarray(got), np.stack(want), atol=1e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-3),
        e_chunk, e)


def test_stream_multi_matches_stream(pair):
    """farneback_stream_multi (N streams advanced sequentially per
    dispatch — the multi-camera scheduler) must produce each stream's
    flows as the single-stream scan would: the streams are
    Python-unrolled, so every kernel runs at the single-stream shape
    (differences are scan-vs-eager float reassociation only)."""
    from ripcurrents_tpu.flow.farneback import (farneback_precompute,
                                                farneback_stream,
                                                farneback_stream_multi)
    f0, f1 = pair
    p = FarnebackParams.windowed()
    # two streams x 3 frames with differing motion per stream
    s0 = np.stack([f0, f1, np.roll(f1, 2, axis=1)]).astype(np.float32)
    s1 = np.stack([np.roll(f0, 5, axis=1), np.roll(f1, 3, axis=0),
                   f1]).astype(np.float32)
    frames = jnp.asarray(np.stack([s0, s1]))

    import jax
    # per-stream precompute stacked (vmapping it would reassociate the
    # expansion matmuls and cost exactness)
    exps = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[farneback_precompute(frames[s, 0], p) for s in range(2)])
    flows, new_exps = farneback_stream_multi(exps, frames[:, 1:], p)
    assert flows.shape == (2, 2) + f0.shape + (2,)

    for s in range(2):
        e = farneback_precompute(frames[s, 0], p)
        for t in range(2):
            fl, e = farneback_stream(e, frames[s, t + 1], p)
            np.testing.assert_allclose(np.asarray(flows[s, t]),
                                       np.asarray(fl), atol=1e-3)
        jax.tree.map(
            lambda a, b, s=s: np.testing.assert_allclose(
                np.asarray(a[s]), np.asarray(b), rtol=0, atol=1e-3),
            new_exps, e)


def test_fused_path_epe_interpret(pair, monkeypatch):
    """The PRODUCTION fused-kernel path (mega-kernel, resident table,
    bf16 M storage + bf16 blur intermediates) must hold the same EPE
    bound as the XLA path vs cv2 — guards the kernel pipeline's
    numerics on CPU, where _pallas_ok() normally disables it."""
    import importlib

    from jax.experimental.pallas import tpu as pltpu
    fb = importlib.import_module("ripcurrents_tpu.flow.farneback")

    p = FarnebackParams.windowed()  # winsize 10, the bench preset
    f0, f1 = pair
    want = _cv2_flow(f0, f1, p)
    monkeypatch.setattr(fb, "_pallas_ok", lambda: True)
    # Guard against silent vacuity: the engine must actually select the
    # fused path for this shape (it once didn't — _fused_ok used to
    # cache the backend answer per shape, poisoned by earlier tests).
    assert fb._fused_ok(*np.shape(f0))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fb.farneback(jnp.asarray(f0.astype(np.float32)),
                                      jnp.asarray(f1.astype(np.float32)),
                                      p))
    assert _epe(got, want).mean() < 0.5


def test_poly_exp_level_blocked_matches_dense(monkeypatch):
    """The banded-block expansion path (TPU production, incl. the fused
    3-matrix x pass) must match the dense composed-matrix fallback to
    bf16-matmul tolerance, for both raw and halo-padded layouts."""
    import importlib

    import numpy as np
    fb = importlib.import_module("ripcurrents_tpu.flow.farneback")

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, (94, 250)).astype(np.float32))
    monkeypatch.setattr(fb, "_pallas_ok", lambda: True)
    for kwargs in ({}, {"pad_hw": (160, 512), "pad_off": (32, 128)}):
        got = fb.poly_exp_level(img, 47, 125, 7, 1.5, 3, 0.5,
                                channels_first=True, **kwargs)
        monkeypatch.setattr(fb, "_pallas_ok", lambda: False)
        want = fb.poly_exp_level(img, 47, 125, 7, 1.5, 3, 0.5,
                                 channels_first=True, **kwargs)
        monkeypatch.setattr(fb, "_pallas_ok", lambda: True)
        # blocked runs bf16 matmuls; the dense fallback is f32
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2 * 255)


def test_iters_hires_schedule_gating():
    """iters_hires only applies at >= warp_hires_px; a schedule equal to
    the cv2 iteration count is a no-op; a reduced schedule changes the
    flow but stays finite (its EPE budget is adjudicated on hardware —
    tools/bench_iters.py)."""
    import dataclasses

    rng = np.random.default_rng(3)
    base = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    f0 = jnp.asarray(base)
    f1 = jnp.asarray(np.roll(base, 2, axis=1))
    p = dataclasses.replace(FarnebackParams.windowed(), levels=1)

    base = np.asarray(farneback(f0, f1, p))
    # below the hires gate: schedule ignored
    p_below = dataclasses.replace(p, iters_hires=(1, 1))
    np.testing.assert_array_equal(
        np.asarray(farneback(f0, f1, p_below)), base)
    # gate lowered, schedule == iterations: no-op (hires warp overrides
    # nulled so ONLY the iteration schedule is under test)
    p_same = dataclasses.replace(p, warp_hires_px=1, iters_hires=(3, 3),
                                 warp_residual_hires=None,
                                 warp_subcol_hires=None)
    np.testing.assert_array_equal(
        np.asarray(farneback(f0, f1, p_same)), base)
    # gate lowered, reduced schedule: different but finite flow
    p_red = dataclasses.replace(p_same, iters_hires=(1, 1))
    red = np.asarray(farneback(f0, f1, p_red))
    assert np.isfinite(red).all()
    assert np.abs(red - base).max() > 0.0
