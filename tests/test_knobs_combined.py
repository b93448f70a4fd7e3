"""All kernel opt-in knobs TOGETHER (RIPC_PIPE + RIPC_UPS + RIPC_PREP)
through the full production engine in interpret mode — the 'all-on' A/B
config (tools/bench_ab.py) must be numerically sound before hardware
picks it. The frame is 240x640 so the ups/prep geometry gates actually
admit the kernels (the 120x160 fixture of test_farneback is below the
128-lane alignment minimum); the test asserts each kernel ENGAGED, so a
silently-widened fallback gate cannot turn this into a no-op test."""

import importlib

import cv2
import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

fb = importlib.import_module("ripcurrents_tpu.flow.farneback")
from ripcurrents_tpu.config import FarnebackParams


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(5)
    h, w = 240, 640
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


@pytest.mark.slow
def test_all_knobs_on_epe(pair, monkeypatch):
    f0, f1 = pair
    p = FarnebackParams.windowed()
    want = cv2.calcOpticalFlowFarneback(
        f0, f1, None, p.pyr_scale, p.levels, p.winsize, p.iterations,
        p.poly_n, p.poly_sigma, cv2.OPTFLOW_FARNEBACK_GAUSSIAN)

    calls = {"ups": 0, "prep": 0}
    import ripcurrents_tpu.flow.prep_pallas as pp
    import ripcurrents_tpu.ops.resize_pallas as rp
    real_ups = rp.resize_bilinear_cf_padded_pallas
    real_prep = pp.poly_exp_level_pallas

    def count_ups(*a, **k):
        calls["ups"] += 1
        return real_ups(*a, **k)

    def count_prep(*a, **k):
        calls["prep"] += 1
        return real_prep(*a, **k)

    monkeypatch.setattr(rp, "resize_bilinear_cf_padded_pallas", count_ups)
    monkeypatch.setattr(pp, "poly_exp_level_pallas", count_prep)
    monkeypatch.setattr(fb, "_pallas_ok", lambda: True)
    # the whole fused engine (not just prep/ups) must engage at this shape
    assert fb._fused_ok(*np.shape(f0))
    # the dispatcher checks the backend for the ups kernel; interpret mode
    # runs everywhere, so pretend we are on TPU for the gate
    import jax
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for knob in ("RIPC_PIPE", "RIPC_UPS", "RIPC_PREP"):
        monkeypatch.setenv(knob, "1")
    fb._pipe_default.cache_clear()
    fb._ups_pallas_default.cache_clear()
    fb._prep_pallas_default.cache_clear()
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fb.farneback(
                jnp.asarray(f0.astype(np.float32)),
                jnp.asarray(f1.astype(np.float32)), p))
    finally:
        fb._pipe_default.cache_clear()
        fb._ups_pallas_default.cache_clear()
        fb._prep_pallas_default.cache_clear()

    assert calls["prep"] >= 3, f"prep kernel never engaged: {calls}"
    assert calls["ups"] >= 1, f"ups kernel never engaged: {calls}"
    epe = np.sqrt(((got - want) ** 2).sum(-1))
    assert np.median(epe) < 0.05
    assert epe.mean() < 0.5
