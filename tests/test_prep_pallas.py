"""The two-kernel Pallas expansion prep must match the XLA blocked path
it replaces — both apply the SAME composed banded matrices
(flow/farneback._level_prep_matrices) in bf16 with f32 accumulation, so
the only admissible deviation is accumulation-order rounding. Geometry
covers the real pyramid levels of the 1080p bench preset and the
640x480 working resolution, including the halo'd padded layout the
fused kernels consume."""

import importlib

import numpy as np
import pytest

import jax.numpy as jnp

fb = importlib.import_module("ripcurrents_tpu.flow.farneback")
from ripcurrents_tpu.flow.fused_update import HALO_X, HALO_Y, _row_tile
from ripcurrents_tpu.flow.prep_pallas import (poly_exp_level_pallas,
                                              prep_pallas_ok)


def _geometry(h, w, k, pyr_scale=0.5):
    lh = int(round(h * pyr_scale ** k))
    lw = int(round(w * pyr_scale ** k))
    sigma = (1.0 / pyr_scale ** k - 1.0) * 0.5 if k else 0.25
    smooth = max(int(round(sigma * 5)) | 1, 3)
    th = _row_tile(lh)
    ph = -(-lh // th) * th + 2 * HALO_Y
    pw = -(-lw // 128) * 128 + 2 * HALO_X
    return (h, w, lh, lw, 15, 1.2, smooth, sigma if k else 0.5, ph, pw,
            (HALO_Y, HALO_X))


@pytest.mark.parametrize("h,w,k", [(1080, 1920, 0), (1080, 1920, 1),
                                   (1080, 1920, 2), (480, 640, 0),
                                   (480, 640, 1)])
def test_matches_xla_blocked_path(h, w, k, monkeypatch):
    args = _geometry(h, w, k)
    assert prep_pallas_ok(*args), f"geometry rejected: {args}"
    rng = np.random.default_rng(k)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    _, _, _, ig11, ig03, ig33, ig55 = fb._poly_exp_consts(15, 1.2)
    ph = args[8]

    monkeypatch.setattr(fb, "_pallas_ok", lambda: True)
    want = np.asarray(fb.poly_exp_level(
        img, *args[2:8], channels_first=True, pad_hw=args[8:10],
        pad_off=args[10], out_dtype=jnp.bfloat16).astype(jnp.float32))
    got = np.asarray(poly_exp_level_pallas(
        img, args, ig11, ig03, ig33, ig55, fb._y_section_stride(ph),
        jnp.bfloat16, interpret=True).astype(jnp.float32))
    assert got.shape == want.shape
    # both paths: identical bf16 weights/inputs, f32 accumulation; the
    # only difference is zero-padded window widths -> exact zeros in the
    # dot chains. bf16 storage rounds to ~0.4% relative of channel scale.
    scale = np.abs(want).max(axis=(1, 2), keepdims=True) + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-2,
                               err_msg=f"level {k}")


def test_pads_are_zero():
    args = _geometry(480, 640, 1)
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))
    _, _, _, ig11, ig03, ig33, ig55 = fb._poly_exp_consts(15, 1.2)
    lh, lw, ph, pw = args[2], args[3], args[8], args[9]
    out = np.asarray(poly_exp_level_pallas(
        img, args, ig11, ig03, ig33, ig55, fb._y_section_stride(ph),
        jnp.float32, interpret=True))
    oy, ox = args[10]
    assert np.all(out[:, :oy, :] == 0.0)
    assert np.all(out[:, oy + lh:, :] == 0.0)
    assert np.all(out[:, :, :ox] == 0.0)
    assert np.all(out[:, :, ox + lw:] == 0.0)


def test_dispatcher_uses_pallas_when_enabled(monkeypatch):
    """RIPC_PREP=1 routes poly_exp_level through the kernels (interpret
    off-TPU via the forced flag) and matches the default path."""
    from jax.experimental.pallas import tpu as pltpu
    args = _geometry(480, 640, 0)
    rng = np.random.default_rng(9)
    img = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))
    monkeypatch.setattr(fb, "_pallas_ok", lambda: True)
    base = np.asarray(fb.poly_exp_level(
        img, *args[2:8], channels_first=True, pad_hw=args[8:10],
        pad_off=args[10]))
    monkeypatch.setenv("RIPC_PREP", "1")
    fb._prep_pallas_default.cache_clear()
    try:
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fb.poly_exp_level(
                img, *args[2:8], channels_first=True, pad_hw=args[8:10],
                pad_off=args[10]))
    finally:
        monkeypatch.delenv("RIPC_PREP")
        fb._prep_pallas_default.cache_clear()
    scale = np.abs(base).max() + 1e-6
    np.testing.assert_allclose(got / scale, base / scale, atol=1e-2)
