"""The Pallas flow-upsample kernel must match the XLA banded-matmul path
it replaces — both apply the SAME host-built resize matrices
(ops.image._resize_matrices_padded), so the only admissible deviation is
f32 accumulation-order rounding (~1e-6; einsum/BLAS vs dot block sums).
Geometries cover the real Farneback pyramid shapes (1080p and 640x480,
levels 2->1->0) including partial output blocks and clamped edge
windows."""

import numpy as np
import pytest

import jax.numpy as jnp

from ripcurrents_tpu.flow.fused_update import _row_tile
from ripcurrents_tpu.ops.image import resize_bilinear_cf_padded
from ripcurrents_tpu.ops.resize_pallas import (
    resize_bilinear_cf_padded_pallas, resize_cf_padded_pallas_ok)


def _pad_hw(lh, lw):
    th = _row_tile(lh)
    return (-(-lh // th) * th, -(-lw // 128) * 128)


def _level_chain(h, w, levels, pyr_scale=0.5):
    """(src_true, dst_true) pairs of the Farneback upsample chain."""
    sizes = [(int(round(h * pyr_scale ** k)), int(round(w * pyr_scale ** k)))
             for k in range(levels, -1, -1)]
    return list(zip(sizes[:-1], sizes[1:]))


@pytest.mark.parametrize("h,w", [(1080, 1920), (480, 640)])
def test_matches_xla_path_on_pyramid_shapes(h, w):
    rng = np.random.default_rng(0)
    for src_true, dst_true in _level_chain(h, w, levels=2):
        src_pad, dst_pad = _pad_hw(*src_true), _pad_hw(*dst_true)
        if not resize_cf_padded_pallas_ok(src_pad, src_true, dst_true,
                                          dst_pad, 2.0):
            pytest.skip(f"window larger than source at {src_true}")
        flow = jnp.asarray(
            rng.normal(0, 3, (2,) + src_pad).astype(np.float32))
        want = np.asarray(resize_bilinear_cf_padded(
            flow, src_true, dst_true, dst_pad, 2.0))
        got = np.asarray(resize_bilinear_cf_padded_pallas(
            flow, src_true, dst_true, dst_pad, 2.0, interpret=True))
        assert got.shape == want.shape
        np.testing.assert_allclose(
            got, want, atol=1e-4, rtol=0,
            err_msg=f"{src_true}->{dst_true}")


def test_pads_come_out_zero_even_with_garbage_source_pads():
    src_true, dst_true = (270, 480), (540, 960)
    src_pad, dst_pad = _pad_hw(*src_true), _pad_hw(*dst_true)
    rng = np.random.default_rng(1)
    flow = rng.normal(0, 3, (2,) + src_pad).astype(np.float32)
    # garbage (huge but finite) in the source pad margins must not leak
    flow[:, src_true[0]:, :] = 1e30
    flow[:, :, src_true[1]:] = -1e30
    got = np.asarray(resize_bilinear_cf_padded_pallas(
        jnp.asarray(flow), src_true, dst_true, dst_pad, 2.0,
        interpret=True))
    assert np.all(got[:, dst_true[0]:, :] == 0.0)
    assert np.all(got[:, :, dst_true[1]:] == 0.0)
    assert np.all(np.isfinite(got))
    assert np.abs(got[:, :dst_true[0], :dst_true[1]]).max() < 1e3


def test_small_shapes_report_not_ok():
    # a misaligned padded width (not a 128-lane multiple) must fall back
    assert not resize_cf_padded_pallas_ok(
        (16, 64), (16, 16), (32, 32), (32, 128), 2.0)
    # ... and a misaligned padded height (not an 8-sublane multiple)
    assert not resize_cf_padded_pallas_ok(
        (12, 128), (12, 16), (24, 32), (24, 128), 2.0)


def test_tiny_aligned_source_now_admitted_and_exact():
    # The exact planner admits a (16, 128) source (the whole source is
    # one aligned window — the old conservative width+align-1 formula
    # rejected it); its output must still match the XLA path exactly.
    src_true, dst_true = (16, 16), (32, 32)
    src_pad, dst_pad = (16, 128), (32, 128)
    assert resize_cf_padded_pallas_ok(src_pad, src_true, dst_true,
                                      dst_pad, 2.0)
    rng = np.random.default_rng(2)
    flow = jnp.asarray(rng.normal(0, 3, (2,) + src_pad)
                       .astype(np.float32))
    want = np.asarray(resize_bilinear_cf_padded(
        flow, src_true, dst_true, dst_pad, 2.0))
    got = np.asarray(resize_bilinear_cf_padded_pallas(
        flow, src_true, dst_true, dst_pad, 2.0, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)
