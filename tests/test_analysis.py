"""Tests for the analysis library: histograms/thresholds, classification,
accumulation, morphology edges, mean-flow ops, shear, motion history."""

import cv2
import jax.numpy as jnp
import numpy as np

from ripcurrents_tpu.analysis import classify as cls
from ripcurrents_tpu.analysis import meanflow, shear
from ripcurrents_tpu.config import HistogramParams
from ripcurrents_tpu.ops import hist as histops
from ripcurrents_tpu.ops import morphology as morph
from ripcurrents_tpu.ops.polar import flow_to_polar


def _reference_thresholds(mag, ang, p):
    """Literal (slow, host) transcription of create_histogram's loops
    (ripcurrents_module.cpp:89-144) to validate the vectorized version."""
    hist = np.zeros(p.bins, int)
    hist2d = np.zeros((p.directions, p.bins), int)
    histsum = 0
    histsum2d = np.zeros(p.directions, int)
    for m, a in zip(mag.ravel(), ang.ravel()):
        b = int(m * p.resolution)
        d = int(a * p.directions / 360.0)
        if 0 <= b < p.bins:
            hist[b] += 1
            histsum += 1
            hist2d[d][b] += 1
            histsum2d[d] += 1
    threshsum, b = 0, p.bins - 1
    while threshsum < histsum * p.top_frac:
        threshsum += hist[b]
        b -= 1
    upper = b / p.resolution
    target = b
    upper2d = np.zeros(p.directions)
    prop = np.zeros(p.directions)
    for d in range(p.directions):
        t2, b2 = 0, p.bins - 1
        while t2 < histsum2d[d] * p.top_frac:
            t2 += hist2d[d][b2]
            b2 -= 1
        upper2d[d] = max(b2 / p.resolution, p.upper2d_floor)
        t3, b3 = 0, p.bins - 1
        while b3 > target:
            t3 += hist2d[d][b3]
            b3 -= 1
        prop[d] = t3 / threshsum
    return upper, upper2d, prop


def test_histogram_thresholds_match_reference_loops(rng):
    p = HistogramParams()
    flow = rng.normal(size=(60, 80, 2)).astype(np.float32)
    mag, ang = flow_to_polar(jnp.asarray(flow))
    h = histops.bin_flow(mag, ang, p)
    th = histops.thresholds(h, p)
    w_upper, w_upper2d, w_prop = _reference_thresholds(
        np.asarray(mag), np.asarray(ang), p)
    assert abs(float(th.upper) - w_upper) < 1e-6
    np.testing.assert_allclose(np.asarray(th.upper2d), w_upper2d, atol=1e-6)
    np.testing.assert_allclose(np.asarray(th.prop_above_upper), w_prop,
                               atol=1e-6)


def test_histogram_thresholds_empty_directions(rng):
    """Uniform flow fills ONE of 36 directions; every empty direction's
    while loop runs zero times in the reference, leaving bin = bins-1
    (not bins-2 — a round-2 off-by-one found by review). The literal
    transcription covers that path only when some direction is empty."""
    p = HistogramParams()
    flow = np.zeros((40, 50, 2), np.float32)
    flow[..., 0] = 1.3   # uniform rightward flow
    flow += rng.normal(0, 0.01, flow.shape).astype(np.float32)
    mag, ang = flow_to_polar(jnp.asarray(flow))
    h = histops.bin_flow(mag, ang, p)
    th = histops.thresholds(h, p)
    w_upper, w_upper2d, w_prop = _reference_thresholds(
        np.asarray(mag), np.asarray(ang), p)
    assert int(np.asarray(h.histsum2d).astype(bool).sum()) < 4
    assert abs(float(th.upper) - w_upper) < 1e-6
    np.testing.assert_allclose(np.asarray(th.upper2d), w_upper2d,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(th.prop_above_upper), w_prop,
                               atol=1e-6)


def test_histogram_accumulates():
    p = HistogramParams()
    mag = jnp.ones((10, 10)) * 0.5
    ang = jnp.zeros((10, 10))
    h1 = histops.bin_flow(mag, ang, p)
    h2 = histops.accumulate(h1, h1)
    assert int(h2.histsum) == 200
    assert int(h2.hist[10]) == 200


def test_classify_matches_reference_semantics():
    ang = jnp.array([[0.0, 90.0], [180.0, 350.0]])
    mag = jnp.array([[3.0, 0.4], [0.25, 0.1]])
    upper2d = jnp.full(36, 0.5)
    r = cls.classify(ang, mag, upper=2.0, mid=0.5, lower=0.2,
                     upper2d=upper2d)
    # val>upper -> fast; 0.4>mid? no, >lower -> z=.5; 0.25 -> z=.5; 0.1 -> y=.5
    np.testing.assert_allclose(np.asarray(r.fast_mask),
                               [[1, 0], [0, 0]])
    wc = np.asarray(r.waterclass)
    assert wc[0, 0, 0] == 0.5              # fast: x=.5
    assert wc[0, 1, 2] == 0.5 and wc[1, 0, 2] == 0.5
    assert wc[1, 1, 1] == 0.5
    disp = np.asarray(r.display_hsv)
    np.testing.assert_allclose(disp[..., 2], np.asarray(mag) / 0.5, rtol=1e-6)
    assert disp[0, 0, 1] == 1.0 and disp[1, 1, 1] == 0.7


def test_duty_cycle_and_mask():
    acc = jnp.array([[50.0, 15.0], [5.0, 25.0]])
    viz = cls.duty_cycle_viz(acc, framecount=100)
    # 50 > 20 -> x=1; 15 in (10,20) -> z=1; 5 <= 10 -> y=.5 & mask
    out = np.asarray(viz.out)
    assert out[0, 0, 0] == 1 and out[0, 1, 2] == 1 and out[1, 0, 1] == 0.5
    mask = np.asarray(viz.outmask)
    np.testing.assert_array_equal(mask, [[0, 0], [255, 0]])


def test_rip_edges_match_cv2(rng):
    mask = (rng.uniform(size=(60, 80)) > 0.8).astype(np.uint8) * 255
    got = np.asarray(morph.rip_edges(jnp.asarray(mask)))
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    want = cv2.dilate(mask, k)
    want = cv2.morphologyEx(want, cv2.MORPH_GRADIENT, k)
    np.testing.assert_array_equal(got, want)


def test_ellipse_kernel_matches_cv2():
    for size in [(5, 5), (7, 7), (3, 5), (9, 7)]:
        got = morph.ellipse_kernel(size[0], size[1]).astype(np.uint8)
        want = cv2.getStructuringElement(cv2.MORPH_ELLIPSE,
                                         (size[1], size[0]))
        np.testing.assert_array_equal(got, want)


def test_subtract_average(rng):
    flow = jnp.asarray(rng.normal(size=(20, 30, 2)).astype(np.float32) + 2.0)
    out = meanflow.subtract_average(flow)
    np.testing.assert_allclose(np.asarray(out).reshape(-1, 2).mean(0),
                               [0, 0], atol=1e-5)


def test_subtract_mean_magnitude(rng):
    flow = jnp.asarray(rng.normal(size=(20, 30, 2)).astype(np.float32))
    out = np.asarray(meanflow.subtract_mean_magnitude(flow))
    mags = np.linalg.norm(np.asarray(flow), axis=-1)
    out_mags = np.linalg.norm(out, axis=-1)
    np.testing.assert_allclose(out_mags, np.abs(mags - mags.mean()),
                               rtol=1e-4, atol=1e-5)


def test_stabilizer_uses_bottom_right_block():
    # Faithful quirk (ripcurrents_module.cpp:295-296): the block-WIDE
    # component sums are divided by ONE dimension only (sum_x / n_cols,
    # sum_y / n_rows), so the jitter estimate is the true mean scaled
    # by the other dimension. 10x10 block of (2,-1):
    #   x: 2*100 / 10 = 20;  y: -1*100 / 10 = -10;  strength 0.2.
    flow = np.zeros((100, 100, 2), np.float32)
    flow[90:, 90:] = [2.0, -1.0]
    flow[0, 0] = [1.0, 1.0]
    out = np.asarray(meanflow.stabilize_flow(jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, 0],
                               [1.0 - 0.2 * 20.0, 1.0 + 0.2 * 10.0],
                               rtol=1e-5)
    assert out[50, 50, 0] == 0.0  # zero components stay zero


def test_ring_mean():
    st = meanflow.ring_init(4, (2, 2))
    for v in range(1, 6):
        st = meanflow.ring_update(st, jnp.full((2, 2), float(v)))
    # window holds 2,3,4,5 -> mean 3.5
    np.testing.assert_allclose(np.asarray(st.mean), 3.5, rtol=1e-6)


def test_shear_frobenius_uniform_flow_is_zero():
    flow = jnp.ones((64, 64, 2), jnp.float32) * 3.0
    fn = np.asarray(shear.shear_frobenius(flow, 10))
    assert fn.max() == 0.0


def test_shear_frobenius_linear_shear():
    h, w = 64, 64
    ys = np.arange(h, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    flow = np.stack([ys * 0.1, np.zeros((h, w), np.float32)], axis=-1)
    fn = np.asarray(shear.shear_frobenius(jnp.asarray(flow), 10))
    # dvx/dy over +-10 rows = 2*10*0.1 = 2.0 everywhere in the interior
    np.testing.assert_allclose(fn[20:-20, 20:-20], 2.0, rtol=1e-5)


def test_bright_color_options(rng):
    buf = rng.integers(0, 255, size=(5, 8, 8, 3)).astype(np.uint8)
    got_max = np.asarray(meanflow.bright_color_reduce(jnp.asarray(buf), 1))
    idx = buf[..., 2].argmax(0)
    want = np.take_along_axis(buf, idx[None, ..., None], axis=0)[0]
    np.testing.assert_array_equal(got_max, want)


def test_bright_color_mean_matches_u8_mat_arithmetic(rng):
    # Transcription of the reference's u8 Mat ops (main.cpp:1313,1326):
    # each buffer[i]/windowSize saturate-ROUNDS (cvRound, half-to-even)
    # before the += — NOT a rounded float mean (e.g. five 127s average
    # to 5*round(127/5) = 125, float mean would give 127).
    buf = rng.integers(0, 256, size=(5, 6, 6, 3)).astype(np.uint8)
    got = np.asarray(meanflow.bright_color_reduce(jnp.asarray(buf), 0))
    q = np.clip(np.round(buf.astype(np.float64) / 5.0), 0, 255)
    want = np.clip(q.sum(axis=0), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    const = np.full((5, 2, 2, 3), 127, np.uint8)
    got_c = np.asarray(meanflow.bright_color_reduce(jnp.asarray(const), 0))
    np.testing.assert_array_equal(got_c, np.full((2, 2, 3), 125, np.uint8))


def test_android_local_rip_detector():
    h, w = 120, 160
    out = np.zeros((h, w, 3), np.float32)
    # a 60x60 block at (40, 40) where hi and lo pixels interleave densely:
    # its interior pixels are covered by 4 winning 40x40 windows (the
    # reference's votes==4 condition, jni/ripcurrents.cpp:289-320)
    yy, xx = np.mgrid[0:h, 0:w]
    block = (yy >= 40) & (yy < 100) & (xx >= 40) & (xx < 100)
    out[..., 2] = np.where(block & ((yy + xx) % 2 == 0), 1.0, 0.0)
    out[..., 1] = np.where(block & ((yy + xx) % 2 == 1), 1.0, 0.0)
    mask = np.asarray(cls.android_local_rip(jnp.asarray(out)))
    # a lo-duty pixel deep inside the block fires
    assert mask[79, 78] == 255 or mask[78, 79] == 255
    assert mask[10, 10] == 0


def test_motion_history_orientation():
    from ripcurrents_tpu.analysis import motion
    rng = np.random.default_rng(0)
    prev = rng.integers(0, 255, (60, 80)).astype(np.uint8)
    cur = prev.copy()
    cur[20:40, 30:50] = 255 - cur[20:40, 30:50]  # strong motion region
    out = motion.global_orientation_step(jnp.asarray(prev), jnp.asarray(cur))
    assert 0.0 <= float(out.angle_deg) < 360.0
    assert np.asarray(out.mhi_norm).max() == 1.0
