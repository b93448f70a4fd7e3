"""Golden tests: phase correlation vs cv2.phaseCorrelate."""

import cv2
import jax.numpy as jnp
import numpy as np

from ripcurrents_tpu.flow.phasecorr import hanning_window, phase_correlate


def test_hanning_window_matches_cv2():
    for h, w in [(50, 50), (32, 48), (6, 8)]:
        got = np.asarray(hanning_window(h, w))
        want = cv2.createHanningWindow((w, h), cv2.CV_32F)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_phase_correlate_matches_cv2(rng):
    base = rng.uniform(0, 255, (80, 120)).astype(np.float32)
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    a = base[10:60, 10:90]
    b = base[8:58, 7:87]  # b = a shifted by (+3, +2)
    win = cv2.createHanningWindow((80, 50), cv2.CV_32F)
    want, resp = cv2.phaseCorrelate(a.astype(np.float64),
                                    b.astype(np.float64),
                                    win.astype(np.float64))
    got = phase_correlate(jnp.asarray(a), jnp.asarray(b),
                          hanning_window(50, 80))
    shift = np.asarray(got.shift)
    assert abs(shift[0] - want[0]) < 0.2
    assert abs(shift[1] - want[1]) < 0.2
    assert abs(shift[0] - 3.0) < 0.3 and abs(shift[1] - 2.0) < 0.3
    assert 0.5 < float(got.response) <= 1.0


def test_phase_correlate_integer_shift(rng):
    base = rng.uniform(0, 255, (64, 64)).astype(np.float32)
    b = np.roll(base, (5, -3), (0, 1))  # +5 rows, -3 cols
    got = phase_correlate(jnp.asarray(base), jnp.asarray(b))
    shift = np.asarray(got.shift)
    # circular shift: b(y,x) = a(y-5, x+3) -> b is a moved by (-3? ...)
    assert abs(shift[0] - (-3.0)) < 0.05
    assert abs(shift[1] - 5.0) < 0.05
