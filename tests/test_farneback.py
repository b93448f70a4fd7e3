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
def pair(rng):
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
    (FarnebackParams.subtract_average, 0.25),   # winsize 20
    (FarnebackParams.windowed, 0.25),           # winsize 10
])
def test_epe_well_conditioned(pair, preset, mean_bound):
    f0, f1 = pair
    p = preset()
    want = _cv2_flow(f0, f1, p)
    got = np.asarray(farneback(jnp.asarray(f0), jnp.asarray(f1), p))
    epe = _epe(got, want)
    assert epe.mean() < mean_bound
    assert np.median(epe) < 0.02


@pytest.mark.parametrize("preset", [
    FarnebackParams.streamlines,   # winsize 3, gaussian
    FarnebackParams.legacy,        # winsize 3, box
    FarnebackParams.android,       # winsize 5, box, 4 levels
])
def test_epe_median_small_window(pair, preset):
    f0, f1 = pair
    p = preset()
    want = _cv2_flow(f0, f1, p)
    got = np.asarray(farneback(jnp.asarray(f0), jnp.asarray(f1), p))
    epe = _epe(got, want)
    assert np.median(epe) < 0.05
    assert np.percentile(epe, 75) < 0.5


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
    assert abs(inner[..., 0].mean() - 3.0) < 0.1
    assert abs(inner[..., 1].mean() - 2.0) < 0.1


def test_batched_vmap(pair):
    import jax
    f0, f1 = pair
    p = FarnebackParams.windowed()
    batch0 = jnp.stack([jnp.asarray(f0)] * 2)
    batch1 = jnp.stack([jnp.asarray(f1)] * 2)
    flows = jax.vmap(lambda a, b: farneback(a, b, p))(batch0, batch1)
    assert flows.shape == (2, 120, 160, 2)
    np.testing.assert_allclose(flows[0], flows[1], atol=1e-6)
