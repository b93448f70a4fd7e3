"""Golden: dense LK engine vs cv2 sparse PyrLK on grid points.

The dense formulation warps each pixel by its own flow within the window
(the sparse tracker shifts the whole window rigidly); the two coincide
where flow is window-constant — LK's own assumption — so the comparison
uses a smooth-motion clip and interior points.
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from ripcurrents_tpu.config import LKParams
from ripcurrents_tpu.flow.dense_lk import dense_lk


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(9)
    h, w = 120, 160
    base = rng.uniform(0, 255, (h + 20, w + 20)).astype(np.float32)
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    f0 = base[10:10 + h, 10:10 + w].astype(np.uint8)
    f1 = base[8:8 + h, 7:7 + w].astype(np.uint8)   # motion (+3, +2)
    return f0, f1


def test_dense_lk_translation(pair):
    f0, f1 = pair
    p = LKParams.dense_grid()
    flow, status = dense_lk(jnp.asarray(f0), jnp.asarray(f1), p)
    flow = np.asarray(flow)
    inner = flow[30:-30, 30:-30]
    assert np.median(np.abs(inner[..., 0] - 3.0)) < 0.1
    assert np.median(np.abs(inner[..., 1] - 2.0)) < 0.1
    assert np.asarray(status)[30:-30, 30:-30].mean() > 0.95


def test_dense_lk_matches_cv2_grid(pair):
    f0, f1 = pair
    p = LKParams.dense_grid()
    ys, xs = np.mgrid[24:96:8, 24:136:8]
    pts = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    want, st, _ = cv2.calcOpticalFlowPyrLK(
        f0, f1, pts.reshape(-1, 1, 2), None, winSize=p.win,
        maxLevel=p.levels,
        criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS,
                  p.max_iters, p.eps),
        flags=0, minEigThreshold=p.min_eig_threshold)
    want_flow = want.reshape(-1, 2) - pts
    st = st.reshape(-1).astype(bool)

    flow, _ = dense_lk(jnp.asarray(f0), jnp.asarray(f1), p)
    got = np.asarray(flow)[pts[:, 1].astype(int), pts[:, 0].astype(int)]
    d = np.sqrt(((got - want_flow) ** 2).sum(-1))[st]
    assert np.median(d) < 0.05
    assert np.percentile(d, 90) < 0.3
