"""TPU-native AKAZE-class features (flow/akaze_tpu.py).

Functional-parity bar (SURVEY.md section 2.2: the reference's stabilize
mode detects cv::AKAZE keypoints, main.cpp:1598): the detector/descriptor
must recover known shifts and rotations through descriptor matching, and
the AKAZE-backed stabilize_pair must cancel synthetic jitter like the
Harris-backed one does (tests/test_feature_stab.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ripcurrents_tpu.flow.akaze_tpu import detect_and_describe
from ripcurrents_tpu.flow.feature_stab import (match_descriptors,
                                               ransac_homography,
                                               stabilize_pair)


@pytest.fixture(scope="module")
def textured():
    rng = np.random.default_rng(3)
    h, w = 240, 320
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    k = np.ones(9) / 9
    for ax in (0, 1):
        img = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, img)
    img = (img - img.min()) / (np.ptp(img) + 1e-9) * 255
    return img.astype(np.float32)


def test_detects_blob_scale(textured):
    """Keypoints land on blob-like structure with positive det-Hessian
    response and in-bounds coordinates."""
    kps, desc = detect_and_describe(jnp.asarray(textured))
    s = np.asarray(kps.score)
    xy = np.asarray(kps.xy)
    assert (s[:64] > 0).all()
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 320).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 240).all()
    assert desc.shape == (256, 256)
    # descriptors are +-1/sqrt(bits) rows -> unit norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(desc), axis=1), 1.0, atol=1e-5)


def test_matches_recover_translation(textured):
    shift = (4, 7)  # (dy, dx)
    moved = np.roll(np.roll(textured, shift[0], axis=0), shift[1], axis=1)
    kp1, d1 = detect_and_describe(jnp.asarray(textured))
    kp2, d2 = detect_and_describe(jnp.asarray(moved))
    idx, good = match_descriptors(d1, d2, kp1.score > 0, kp2.score > 0)
    g = np.asarray(good)
    assert g.sum() > 60
    dxy = np.asarray(kp2.xy)[np.asarray(idx)][g] - np.asarray(kp1.xy)[g]
    med = np.median(dxy, axis=0)
    assert abs(med[0] - shift[1]) < 0.5
    assert abs(med[1] - shift[0]) < 0.5


def test_rotation_invariant_matching(textured):
    """20-degree rotation: matched keypoints recover the rotation angle
    through RANSAC (orientation + rotated descriptors at work — the
    normalized-patch Harris descriptors cannot do this)."""
    import cv2
    deg = 20.0
    h, w = textured.shape
    m = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
    rot = cv2.warpAffine(textured, m, (w, h), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REFLECT)
    kp1, d1 = detect_and_describe(jnp.asarray(textured))
    kp2, d2 = detect_and_describe(jnp.asarray(rot))
    idx, good = match_descriptors(d1, d2, kp1.score > 0, kp2.score > 0)
    g = np.asarray(good)
    assert g.sum() > 20
    h_mat, n_inl = ransac_homography(
        kp1.xy, kp2.xy[jnp.asarray(idx)], good, jax.random.PRNGKey(0))
    assert int(n_inl) > 30
    h_np = np.asarray(h_mat)
    ang = np.degrees(np.arctan2(h_np[1, 0], h_np[0, 0]))
    assert abs(ang + deg) < 0.5   # cv2 rotates CCW-positive -> -deg here


def test_stabilize_pair_akaze_cancels_jitter(textured):
    import cv2
    img = np.clip(textured, 0, 255).astype(np.uint8)
    t = np.float32([[1, 0, 4.0], [0, 1, 3.0], [0, 0, 1]])
    jittered = cv2.warpPerspective(img, t, (img.shape[1], img.shape[0]))
    out, h_mat, n_inl = stabilize_pair(
        jnp.asarray(img), jnp.asarray(jittered), jnp.asarray(jittered),
        jax.random.PRNGKey(1), features="akaze")
    sl = np.s_[20:-20, 20:-20]
    before = np.abs(jittered.astype(int) - img.astype(int))[sl].mean()
    after = np.abs(np.asarray(out).astype(int) - img.astype(int))[sl].mean()
    assert after < 0.3 * before
    assert int(n_inl) > 20
