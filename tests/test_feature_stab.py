"""TPU-native feature stabilizer: homography recovery + jitter removal."""

import jax
import jax.numpy as jnp
import numpy as np

from ripcurrents_tpu.flow.feature_stab import (harris_corners,
                                               ransac_homography,
                                               match_descriptors,
                                               patch_descriptors,
                                               stabilize_pair,
                                               warp_by_homography)


def _textured(rng, h=240, w=320):
    base = rng.uniform(0, 255, (h, w)).astype(np.float32)
    k = np.ones(3) / 3
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    # sprinkle strong corners so Harris has unambiguous features
    for _ in range(120):
        y, x = rng.integers(10, h - 10), rng.integers(10, w - 10)
        base[y:y + 4, x:x + 4] = 255 * rng.integers(0, 2)
    return base.astype(np.uint8)


def test_recovers_known_translation(rng):
    img = _textured(rng)
    t = np.float32([[1, 0, 3.0], [0, 1, -2.0], [0, 0, 1]])  # shift (+3, -2)
    import cv2
    moved = cv2.warpPerspective(img, t, (img.shape[1], img.shape[0]))
    ca = harris_corners(jnp.asarray(img))
    cb = harris_corners(jnp.asarray(moved))
    da = patch_descriptors(jnp.asarray(img), ca.xy)
    db = patch_descriptors(jnp.asarray(moved), cb.xy)
    idx, good = match_descriptors(da, db, ca.score > 0, cb.score > 0)
    h_mat, n_inl = ransac_homography(
        ca.xy, cb.xy[idx], good, jax.random.PRNGKey(0))
    h_np = np.asarray(h_mat)
    assert int(n_inl) > 30
    assert abs(h_np[0, 2] - 3.0) < 0.3
    assert abs(h_np[1, 2] + 2.0) < 0.3
    assert np.allclose(h_np[:2, :2], np.eye(2), atol=0.01)


def test_stabilize_pair_cancels_jitter(rng):
    img = _textured(rng)
    import cv2
    t = np.float32([[1, 0, 4.0], [0, 1, 3.0], [0, 0, 1]])
    jittered = cv2.warpPerspective(img, t, (img.shape[1], img.shape[0]))
    out, h_mat, n_inl = stabilize_pair(
        jnp.asarray(img), jnp.asarray(jittered), jnp.asarray(jittered),
        jax.random.PRNGKey(1))
    # the corrected frame should match the reference frame far better
    # than the jittered one does (ignore borders the warp can't fill)
    sl = np.s_[20:-20, 20:-20]
    before = np.abs(jittered.astype(int) - img.astype(int))[sl].mean()
    after = np.abs(np.asarray(out).astype(int) - img.astype(int))[sl].mean()
    assert after < 0.3 * before
    assert int(n_inl) > 30


def test_warp_identity_is_noop(rng):
    img = _textured(rng, 120, 160)
    out = warp_by_homography(jnp.asarray(img), jnp.eye(3))
    inner = np.s_[8:-8, 8:-8]
    np.testing.assert_array_equal(np.asarray(out)[inner], img[inner])
