"""stabilizeTPU validated against the reference AKAZE stabilizer
(VERDICT r1 next-step #8).

A textured scene is jittered with known random translations
(main.cpp:1556-1682's use case). Both stabilizers — the host-OpenCV
AKAZE + cross-match + RANSAC path (the cli.py `--mode stabilize` loop)
and the TPU-native Harris + descriptor-match + RANSAC path
(flow/feature_stab.stabilize_pair, `--mode stabilizeTPU`) — must cancel
the jitter: the residual frame-to-frame motion of each output sequence
drops far below the injected jitter, and the TPU stabilizer is at least
comparable to AKAZE's residual on the same clip.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ripcurrents_tpu.flow.feature_stab import stabilize_pair
from ripcurrents_tpu.ops.image import bgr_to_gray

H, W, T = 240, 320, 8
MARGIN = 32


def make_jittered_clip(rng):
    """Textured scene translated by known per-frame jitter (+-4 px)."""
    big = rng.uniform(0, 255, (H + 64, W + 64)).astype(np.float32)
    big = cv2.GaussianBlur(big, (0, 0), 1.2)
    # corner-ish blobs so AKAZE finds keypoints
    for _ in range(150):
        y = int(rng.uniform(8, H + 56))
        x = int(rng.uniform(8, W + 56))
        cv2.circle(big, (x, y), int(rng.uniform(2, 5)),
                   float(rng.uniform(0, 255)), -1)
    jit = rng.uniform(-4, 4, (T, 2)).astype(np.float32)
    jit[0] = 0
    frames = []
    for t in range(T):
        m = np.float32([[1, 0, 32 + jit[t, 0]], [0, 1, 32 + jit[t, 1]]])
        g = cv2.warpAffine(big, m, (W, H), flags=cv2.INTER_LINEAR)
        g = np.clip(g, 0, 255).astype(np.uint8)
        frames.append(np.stack([g, g, g], -1))
    return np.stack(frames), jit


def residual_jitter(frames_u8):
    """Mean |phase-correlation shift| between consecutive frames, measured
    on the interior (warp borders excluded)."""
    shifts = []
    prev = None
    win = cv2.createHanningWindow((W - 2 * MARGIN, H - 2 * MARGIN),
                                  cv2.CV_32F)
    for f in frames_u8:
        g = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY).astype(np.float32)
        g = g[MARGIN:H - MARGIN, MARGIN:W - MARGIN]
        if prev is not None:
            (dx, dy), _ = cv2.phaseCorrelate(prev, g, win)
            shifts.append(np.hypot(dx, dy))
        prev = g
    return float(np.mean(shifts))


def akaze_stabilize(frames):
    """The cli.py --mode stabilize loop (main.cpp:1598-1659). OpenCV 5.x
    moved AKAZE to contrib; the CLI (and this oracle) fall back to SIFT —
    same cross-match + RANSAC homography pipeline."""
    if hasattr(cv2, "AKAZE_create"):
        algorithm = cv2.AKAZE_create()
    else:
        algorithm = cv2.SIFT_create()
    matcher = cv2.DescriptorMatcher_create("BruteForce")
    prev = frames[0]
    out = [frames[0]]
    for cur in frames[1:]:
        kp1, d1 = algorithm.detectAndCompute(prev, None)
        kp2, d2 = algorithm.detectAndCompute(cur, None)
        correction = cur
        if d1 is not None and d2 is not None and len(kp1) and len(kp2):
            m12 = matcher.match(d1, d2)
            m21 = matcher.match(d2, d1)
            good = [fwd for fwd in m12
                    if m21[fwd.trainIdx].trainIdx == fwd.queryIdx]
            if len(good) >= 4:
                src = np.float32([kp1[m.queryIdx].pt for m in good])
                dst = np.float32([kp2[m.trainIdx].pt for m in good])
                m, _ = cv2.findHomography(src, dst, cv2.RANSAC)
                if m is not None:
                    correction = cv2.warpPerspective(
                        cur, np.linalg.inv(m), (W, H))
        out.append(correction)
        prev = correction
    return np.stack(out)


def tpu_stabilize(frames, features="harris"):
    """The stabilizeTPU mode core: register each frame to the previous
    corrected frame (pipelines/modes.py stabilize_tpu)."""
    key = jax.random.PRNGKey(0)
    prev_gray = bgr_to_gray(jnp.asarray(frames[0]))
    out = [frames[0]]

    @jax.jit
    def step(prev_gray, cur, sub):
        corrected, h, n = stabilize_pair(prev_gray, bgr_to_gray(cur),
                                         cur, sub, features=features)
        return corrected, bgr_to_gray(corrected)

    for cur in frames[1:]:
        key, sub = jax.random.split(key)
        corrected, prev_gray = step(prev_gray, jnp.asarray(cur), sub)
        out.append(np.asarray(corrected))
    return np.stack(out)


@pytest.mark.slow
@pytest.mark.parametrize("features", ["harris", "akaze"])
def test_stabilize_tpu_matches_akaze_on_jittered_clip(rng, features):
    frames, jit = make_jittered_clip(rng)
    raw = residual_jitter(frames)
    assert raw > 2.0, f"clip jitter too small to test: {raw:.2f}"

    ak = residual_jitter(akaze_stabilize(frames))
    tp = residual_jitter(tpu_stabilize(frames, features))

    # both must cancel most of the jitter...
    assert ak < 0.35 * raw, f"AKAZE residual {ak:.2f} vs raw {raw:.2f}"
    assert tp < 0.35 * raw, f"stabilizeTPU residual {tp:.2f} vs raw {raw:.2f}"
    # ...and the TPU path must be in AKAZE's accuracy class on this clip
    # (sub-pixel slack: phaseCorrelate itself is only ~0.05 px stable)
    assert tp < ak + 0.5, f"TPU {tp:.3f} px vs AKAZE {ak:.3f} px"
