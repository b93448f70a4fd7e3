"""End-to-end android rip-detector golden vs the reference jni loop.

Transcribes rip_main (RipCurrents_android/app/src/main/jni/ripcurrents.cpp:
81-347) into a host-side numpy/cv2 oracle: cv2 Farneback (0.5, 3, 5, 3, 15,
1.2, 0) -> STABILIZE=2 flow averaging -> cartToPolar -> CUMULATIVE 100-bin
histogram with top-3% threshold -> fast-pixel accumulation -> duty bands
(low <5%, hi 5-20%) -> 40x40 local-window co-occurrence votes -> red
overlay on low-duty pixels with exactly 4 winning windows after a 90-frame
warmup — then runs pipelines/android.make_android on the same synthetic
clip and asserts red-mask IoU (VERDICT r1 next-step #6).
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ripcurrents_tpu.pipelines.android import make_android
from ripcurrents_tpu.pipelines.common import ModeConfig

H, W = 120, 160
T = 100                      # processed frames (> the 90-frame warmup)
RIP_X0, RIP_X1 = 48, 144     # detector region (hi/lo duty stripe mix)
STABILIZE = 2
LOCALWIN = 20

# The jni detector marks 40x40 windows where BOTH intermittently-fast
# populations co-occur: 5-20% duty ("hi", out.z) and <5% duty ("lo",
# out.y), each covering > 1/1.5 of a quarter window. The clip therefore
# interleaves 16-row stripes of two pixel groups inside the rip region:
# group B translates (by 6 px) on 8 of 100 frames — the STABILIZE-2
# averaging spreads each pulse over two frames at half magnitude, so
# B's fast duty is ~16% — and group C on 2 frames (~4% duty). A left
# "ocean" strip translates 2 px EVERY frame so the cumulative top-3%
# magnitude threshold is sane from frame 1 (without it the all-static
# early histogram drives UPPER to -0.1 and every pixel counts as fast,
# which the reference would equally suffer); once the first B pulse
# lands, the threshold walk stops just under the pulse magnitude (3 px)
# and exactly the pulse frames classify as fast.
B_MOVES = tuple(range(6, 100, 12))   # 8 moves -> hi duty
C_MOVES = (10, 58)                   # 2 moves -> lo duty
V = 6                                # translation px per move
OCEAN_X1 = 40


def make_clip():
    rng = np.random.default_rng(7)
    base = rng.uniform(0, 255, (H, 2 * W)).astype(np.float32)
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    full = np.ones((H, W), bool)
    stripe_b = (np.arange(H)[:, None] // 16 % 2 == 0) & full
    region = np.zeros((H, W), bool)
    region[8:112, RIP_X0:RIP_X1] = True
    in_b = stripe_b & region
    in_c = ~stripe_b & region
    in_a = np.zeros((H, W), bool)
    in_a[:, :OCEAN_X1] = True

    def shifted(s):
        return np.roll(base, -s, axis=1)[:, :W]

    frames = []
    sb = sc = 0
    for t in range(T + 1):
        if t in B_MOVES:
            sb += V
        if t in C_MOVES:
            sc += V
        g = base[:, :W].copy()
        g[in_a] = shifted(2 * t)[in_a]
        g[in_b] = shifted(sb)[in_b]
        g[in_c] = shifted(sc)[in_c]
        g = np.clip(g, 0, 255)
        frames.append(np.stack([g, g, g], -1).astype(np.uint8))
    return np.stack(frames)


def reference_masks(frames):
    """numpy/cv2 transcription of the jni loop; returns the final frame's
    red-overlay mask (bool) and the last rip vote mask pre-warmup-gate."""
    THRESH_BINS, RESOLUTION = 100, 10
    LOWER, MID = 0.2, 0.5
    hist = np.zeros(THRESH_BINS, np.int64)
    histsum = 0
    accumulator = np.zeros((H, W), np.float64)
    stable = np.zeros((STABILIZE, H, W, 2), np.float32)
    prev = cv2.cvtColor(frames[0], cv2.COLOR_BGR2GRAY)
    mask = np.zeros((H, W), bool)
    for i in range(1, len(frames)):
        gray = cv2.cvtColor(frames[i], cv2.COLOR_BGR2GRAY)
        flow = cv2.calcOpticalFlowFarneback(
            prev, gray, None, 0.5, 3, 5, 3, 15, 1.2, 0)
        prev = gray
        stable += flow[None]
        current = stable[i % STABILIZE] / STABILIZE
        stable[i % STABILIZE] = 0.0
        mag, _ang = cv2.cartToPolar(current[..., 0], current[..., 1],
                                    angleInDegrees=True)
        bins = (mag * RESOLUTION).astype(np.int64)   # C truncation
        ok = (bins >= 0) & (bins < THRESH_BINS)
        np.add.at(hist, bins[ok], 1)
        histsum += int(ok.sum())
        threshsum = 0
        b = THRESH_BINS - 1
        while threshsum < histsum * 0.03:
            threshsum += int(hist[b])
            b -= 1
        upper = b / float(RESOLUTION)
        accumulator += (mag > upper)
        # duty bands (jni:271-284): int truncation of the accumulator
        val = accumulator.astype(np.int64)
        hi_duty = (val > 0.05 * i) & (val < 0.2 * i)       # out.z
        lo_duty = (val <= 0.05 * i) & (val > 0)            # out.y nonzero
        # 40x40 windows, stride 20 (jni:289-309)
        votes = np.zeros((H, W), np.int32)
        for y in range(0, H - 2 * LOCALWIN, LOCALWIN):
            for x in range(0, W - 2 * LOCALWIN, LOCALWIN):
                win_hi = hi_duty[y:y + 2 * LOCALWIN, x:x + 2 * LOCALWIN]
                win_lo = lo_duty[y:y + 2 * LOCALWIN, x:x + 2 * LOCALWIN]
                if (win_hi.sum() > LOCALWIN * LOCALWIN / 1.5 and
                        win_lo.sum() > LOCALWIN * LOCALWIN / 1.5):
                    votes[y:y + 2 * LOCALWIN, x:x + 2 * LOCALWIN] += win_lo
        mask = votes == 4
        if i <= 90:
            mask = np.zeros((H, W), bool)
    return mask


def iou(a, b):
    inter = (a & b).sum()
    union = (a | b).sum()
    return inter / union if union else 1.0


@pytest.mark.slow
def test_android_rip_mask_iou_vs_jni_reference():
    frames = make_clip()
    want = reference_masks(frames)
    # the detector must actually fire inside the rip channel
    assert want.sum() > 200, want.sum()
    assert want[:, RIP_X0:RIP_X1].sum() > 0.5 * want.sum()

    cfg = ModeConfig(xdim=W, ydim=H, total_frames=T)
    init, step = make_android(cfg)
    state = init(jnp.asarray(frames[0]))
    scan = jax.jit(lambda s, fs: jax.lax.scan(step, s, fs))
    state, outs = scan(state, jnp.asarray(frames[1:]))
    # red overlay sets the R channel to 255 on rip pixels (jni:313-320)
    last = np.asarray(outs[-1])
    got = last[..., 2] == 255
    score = iou(got, want)
    assert score > 0.75, f"android rip-mask IoU {score:.3f}"


def compute_android_iou_for_bench():
    """Used by bench.py extras."""
    frames = make_clip()
    want = reference_masks(frames)
    cfg = ModeConfig(xdim=W, ydim=H, total_frames=T)
    init, step = make_android(cfg)
    state = init(jnp.asarray(frames[0]))
    state, outs = jax.jit(
        lambda s, fs: jax.lax.scan(step, s, fs))(state,
                                                 jnp.asarray(frames[1:]))
    got = np.asarray(outs[-1])[..., 2] == 255
    return float(iou(got, want))


def test_cumulative_histogram_overflow_guard():
    """The jni's cumulative int counters would wrap (UB) after ~7k frames
    at 640x480; the pipeline halves hist/histsum past 2^30 instead, which
    preserves the top-3% threshold (it depends only on the ratio)."""
    rng = np.random.default_rng(5)
    frames = rng.uniform(0, 255, (3, H, W, 3)).astype(np.uint8)
    cfg = ModeConfig(xdim=W, ydim=H)
    init, step = make_android(cfg)
    state = init(jnp.asarray(frames[0]))
    state, _ = step(state, jnp.asarray(frames[1]))

    # 1. the guard fires: counters past 2^30 shrink across a step instead
    #    of marching toward the int32 wrap.
    big = state._replace(hist=state.hist * (1 << 16),
                         histsum=state.histsum * (1 << 16))
    assert int(big.histsum) > (1 << 30)
    nxt_big, _ = step(big, jnp.asarray(frames[2]))
    assert 0 < int(nxt_big.histsum) < int(big.histsum)

    # 2. the halving preserves the top-3% threshold (it depends only on
    #    the hist/histsum ratio; integer floor costs at most one bin).
    from ripcurrents_tpu.config import HistogramParams
    from ripcurrents_tpu.ops import hist as histops
    hp = HistogramParams.android()
    u0 = float(histops.upper_from_1d(big.hist, big.histsum, hp))
    u1 = float(histops.upper_from_1d(big.hist // 2, big.histsum // 2, hp))
    assert abs(u0 - u1) <= 1.0 / hp.resolution + 1e-6
