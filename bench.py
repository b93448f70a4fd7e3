"""Benchmark: dense 1080p Farneback optical-flow throughput per chip.

Prints ONE JSON line:
  {"metric": "farneback_1080p_fps", "value": N, "unit": "frames/sec",
   "vs_baseline": N/1000}

The driver-set target (BASELINE.md) is >=1000 fps of dense 1080p Farneback
flow per TPU chip. Methodology: batched frame pairs (vmap) through the
jitted engine with a production preset (winsize 10, 3 iterations, poly_n
15 — the reference's windowed-mean mode, main.cpp:1119), steady-state
timing over multiple repetitions after a compile+warmup pass. Auxiliary
fields report accuracy vs OpenCV (mean EPE at the reference's 640x480
working resolution) and 640x480 throughput.
"""

import json
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def _stage(msg):
    """Progress to stderr (stdout stays one JSON line for the driver)."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def make_clip(h, w, n, rng):
    yy = np.mgrid[0:h, 0:w][0].astype(np.float32)
    base = rng.uniform(0, 255, (h, w)).astype(np.float32)
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    frames = []
    for t in range(n):
        wave = 60 * np.sin(2 * np.pi * (yy / 24.0 - t * 0.11)) * (yy / h)
        drift = np.roll(base, shift=t, axis=1)
        frames.append(np.clip(drift * 0.7 + wave + 60, 0, 255)
                      .astype(np.uint8))
    return np.stack(frames)


def main():
    import jax
    import jax.numpy as jnp
    from ripcurrents_tpu.config import FarnebackParams
    from ripcurrents_tpu.flow.farneback import (farneback,
                                                farneback_precompute,
                                                farneback_stream)

    rng = np.random.default_rng(0)
    p = FarnebackParams.windowed()

    # Streaming throughput: consecutive frames of ONE video stream, the
    # production workload (every reference mode consumes flow of frame
    # t->t+1). The stream scan carries each frame's polynomial expansions
    # so they are computed once per frame, not twice per pair — flow
    # results are identical to the pairwise path.
    def stream_fps(h, w, nf, reps, pp=None):
        pp = p if pp is None else pp
        clip = make_clip(h, w, nf + 1, rng)
        frames = jnp.asarray(clip.astype(np.float32))

        def chained(fr):
            def rep(c, _):
                e0 = farneback_precompute(fr[0] + c, pp)

                def body(carry, f):
                    e_prev, acc = carry
                    # channels_first: flow consumed in the engine's native
                    # (2, h, w) layout — no final moveaxis pass.
                    flow, e_new = farneback_stream(e_prev, f, pp,
                                                   channels_first=True)
                    return (e_new, acc + jnp.mean(jnp.abs(flow))), None

                (_, acc), _ = jax.lax.scan(body, (e0, jnp.zeros(())),
                                           fr[1:])
                return 1e-7 * acc, None

            c, _ = jax.lax.scan(rep, jnp.zeros(()), None, length=reps)
            return c

        g = jax.jit(chained)
        _stage(f"stream compile+warmup {h}x{w}")
        float(g(frames))
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            float(g(frames))
            best = max(best, nf * reps / (time.perf_counter() - t0))
        _stage(f"stream timed {h}x{w}: {best:.1f} fps")
        return best

    # Timing note: on some transport backends block_until_ready() returns
    # before execution completes, so every timed call materializes a scalar
    # reduction of the result (honest end-to-end device time).
    def timed_fps(h, w, batch, reps):
        clip = make_clip(h, w, batch + 1, rng)
        prev = jnp.asarray(clip[:-1].astype(np.float32))
        nxt = jnp.asarray(clip[1:])
        # lax.map (not vmap): one frame pair in flight keeps HBM use at
        # single-frame scale; a frame already saturates the chip. The reps
        # are chained inside the jit through a scalar carry (each rep's
        # input depends on the previous rep's output, so no work can be
        # elided) to amortize the host<->device round-trip out of the
        # steady-state number.
        def chained(a, b):
            def body(c, _):
                out = jax.lax.map(
                    lambda ab: farneback(ab[0] + c, ab[1], p), (a, b))
                return c + 1e-7 * jnp.mean(jnp.abs(out)), None
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=reps)
            return c
        g = jax.jit(chained)
        _stage(f"compile+warmup {h}x{w}")
        float(g(prev, nxt))  # compile + warmup
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            float(g(prev, nxt))
            best = max(best, batch * reps / (time.perf_counter() - t0))
        _stage(f"timed {h}x{w}: {best:.1f} fps")
        return best

    # reps chosen so the ~31 ms per-invocation host round-trip (axon relay
    # tunnel) is amortized below 1% of the measured time.
    fps_1080 = stream_fps(1080, 1920, 8, 12)
    fps_640 = stream_fps(480, 640, 8, 24)
    fps_1080_pair = timed_fps(1080, 1920, 8, 12)

    # Detector presets (the flagship rip-detection engine configs, now on
    # the fused Pallas path at bres=4 — VERDICT r1 next-steps #2/#3) and
    # 4K (streamed-table kernels — next-step #5).
    extra_fps = {}
    for name, pp, h, w, nf, reps in [
            ("fps_640x480_legacy_preset", FarnebackParams.legacy(),
             480, 640, 8, 24),
            ("fps_1080p_legacy_preset", FarnebackParams.legacy(),
             1080, 1920, 8, 6),
            ("fps_640x480_android_preset", FarnebackParams.android(),
             480, 640, 8, 24),
            ("fps_4k_win10", p, 2160, 3840, 4, 4),
    ]:
        try:
            _stage(name)
            extra_fps[name] = round(stream_fps(h, w, nf, reps, pp=pp), 2)
        except Exception as e:
            extra_fps[name + "_error"] = repr(e)[:160]

    # --- end-to-end mode throughput: decode -> scan -> encode through the
    # runner (the framework number, not just the kernel; VERDICT r1 #9).
    # On this relay-tunneled dev chip host<->device transfer dominates;
    # on a TPU VM the same path runs at PCIe speed.
    def e2e_fps(mode, n=48):
        import tempfile

        import cv2
        from ripcurrents_tpu.pipelines.runner import run_video
        clip = make_clip(480, 640, n, rng)
        path = tempfile.mktemp(suffix=".mp4")
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                             (640, 480))
        for f in clip:
            wr.write(np.stack([f] * 3, axis=-1))
        wr.release()
        out = tempfile.mktemp(suffix=".mp4")
        run_video(mode, path, out, chunk=8, progress=False)   # compile
        return round(run_video(mode, path, out, chunk=8,
                               progress=False).fps, 2)

    e2e = {}
    try:
        _stage("e2e timelines")
        e2e["e2e_timelines_640_fps"] = e2e_fps("timelines")
        _stage("e2e legacy")
        e2e["e2e_legacy_640_fps"] = e2e_fps("legacy")
        # gray-input mode: the runner uploads host-prepped 2-D gray
        # (1/3 the bytes) — the transfer-frugality row (VERDICT r1 #4)
        _stage("e2e subtructAverageVector (gray upload)")
        e2e["e2e_subavg_gray_640_fps"] = e2e_fps("subtructAverageVector")
        e2e["e2e_note"] = ("host<->device on this dev chip goes through a "
                           "relay tunnel (~12 MB/s observed); e2e is "
                           "transfer-bound here, not compute-bound")
    except Exception as e:  # never let the aux numbers kill the bench line
        e2e["e2e_error"] = repr(e)[:200]

    # --- rip-mask IoU vs the OpenCV reference pipeline (BASELINE.md row) ---
    _stage("rip-mask IoU golden")
    rip_iou = None
    try:
        import sys as _sys
        _sys.path.insert(0, "tests")
        from test_iou_golden import compute_iou_for_bench
        rip_iou = round(compute_iou_for_bench(), 4)
    except Exception:
        pass

    # --- android end-to-end rip-mask IoU vs the jni reference loop ---
    _stage("android rip-mask IoU golden")
    android_iou = None
    try:
        from test_android_golden import compute_android_iou_for_bench
        android_iou = round(compute_android_iou_for_bench(), 4)
    except Exception:
        pass

    h2, w2 = 480, 640
    clip2 = make_clip(h2, w2, 2, rng)

    # --- accuracy vs OpenCV at 640x480 ---
    _stage("EPE vs cv2")
    mean_epe = None
    try:
        import cv2
        want = cv2.calcOpticalFlowFarneback(
            clip2[0], clip2[1], None, p.pyr_scale, p.levels, p.winsize,
            p.iterations, p.poly_n, p.poly_sigma,
            cv2.OPTFLOW_FARNEBACK_GAUSSIAN)
        got = np.asarray(farneback(jnp.asarray(clip2[0]),
                                   jnp.asarray(clip2[1]), p))
        mean_epe = float(np.sqrt(((got - want) ** 2).sum(-1)).mean())
    except Exception:
        pass

    result = {
        "metric": "farneback_1080p_fps",
        "value": round(fps_1080, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps_1080 / 1000.0, 4),
        "extra": {
            "fps_640x480": round(fps_640, 2),
            "fps_1080p_pairwise": round(fps_1080_pair, 2),
            "mean_epe_640x480_px": mean_epe,
            "rip_mask_iou": rip_iou,
            "android_rip_mask_iou": android_iou,
            **extra_fps,
            **e2e,
            "batch": 8,
            "params": "pyr0.5 lvl2 win10 it3 n15 s1.2 gaussian",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
