"""A/B the >=1MP per-level ITERATION schedule (FarnebackParams.iters_hires)
on hardware: 1080p windowed-preset stream fps + mean/p95 EPE vs cv2 per
schedule.

Rationale: the BASELINE bar is EPE < 0.5 px vs OpenCV — not iteration
parity — and each iteration application costs a fixed ~0.31 ms at the
1080p level (docs/DESIGN.md fit). Coarse pyramid levels only seed the
finest level's refinement, so they may converge in fewer passes. This
tool adjudicates which schedules stay inside the EPE budget and what
they pay back in throughput; the verdict gates config.iters_hires.

Schedules are tuples indexed FINEST level first (like warp_residual):
(3, 2, 2) = 3 iterations at 1080x1920, 2 at 540x960, 2 at 270x480.

Usage: python tools/bench_iters.py   (requires TPU hardware)
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tools.benchlib import setup_compilation_cache  # noqa: E402


def main():
    setup_compilation_cache()
    import cv2
    import jax
    import jax.numpy as jnp

    from bench import _stream_fps, make_clip
    from ripcurrents_tpu.config import FarnebackParams
    from ripcurrents_tpu.flow.farneback import farneback

    assert jax.default_backend() == "tpu", "requires TPU hardware"

    base = FarnebackParams.windowed()

    # Two content types so a schedule cannot overfit one texture: the
    # bench clip (drifting texture + traveling wave) and the detector
    # golden's rip-style clip (shoreward bands + sheared rip channel).
    rng = np.random.default_rng(0)
    clip_a = make_clip(1080, 1920, 2, rng)
    import importlib.util
    import pathlib
    here = pathlib.Path(__file__).resolve().parent
    spec = importlib.util.spec_from_file_location(
        "golden_detector_1080p", here / "golden_detector_1080p.py")
    gd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gd)
    clip_b = gd.make_rip_clip(2)[..., 0]

    pairs = []
    for clip in (clip_a, clip_b):
        want = cv2.calcOpticalFlowFarneback(
            clip[0], clip[1], None, base.pyr_scale, base.levels,
            base.winsize, base.iterations, base.poly_n, base.poly_sigma,
            cv2.OPTFLOW_FARNEBACK_GAUSSIAN)
        pairs.append((jnp.asarray(clip[0].astype(np.float32)),
                      jnp.asarray(clip[1].astype(np.float32)), want))

    scheds = [None, (3, 2, 2), (3, 2, 3), (3, 3, 2), (2, 3, 3),
              (2, 2, 2), (1, 2, 2)]
    if len(sys.argv) > 1:
        scheds = [None if a == "None" else tuple(map(int, a.split(",")))
                  for a in sys.argv[1:]]
    for sched in scheds:
        p = dataclasses.replace(base, iters_hires=sched)
        t0 = time.time()
        rows = []
        for f0, f1, want in pairs:
            got = np.asarray(farneback(f0, f1, p))
            epe = np.sqrt(((got - want) ** 2).sum(-1))
            rows.append(f"{epe.mean():.4f}/{np.percentile(epe, 95):.4f}")
        fps = _stream_fps(1080, 1920, 16, 24, p)
        print(f"iters_hires={str(sched):12s}: EPE mean/p95 bench "
              f"{rows[0]}  rip {rows[1]} px | {fps:7.1f} fps "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
