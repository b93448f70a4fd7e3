"""Calibrate the Farneback per-stage floor model on hardware.

Times farneback_stream at 1080p across warp-residual schedules and
iteration counts, then solves the small linear system for the per-stage
costs the floor model needs:

    ms/frame = base + apps * (n_taps * tap_ms + app_ms)

where apps = iterations (warp applications per level), n_taps =
(2*bres+1)^2 summed over levels weighted by their pixel fraction. The
fitted tap_ms / app_ms / base bound how far the 1000 fps/chip bar is
physically reachable at cv2 parity (the tap-free bound line); results
are recorded in the docs/DESIGN.md performance section. Fitting the
production kernel directly replaces the earlier microbench-anchor
extrapolation, which over-charged (the mega-kernel beat that "floor"
at 474 fps).

Usage: python tools/calibrate_floor.py [H W]
"""

import dataclasses
import sys

import numpy as np

sys.path.insert(0, ".")


def stream_ms(h, w, p, nf=16, reps=24):
    from tools.benchlib import stream_seconds_per_frame
    return stream_seconds_per_frame(h, w, nf, reps, p) * 1e3


def main():
    from tools.benchlib import setup_compilation_cache
    setup_compilation_cache()
    from ripcurrents_tpu.config import FarnebackParams
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920

    base_p = FarnebackParams.windowed()
    lvl_px = [(round(h * 0.5 ** k) * round(w * 0.5 ** k)) / (h * w)
              for k in range(base_p.levels + 1)]

    # (bres schedule, iterations) grid; n_tap_units = sum over levels of
    # pixel-fraction-weighted tap counts, app_units = iterations * sum of
    # pixel fractions (per-app fixed costs: rolls, tail, solve).
    cases = []
    for sched in ((1, 1, 2), (2, 2, 2), (4, 4, 4)):
        for iters in (1, 3):
            p = dataclasses.replace(base_p, iterations=iters,
                                    warp_residual=sched,
                                    warp_residual_hires=None)
            taps = sum(f * (2 * sched[min(k, len(sched) - 1)] + 1) ** 2
                       for k, f in enumerate(lvl_px))
            apps = sum(lvl_px)
            ms = stream_ms(h, w, p)
            cases.append((iters * taps, iters * apps, ms, sched, iters))
            print(f"sched={sched} iters={iters}: {ms:7.3f} ms/frame "
                  f"({1e3 / ms:6.1f} fps)  tap_units={iters * taps:.2f}",
                  flush=True)

    a = np.array([[c[0], c[1], 1.0] for c in cases])
    y = np.array([c[2] for c in cases])
    (tap_ms, app_ms, base), res, *_ = np.linalg.lstsq(a, y, rcond=None)
    print(f"\nfit: tap_ms={tap_ms:.4f} (per tap, L0-px-weighted unit)  "
          f"app_ms={app_ms:.4f} (per warp application unit)  "
          f"base={base:.3f} ms  residual={float(np.sqrt(res.mean())) if res.size else 0:.4f}")
    prod = base + 3 * (sum(f * (2 * b + 1) ** 2 for f, b in
                           zip(lvl_px, (1, 1, 2))) * tap_ms
                       + sum(lvl_px) * app_ms)
    print(f"model @ production (1,1,2)x3: {prod:.3f} ms "
          f"({1e3 / prod:.1f} fps)")
    zero_tap = base + 3 * sum(lvl_px) * app_ms
    print(f"tap-free bound (bres->0): {zero_tap:.3f} ms "
          f"({1e3 / zero_tap:.1f} fps) — everything except the tap FMA "
          "stream")


if __name__ == "__main__":
    main()
