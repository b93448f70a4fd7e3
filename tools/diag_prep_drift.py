"""Characterize the RIPC_PREP=1 flow deviation at 1080p.

verify_knobs gates configs on max |dev| < 0.25 px vs the knobs-off flow.
The Pallas prep kernel computes the SAME banded matmuls but through
shifted zero-padded shared windows, so MXU f32 accumulation order
differs; iterative refinement can amplify that rounding at
ill-conditioned pixels. This prints the deviation distribution plus the
config's own EPE vs cv2 so a drift verdict can distinguish "isolated
rounding amplification, same accuracy" from "broken lowering"
(a bad DMA corrupts whole tiles -> a large pixel fraction).

Usage: python tools/diag_prep_drift.py   (on the TPU)
"""

import importlib
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def _clip(h, w):
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (h, w)).astype(np.float32)
    k = np.ones(5) / 5
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    f0 = np.clip(base, 0, 255).astype(np.uint8)
    f1 = np.clip(np.roll(base, 2, axis=1) + 1.5, 0, 255).astype(np.uint8)
    return f0, f1


def _flow(f0, f1, p):
    import jax.numpy as jnp
    fb = importlib.import_module("ripcurrents_tpu.flow.farneback")
    fb._pipe_default.cache_clear()
    fb._ups_pallas_default.cache_clear()
    fb._prep_pallas_default.cache_clear()
    return np.asarray(fb.farneback(jnp.asarray(f0.astype(np.float32)),
                                   jnp.asarray(f1.astype(np.float32)), p))


def main():
    from tools.benchlib import setup_compilation_cache
    setup_compilation_cache()
    import cv2

    from ripcurrents_tpu.config import FarnebackParams
    p = FarnebackParams.windowed()
    h, w = 1080, 1920
    f0, f1 = _clip(h, w)
    want = cv2.calcOpticalFlowFarneback(
        f0, f1, None, p.pyr_scale, p.levels, p.winsize, p.iterations,
        p.poly_n, p.poly_sigma, cv2.OPTFLOW_FARNEBACK_GAUSSIAN)

    os.environ["RIPC_PIPE"] = "0"
    os.environ["RIPC_UPS"] = "0"
    os.environ["RIPC_PREP"] = "0"
    base = _flow(f0, f1, p)
    os.environ["RIPC_PREP"] = "1"
    got = _flow(f0, f1, p)
    os.environ["RIPC_PREP"] = "0"

    dev = np.sqrt(((got - base) ** 2).sum(-1))
    epe_base = float(np.sqrt(((base - want) ** 2).sum(-1)).mean())
    epe_prep = float(np.sqrt(((got - want) ** 2).sum(-1)).mean())
    print(f"epe vs cv2: base {epe_base:.4f} px   prep {epe_prep:.4f} px")
    print(f"dev vs base: mean {dev.mean():.5f}  p99 {np.percentile(dev, 99):.5f}"
          f"  p99.99 {np.percentile(dev, 99.99):.5f}  max {dev.max():.5f}")
    for t in (0.05, 0.1, 0.25):
        print(f"  frac(dev > {t}): {(dev > t).mean():.2e}"
              f"  ({int((dev > t).sum())} px)")
    ys, xs = np.nonzero(dev > 0.25)
    if len(ys):
        print(f"  px > 0.25 bbox: rows [{ys.min()},{ys.max()}]"
              f" cols [{xs.min()},{xs.max()}] (tile-shaped cluster ="
              f" lowering bug; scattered = rounding)")


if __name__ == "__main__":
    main()
