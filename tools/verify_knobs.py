"""Hardware numeric check of the kernel opt-in knobs (RIPC_PIPE/UPS/PREP).

Interpret-mode tests verify the kernels' math on CPU, but a Mosaic
lowering bug can compile fine on the real chip and still produce wrong
numbers. For each knob config this computes mean EPE vs
cv2.calcOpticalFlowFarneback at the reference working resolution and at
1080p (vs the baseline config's flow, since cv2 at 1080p is slow but
cross-config agreement is the point), and FAILs loudly if any config
drifts.

Usage: python tools/verify_knobs.py   (run on the TPU; ~2 min)
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")

CONFIGS = [(0, 0, 0), (1, 0, 0), (2, 0, 0), (0, 1, 0), (0, 0, 1),
           (1, 1, 1), (2, 1, 1)]


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
    import importlib

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
    ok = True
    for h, w in ((480, 640), (1080, 1920)):
        f0, f1 = _clip(h, w)
        want = cv2.calcOpticalFlowFarneback(
            f0, f1, None, p.pyr_scale, p.levels, p.winsize, p.iterations,
            p.poly_n, p.poly_sigma, cv2.OPTFLOW_FARNEBACK_GAUSSIAN)
        base = None
        for pipe, ups, prep in CONFIGS:
            os.environ["RIPC_PIPE"] = str(pipe)
            os.environ["RIPC_UPS"] = str(ups)
            os.environ["RIPC_PREP"] = str(prep)
            try:
                got = _flow(f0, f1, p)
            except Exception as e:
                print(f"{h}x{w} pipe={pipe} ups={ups} prep={prep}: "
                      f"FAILED {repr(e)[:160]}", flush=True)
                ok = False
                continue
            epe = float(np.sqrt(((got - want) ** 2).sum(-1)).mean())
            dev = (0.0 if base is None else
                   float(np.abs(got - base).max()))
            base = got if base is None else base
            status = "ok" if epe < 0.5 and dev < 0.25 else "DRIFT"
            if status != "ok":
                ok = False
            print(f"{h}x{w} pipe={pipe} ups={ups} prep={prep}: "
                  f"EPE {epe:.3f} px, max dev vs base {dev:.4f} px "
                  f"[{status}]", flush=True)
    print("ALL OK" if ok else "FAILURES PRESENT", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
