"""Settle the rip-content accuracy question (VERDICT r3 task #3).

The shipped 1080p windowed preset measures 0.65-1.04 px mean EPE vs cv2
on the high-shear rip clip in every fused-warp config (docs/DESIGN.md
iters_hires table) — above the 0.5 px BASELINE budget — while the smooth
bench clip sits at ~0.31. Before spending more warp taps chasing the
budget, measure the EXACT bilinear gather warp (the accuracy ceiling of
the whole design: no residual clamp, no block bases) on the same clip:

  - if gather EPE << 0.5 px, the fused warp's clamped residual is the
    gap and a shear-adaptive residual could close it;
  - if gather EPE is also >= 0.5 px, the divergence is intrinsic to
    winsize-10 Farneback on shear content (implementation-order noise
    amplified by the flow's local gradients), the bar is content-bounded
    there, and the detector IoU goldens are the formal acceptance
    metric for 1080p rip content (BENCH detector_1080p_iou row).

Rows: warp x iteration-schedule ladder on BOTH 1080p clips, mean/p95 EPE
vs the committed cv2 oracles (assets/epe_oracles_v1.npz).

Usage: python tools/rip_epe_baseline.py   (requires TPU hardware)
"""

import dataclasses
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tools.benchlib import setup_compilation_cache  # noqa: E402


def main():
    setup_compilation_cache()
    import importlib.util

    import jax
    import jax.numpy as jnp

    from bench import make_clip
    from ripcurrents_tpu.config import FarnebackParams
    from ripcurrents_tpu.flow.farneback import farneback

    assert jax.default_backend() == "tpu", "requires TPU hardware"
    here = pathlib.Path(__file__).resolve().parent
    spec = importlib.util.spec_from_file_location(
        "golden_detector_1080p", here / "golden_detector_1080p.py")
    gd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gd)

    z = np.load(here.parent / "ripcurrents_tpu" / "assets"
                / "epe_oracles_v1.npz")
    clips = {
        "bench": (make_clip(1080, 1920, 2, np.random.default_rng(0)),
                  z["bench1080_flow"].astype(np.float32)),
        "rip": (gd.make_rip_clip(2)[..., 0],
                z["rip1080_flow"].astype(np.float32)),
    }

    base = FarnebackParams.windowed()
    gather = dict(warp_impl="gather", warp_budget=None,
                  warp_residual_hires=None, warp_subcol_hires=None)
    configs = [
        ("gather, cv2-exact iters", dict(**gather, iters_hires=None)),
        ("gather, (1,2,2) iters", dict(**gather, iters_hires=(1, 2, 2))),
        ("fused shipped (1,2,2) bres(1,1,2)", {}),
        ("fused (1,2,2) bres(2,1,2)",
         dict(warp_residual_hires=(2, 1, 2))),
        ("fused (1,2,2) bres(3,1,2)",
         dict(warp_residual_hires=(3, 1, 2))),
    ]
    for name, kw in configs:
        p = dataclasses.replace(base, **kw) if kw else base
        t0 = time.time()
        cols = []
        for cname, (clip, want) in clips.items():
            got = np.asarray(farneback(
                jnp.asarray(clip[0].astype(np.float32)),
                jnp.asarray(clip[1].astype(np.float32)), p))
            epe = np.sqrt(((got - want) ** 2).sum(-1))
            cols.append(f"{cname} {epe.mean():.4f}/"
                        f"{np.percentile(epe, 95):.4f}")
        print(f"{name:36s}: {'  '.join(cols)} px "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
