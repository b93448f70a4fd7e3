"""Residual-budget (bres) ladder on the SHIPPED (1,1,1) >=1MP iteration
schedule — VERDICT r4 task #3b: after best-of-attempts, the residual
budget is the last unexplored licensed speed/accuracy dial (the gather
study shows bres, not iterations, is the remaining lever at >= 1 MP;
docs/DESIGN.md "Rip-content accuracy policy").

For each warp_residual_hires candidate (finest level first) the script
measures, on hardware:
  - streaming fps at 1080p (the headline methodology, bench._stream_fps),
  - mean/p95 EPE vs the committed cv2 oracle on the 1080p bench clip
    (guard: mean < 0.5 px),
  - mean/p95 EPE on the 1080p high-shear rip clip (guard row; the
    formal rip-content metric is the detector IoU, which runs the
    legacy preset and is NOT affected by this windowed-preset knob).

Candidate rationale: the roofline fit (ms/frame = 0.77 + apps*(0.1805
+ taps*0.0146)) prices the finest level's (2b+1)^2 taps; dropping the
finest bres 1 -> 0 (9 taps -> 1) saves ~0.12 ms/frame — the size of
the 897 -> 1000 fps gap — IF the EPE guards hold. Also tries the
wider 960-lane subcolumn (2 blocks x (960+256) lanes vs 3 x (640+256):
~10% fewer rolled lanes).

Usage (on the TPU host):  python tools/bres_ladder.py
"""

import dataclasses
import importlib.util
import pathlib
import sys

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

spec = importlib.util.spec_from_file_location("bench", HERE / "bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def main():
    bench._setup_jax()
    import jax.numpy as jnp
    from ripcurrents_tpu.config import FarnebackParams
    from ripcurrents_tpu.flow.farneback import farneback

    z = np.load(HERE / "ripcurrents_tpu" / "assets" / "epe_oracles_v1.npz")
    gd_spec = importlib.util.spec_from_file_location(
        "golden_detector_1080p", HERE / "tools" / "golden_detector_1080p.py")
    gd = importlib.util.module_from_spec(gd_spec)
    gd_spec.loader.exec_module(gd)

    clips = {
        "bench1080": bench.make_clip(1080, 1920, 2,
                                     np.random.default_rng(0)),
        "rip1080": gd.make_rip_clip(2)[..., 0],
    }
    oracles = {k: z[k + "_flow"].astype(np.float32) for k in clips}

    base = FarnebackParams.windowed()
    # r5 adjudication (v5e 2026-08-21): bres_112 894.5 fps, bres_111
    # 914.8 fps with EPE identical to 4 decimals on both clips
    # (0.3136 generic / 0.7097 rip) -> (1,1,1) adopted as the config
    # default. bres_0xx: 1001-1010 fps but generic EPE 0.7325 breaks
    # the 0.5 px acceptance gate — not licensed. subcol960: Mosaic
    # compile error (remote tpu_compile_helper exit 1) — dead end.
    candidates = [
        ("bres_112", {"warp_residual_hires": (1, 1, 2)}),  # pre-r5 default
        ("bres_012", {"warp_residual_hires": (0, 1, 2)}),
        ("bres_111", {"warp_residual_hires": (1, 1, 1)}),  # shipped (r5)
        ("bres_011", {"warp_residual_hires": (0, 1, 1)}),
        ("subcol960", {"warp_subcol_hires": 960}),
        ("bres012_sc960", {"warp_residual_hires": (0, 1, 2),
                           "warp_subcol_hires": 960}),
    ]
    for name, kw in candidates:
        pp = dataclasses.replace(base, **kw)
        row = {"config": name}
        try:
            for cname, clip in clips.items():
                got = np.asarray(farneback(jnp.asarray(clip[0]),
                                           jnp.asarray(clip[1]), pp))
                epe = np.sqrt(((got - oracles[cname]) ** 2).sum(-1))
                row[cname + "_epe"] = round(float(epe.mean()), 4)
                row[cname + "_p95"] = round(
                    float(np.percentile(epe, 95)), 4)
            row["fps_1080p"] = round(
                bench._stream_fps(1080, 1920, 16, 24, pp), 2)
        except Exception as e:
            row["error"] = repr(e)[:200]
        print(row, flush=True)


if __name__ == "__main__":
    main()
