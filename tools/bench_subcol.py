"""A/B the detector-preset warp layout on hardware: wide subcolumns at
bres=4 (current production) vs narrow 128-wide subcolumns at smaller
residual budgets. Narrow blocks track local motion tighter, so a smaller
bres may hold accuracy at a fraction of the (2b+1)^2 tap cost; this
prints fps for each candidate AND the EPE of each candidate against the
exact gather warp on rip-like synthetic content, so the accuracy cost is
visible next to the speed gain.

Usage: python tools/bench_subcol.py [H W]   (default 1080 1920)
"""

import dataclasses
import sys

import numpy as np

sys.path.insert(0, ".")


def make_pair(h, w, rng):
    """Textured scene with shear + a fast 'rip' channel (large, locally
    varying displacements — the regime that forced bres=4)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = rng.uniform(0, 255, (h, w)).astype(np.float32)
    k = np.ones(7) / 7
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    dx = 3.0 * np.sin(2 * np.pi * yy / 240.0) \
        + 6.0 * np.exp(-((xx - w * 0.6) / (w * 0.05)) ** 2)
    dy = 2.0 * np.cos(2 * np.pi * xx / 320.0)
    ys = np.clip(yy + dy, 0, h - 1)
    xs = np.clip(xx + dx, 0, w - 1)
    y0 = ys.astype(np.int32)
    x0 = xs.astype(np.int32)
    fy = ys - y0
    fx = xs - x0
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    nxt = ((1 - fy) * (1 - fx) * base[y0, x0] + (1 - fy) * fx * base[y0, x1]
           + fy * (1 - fx) * base[y1, x0] + fy * fx * base[y1, x1])
    return base, nxt.astype(np.float32)


def main():
    from tools.benchlib import setup_compilation_cache
    setup_compilation_cache()
    import importlib
    import time

    import jax
    import jax.numpy as jnp

    from ripcurrents_tpu.config import FarnebackParams
    from tools.benchlib import stream_seconds_per_frame
    fbm = importlib.import_module("ripcurrents_tpu.flow.farneback")

    if len(sys.argv) > 2:
        sizes = [(int(sys.argv[1]), int(sys.argv[2]))]
    else:
        # the detector presets' home is the 640x480 reference working
        # resolution; 1080p is the scale-up check
        sizes = [(480, 640), (1080, 1920)]
    base = FarnebackParams.legacy()   # winsize 3 detector preset
    print(f"device={jax.devices()[0]}  preset=legacy(win3)")

    from ripcurrents_tpu.flow.fused_update import _subcol_width
    cases = [("bres=4 (prod)", dict(warp_residual=4)),
             ("sw=128 bres=4", dict(warp_residual=4, warp_subcol=128)),
             ("sw=128 bres=3", dict(warp_residual=3, warp_subcol=128)),
             ("sw=128 bres=2", dict(warp_residual=2, warp_subcol=128)),
             ("sw=def bres=3", dict(warp_residual=3))]
    for h, w in sizes:
        rng = np.random.default_rng(0)
        prev, nxt = make_pair(h, w, rng)
        gather = dataclasses.replace(base, warp_impl="gather",
                                     warp_budget=None)
        ref = np.asarray(fbm.farneback(jnp.asarray(prev),
                                       jnp.asarray(nxt), gather))
        wp = -(-w // 128) * 128
        for name, kw in cases:
            p = dataclasses.replace(base, warp_residual_hires=None, **kw)
            # resolved width (a pref that does not divide Wp falls back
            # to the default) — print the truth next to the label
            sw = _subcol_width(wp, kw.get("warp_subcol"))
            flow = np.asarray(fbm.farneback(jnp.asarray(prev),
                                            jnp.asarray(nxt), p))
            epe = np.sqrt(((flow - ref) ** 2).sum(-1))
            spf = stream_seconds_per_frame(h, w, 16, 24, p)
            print(f"{h}x{w} {name:22s} [sw@L0={sw:4d}]: "
                  f"{1.0 / spf:7.1f} fps  "
                  f"EPE-vs-gather mean {epe.mean():.3f} px  "
                  f"p95 {np.percentile(epe, 95):.3f}", flush=True)


if __name__ == "__main__":
    main()
