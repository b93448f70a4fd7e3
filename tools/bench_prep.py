"""Isolated A/B of the per-frame expansion prep (farneback_precompute).

The stream path's per-frame prep (pre-smooth o resize o poly correlation
for all levels, straight from the full-res frame) costs ~0.49 ms/frame
at 1080p on the XLA blocked path (docs/DESIGN.md table) against a ~0.1
ms memory floor. This times farneback_precompute alone — XLA blocked vs
the Pallas two-kernel prep (RIPC_PREP=1) — to separate "the Pallas prep
is not faster" from "the prep is hidden behind other stream work".

Usage: python tools/bench_prep.py [H W [reps]]   (on the TPU)
"""

import importlib
import os
import sys
import time

sys.path.insert(0, ".")


def prep_ms(h, w, reps, p):
    import jax
    import jax.numpy as jnp
    fb = importlib.import_module("ripcurrents_tpu.flow.farneback")
    import numpy as np
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))

    def chained(fr):
        def rep(c, _):
            e = fb.farneback_precompute(fr + c, p)
            s = sum(1e-7 * jnp.mean(jnp.abs(x.astype(jnp.float32)))
                    for x in e)
            return s, None
        c, _ = jax.lax.scan(rep, jnp.zeros(()), None, length=reps)
        return c

    g = jax.jit(chained)
    float(g(frame))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(frame))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    from tools.benchlib import setup_compilation_cache
    setup_compilation_cache()
    import jax
    from ripcurrents_tpu.config import FarnebackParams
    fb = importlib.import_module("ripcurrents_tpu.flow.farneback")
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    p = FarnebackParams.windowed()
    print(f"device={jax.devices()[0]}  {h}x{w}  reps={reps}")
    for prep in (0, 1):
        os.environ["RIPC_PREP"] = str(prep)
        fb._prep_pallas_default.cache_clear()
        try:
            ms = prep_ms(h, w, reps, p)
            print(f"prep={prep}: {ms:7.3f} ms/frame (all levels)",
                  flush=True)
        except Exception as e:
            print(f"prep={prep}: FAILED {repr(e)[:200]}", flush=True)
    os.environ["RIPC_PREP"] = "0"


if __name__ == "__main__":
    main()
