"""Quick A/B of Farneback engine configs on the attached chip.

Times farneback_stream at a given size for each config of interest
(pipelined vs serial level kernel, channels-first vs channels-last
output) in ONE process — the knobs are all trace-time, so each config
compiles its own executable. Reps are chained inside one jit through a
scalar carry (the axon relay adds ~31 ms per dispatch).

Usage: python tools/bench_ab.py [H W [nf reps]]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def stream_fps(h, w, nf, reps, p, cf):
    import importlib
    fb = importlib.import_module("ripcurrents_tpu.flow.farneback")
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 255, (nf + 1, h, w)).astype(np.float32))

    def chained(fr):
        def rep(c, _):
            e0 = fb.farneback_precompute(fr[0] + c, p)

            def body(carry, f):
                e_prev, acc = carry
                flow, e_new = fb.farneback_stream(e_prev, f, p,
                                                  channels_first=cf)
                return (e_new, acc + jnp.mean(jnp.abs(flow))), None

            (_, acc), _ = jax.lax.scan(body, (e0, jnp.zeros(())), fr[1:])
            return 1e-7 * acc, None

        c, _ = jax.lax.scan(rep, jnp.zeros(()), None, length=reps)
        return c

    g = jax.jit(chained)
    float(g(frames))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(frames))
        best = max(best, nf * reps / (time.perf_counter() - t0))
    return best


def main():
    import importlib
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    nf = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 12

    from ripcurrents_tpu.config import FarnebackParams
    fb = importlib.import_module("ripcurrents_tpu.flow.farneback")
    p = FarnebackParams.windowed()
    print(f"device={jax.devices()[0]}  {h}x{w}  nf={nf} reps={reps}")

    for pipe in (False, True):
        fb._pipe_default.cache_clear()
        import os
        os.environ["RIPC_PIPE"] = "1" if pipe else "0"
        for cf in (False, True):
            fps = stream_fps(h, w, nf, reps, p, cf)
            print(f"pipe={int(pipe)} cf={int(cf)}: {fps:8.1f} fps "
                  f"({1e3 / fps:.3f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
