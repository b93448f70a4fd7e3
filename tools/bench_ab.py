"""Quick A/B of Farneback engine configs on the attached chip.

Times farneback_stream at a given size for each config of interest
(pipelined vs serial level kernel, channels-first vs channels-last
output) in ONE process — the knobs are all trace-time, so each config
compiles its own executable. Reps are chained inside one jit through a
scalar carry (the axon relay adds ~31 ms per dispatch).

Usage: python tools/bench_ab.py [H W [nf reps]]
"""

import sys

import jax

sys.path.insert(0, ".")


def stream_fps(h, w, nf, reps, p, cf, nstreams=1):
    from tools.benchlib import stream_seconds_per_frame
    return 1.0 / stream_seconds_per_frame(h, w, nf, reps, p,
                                          channels_first=cf,
                                          nstreams=nstreams)


def main():
    from tools.benchlib import setup_compilation_cache
    setup_compilation_cache()
    import importlib
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    nf = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 12

    from ripcurrents_tpu.config import FarnebackParams
    fb = importlib.import_module("ripcurrents_tpu.flow.farneback")
    p = FarnebackParams.windowed()
    print(f"device={jax.devices()[0]}  {h}x{w}  nf={nf} reps={reps}")

    import os

    # channels-last baseline (the layout A/B), then each kernel knob's
    # marginal effect at cf=1: base, one-at-a-time, all-on.
    fps = stream_fps(h, w, nf, reps, p, False)
    print(f"pipe=0 ups=0 prep=0 cf=0: {fps:8.1f} fps "
          f"({1e3 / fps:.3f} ms/frame)", flush=True)
    for pipe, ups, prep in ((0, 0, 0), (1, 0, 0), (2, 0, 0), (0, 1, 0),
                            (0, 0, 1), (1, 1, 1), (2, 1, 1)):
        fb._pipe_default.cache_clear()
        fb._ups_pallas_default.cache_clear()
        fb._prep_pallas_default.cache_clear()
        os.environ["RIPC_PIPE"] = str(pipe)
        os.environ["RIPC_UPS"] = str(ups)
        os.environ["RIPC_PREP"] = str(prep)
        try:
            fps = stream_fps(h, w, nf, reps, p, True)
        except Exception as e:  # keep the remaining configs alive
            print(f"pipe={pipe} ups={ups} prep={prep} cf=1: FAILED "
                  f"{repr(e)[:200]}", flush=True)
            continue
        print(f"pipe={pipe} ups={ups} prep={prep} cf=1: {fps:8.1f} fps "
              f"({1e3 / fps:.3f} ms/frame)", flush=True)

    # multi-stream aggregate per-chip throughput (vmapped independent
    # streams) at DEFAULT knobs: the prep/ups kernels take whole-array
    # ANY-space refs which Pallas cannot batch, so the all-on config
    # from the grid above would fail to lower under vmap.
    for knob in ("RIPC_PIPE", "RIPC_UPS", "RIPC_PREP"):
        os.environ.pop(knob, None)
    fb._pipe_default.cache_clear()
    fb._ups_pallas_default.cache_clear()
    fb._prep_pallas_default.cache_clear()
    for ns in (2, 4):
        try:
            fps = stream_fps(h, w, max(nf // ns, 2), reps, p, True,
                             nstreams=ns)
        except Exception as e:
            print(f"streams={ns}: FAILED {repr(e)[:200]}", flush=True)
            continue
        print(f"streams={ns} (aggregate): {fps:8.1f} fps "
              f"({1e3 / fps:.3f} ms/frame)", flush=True)

    # chunked SINGLE stream: B independent pairs per dispatch
    from tools.benchlib import chunk_seconds_per_frame
    for b in (2, 4, 8):
        try:
            fps = 1.0 / chunk_seconds_per_frame(h, w, b, reps, p, True)
        except Exception as e:
            print(f"chunk={b}: FAILED {repr(e)[:200]}", flush=True)
            continue
        print(f"chunk={b} (single stream): {fps:8.1f} fps "
              f"({1e3 / fps:.3f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
