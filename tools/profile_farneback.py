"""Per-stage wall-time profile of the Farneback engine at a given size.

Times each stage of the production fused path (flow/farneback.py) on the
real chip: Gaussian pre-smooth + level resize, banded polynomial expansion,
prepare_expansions, the fused first update, the fused iteration kernel, and
the final window-blur + solve. Reps are chained inside one jit through a
scalar carry (no host round-trips in the timed region; the relay transport
adds ~31 ms per dispatch, which would swamp millisecond kernels).

Usage: python tools/profile_farneback.py [H W [reps]]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


_FLOOR_MS = [0.0]  # host<->device round-trip per invocation, measured once


def timed(name, fn, *args, reps=20):
    """Median wall time of fn chained reps times inside one jit, with the
    per-invocation host round-trip floor (~31 ms through the axon relay
    tunnel) subtracted."""

    def chained(*a):
        def body(c, _):
            out = fn(*a, c)
            return 1e-7 * jnp.mean(jnp.abs(out)).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=reps)
        return c

    g = jax.jit(chained)
    # The axon relay drops connections transiently; one blip must not lose
    # the whole profile. Retry the stage, and on persistent failure report
    # it and move on (0.0 so sums stay finite, flagged in the row).
    for attempt in range(3):
        try:
            float(g(*args))  # compile + warmup
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(g(*args))
                ts.append(((time.perf_counter() - t0) * 1e3
                           - _FLOOR_MS[0]) / reps)
            ms = sorted(ts)[1]
            print(f"{name:42s} {ms:8.3f} ms", flush=True)
            return ms
        except Exception as e:  # noqa: BLE001 - relay/transport errors
            print(f"{name:42s}   FAILED (attempt {attempt + 1}/3): "
                  f"{repr(e)[:120]}", flush=True)
            time.sleep(30)
    return 0.0


def measure_floor():
    """One jit invocation returning a scalar: pure dispatch+sync latency."""
    g = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros(())
    float(g(z))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(g(z))
        ts.append((time.perf_counter() - t0) * 1e3)
    _FLOOR_MS[0] = sorted(ts)[len(ts) // 2]
    print(f"{'(dispatch+sync floor, subtracted)':42s} {_FLOOR_MS[0]:8.3f} ms")


def main():
    from tools.benchlib import setup_compilation_cache
    setup_compilation_cache()
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    import importlib

    from ripcurrents_tpu.config import FarnebackParams

    # the flow package re-exports the farneback *function* under the same
    # name, so import the module explicitly
    fb = importlib.import_module("ripcurrents_tpu.flow.farneback")
    from ripcurrents_tpu.flow.fused_update import (_row_tile,
                                                   fused_final_solve,
                                                   fused_iter_prepped,
                                                   fused_update_prepped,
                                                   prepare_expansions)

    measure_floor()
    p = FarnebackParams.windowed()
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    print(f"device={jax.devices()[0]}  size={h}x{w}  preset=windowed "
          f"(lvl{p.levels} win{p.winsize} it{p.iterations} n{p.poly_n})")

    total = timed("farneback full (all levels)",
                  lambda a, b, c: fb.farneback(a + c, b, p), img, img2,
                  reps=reps)

    timed("farneback_precompute (1 frame)",
          lambda a, c: sum(jnp.sum(e.astype(jnp.float32))
                           for e in fb.farneback_precompute(a + c, p)),
          img, reps=reps)
    exp0 = fb.farneback_precompute(img, p)
    exp1 = fb.farneback_precompute(img2, p)
    timed("farneback_from_expansions",
          lambda f0, c: fb.farneback_from_expansions(
              (exp0[0] + c.astype(exp0[0].dtype),) + tuple(exp0[1:]),
              exp1, (h, w), p),
          exp0[0], reps=reps)
    timed("farneback_stream (prev exp + frame)",
          lambda a, c: fb.farneback_stream(exp0, a + c, p)[0], img2,
          reps=reps)

    from ripcurrents_tpu.flow.fused_update import (HALO_X, HALO_Y,
                                                   fused_level_prepped)
    from ripcurrents_tpu.ops.image import resize_bilinear_cf_padded

    def pad_hw_flow(lh, lw, th):
        return (-(-lh // th) * th, -(-lw // 128) * 128)

    # Resolve the production per-level residual schedule (hires override).
    wr = p.warp_residual
    it_sched = None
    if h * w >= p.warp_hires_px:
        if p.warp_residual_hires is not None:
            wr = p.warp_residual_hires
        it_sched = p.iters_hires

    acc = 0.0
    for k in range(p.levels, -1, -1):
        scale = p.pyr_scale ** k
        lh, lw = int(round(h * scale)), int(round(w * scale))
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = max(int(round(sigma * 5)) | 1, 3)
        bres_k = (wr[min(k, len(wr) - 1)] if isinstance(wr, tuple) else wr)
        if it_sched is None:
            iters_k = p.iterations
        elif isinstance(it_sched, tuple):
            iters_k = it_sched[min(k, len(it_sched) - 1)]
        else:
            iters_k = it_sched
        iters_k = max(1, iters_k)
        th = _row_tile(lh)
        pad_hw = (-(-lh // th) * th + 2 * HALO_Y,
                  -(-lw // 128) * 128 + 2 * HALO_X)
        print(f"--- level {k}: {lh}x{lw} (smooth {smooth_sz} taps, "
              f"bres {bres_k}, iters {iters_k}) ---")

        def prod_exp(a, c, lh=lh, lw=lw, sm=smooth_sz, sg=sigma,
                     pad_hw=pad_hw):
            return fb.poly_exp_level(a + c, lh, lw, p.poly_n, p.poly_sigma,
                                     sm, sg, channels_first=True,
                                     pad_hw=pad_hw,
                                     pad_off=(HALO_Y, HALO_X),
                                     out_dtype=jnp.bfloat16)

        acc += timed(f"L{k} poly_exp_level (prod: halo'd bf16)",
                     prod_exp, img, reps=reps)

        try:
            r0 = prod_exp(img, jnp.zeros(()))
            r1 = prod_exp(img2, jnp.zeros(()))
            prep = prepare_expansions(r0, r1, th, hw=(lh, lw))
        except Exception as e:  # noqa: BLE001 - keep other levels alive
            print(f"L{k} prep FAILED: {repr(e)[:120]}", flush=True)
            continue
        flow0 = jnp.zeros((2, lh, lw), jnp.float32)

        flow0p = jnp.zeros((2,) + pad_hw_flow(lh, lw, th), jnp.float32)
        acc += timed(
            f"L{k} mega-kernel (upd+{iters_k - 1}it+solve, prod)",
            lambda f, c, prep=prep, b=bres_k, it=iters_k:
            fused_level_prepped(
                prep, f + c, p.winsize, p.gaussian, b, it,
                padded_io=True),
            flow0p, reps=reps)
        if k > 0:
            nh = int(round(h * p.pyr_scale ** (k - 1)))
            nw = int(round(w * p.pyr_scale ** (k - 1)))
            npad = pad_hw_flow(nh, nw, _row_tile(nh))
            acc += timed(
                f"L{k} flow upsample -> {nh}x{nw} (padded)",
                lambda f, c, lh=lh, lw=lw, nh=nh, nw=nw, npad=npad:
                    resize_bilinear_cf_padded(f + c, (lh, lw), (nh, nw),
                                              npad, 1.0 / p.pyr_scale),
                flow0p, reps=reps)

        # 3-kernel-chain components for comparison (chain is the 4K /
        # small-VMEM fallback; NOT what the stream path runs at 1080p).
        try:
            m0 = fused_update_prepped(prep, flow0, bres_k)
        except Exception as e:  # noqa: BLE001 - keep other levels alive
            print(f"L{k} chain prep FAILED: {repr(e)[:120]}", flush=True)
            continue
        timed(f"L{k}   [chain] fused_update (first)",
              lambda f, c, prep=prep, b=bres_k: fused_update_prepped(
                  prep, f + c, b),
              flow0, reps=reps)
        timed(f"L{k}   [chain] fused_iter (x1)",
              lambda m, c, prep=prep, b=bres_k: fused_iter_prepped(
                  prep, m + c, p.winsize, p.gaussian, b),
              m0, reps=reps)
        timed(f"L{k}   [chain] fused_final_solve",
              lambda m, c, prep=prep: fused_final_solve(
                  prep, m + c, p.winsize, p.gaussian),
              m0, reps=reps)

    print(f"\nfull pipeline: {total:.3f} ms -> {1e3 / total:.1f} fps")
    print(f"sum of prod per-level stages (1 expansion/frame): {acc:.3f} ms"
          f" -> {1e3 / max(acc, 1e-9):.1f} fps")


if __name__ == "__main__":
    main()
