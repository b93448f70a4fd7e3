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
    float(g(*args))  # compile + warmup
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(*args))
        ts.append(((time.perf_counter() - t0) * 1e3 - _FLOOR_MS[0]) / reps)
    ms = sorted(ts)[1]
    print(f"{name:42s} {ms:8.3f} ms")
    return ms


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

    for k in range(p.levels, -1, -1):
        scale = p.pyr_scale ** k
        lh, lw = int(round(h * scale)), int(round(w * scale))
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = max(int(round(sigma * 5)) | 1, 3)
        print(f"--- level {k}: {lh}x{lw} (smooth {smooth_sz} taps) ---")

        timed(f"L{k} poly_exp_level (fused prep, 1 frame)",
              lambda a, c: fb.poly_exp_level(a + c, lh, lw, p.poly_n,
                                             p.poly_sigma, smooth_sz, sigma,
                                             channels_first=True),
              img, reps=reps)

        r0 = fb.poly_exp_level(img, lh, lw, p.poly_n, p.poly_sigma,
                               smooth_sz, sigma, channels_first=True)
        r1 = fb.poly_exp_level(img2, lh, lw, p.poly_n, p.poly_sigma,
                               smooth_sz, sigma, channels_first=True)
        th = _row_tile(lh)
        flow0 = jnp.zeros((2, lh, lw), jnp.float32)

        timed(f"L{k} prepare_expansions",
              lambda a, b, c: jax.tree.leaves(
                  prepare_expansions(a + c, b, th))[1],
              r0, r1, reps=reps)
        prep = prepare_expansions(r0, r1, th)
        timed(f"L{k} fused_update (first)",
              lambda f, c: fused_update_prepped(prep, f + c,
                                                p.warp_residual),
              flow0, reps=reps)
        m0 = fused_update_prepped(prep, flow0, p.warp_residual)
        timed(f"L{k} fused_iter (x{p.iterations - 1})",
              lambda m, c: fused_iter_prepped(prep, m + c, p.winsize,
                                              p.gaussian, p.warp_residual),
              m0, reps=reps)
        timed(f"L{k} fused_final_solve",
              lambda m, c: fused_final_solve(prep, m + c, p.winsize,
                                             p.gaussian),
              m0, reps=reps)

    print(f"\nfull pipeline: {total:.3f} ms -> {1e3 / total:.1f} fps")


if __name__ == "__main__":
    main()
