"""Command-line interface.

The reference selects its mode by editing/recompiling main.cpp:76-87 and
accepts `ripcurrents <video> [outputFileName]` (main.cpp:55-90). Here every
mode is a `--mode` flag with the same defaults; all compile-time constants
are exposed as flags.

    python -m ripcurrents_tpu beach.mp4 out --mode timelines
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from ripcurrents_tpu.pipelines.runner import MODES  # triggers registry

    p = argparse.ArgumentParser(
        prog="ripcurrents_tpu",
        description="TPU-native rip-current video flow engine")
    p.add_argument("video", nargs="?", default=None,
                   help="input video path ('-' for webcam)")
    p.add_argument("output", nargs="?", default="default",
                   help="output file stem (reference: outputFileName)")
    p.add_argument("--videos", nargs="+", default=None, metavar="VIDEO",
                   help="N input videos processed in lock-step as "
                        "independent streams sharded over the device "
                        "mesh (multi-camera deployment; one output per "
                        "stream: <stem>_s<i>.mp4). With --videos the "
                        "input role of the positional argument is "
                        "taken, so a positional (given BEFORE --videos "
                        "or after '--') names the output stem instead.")
    p.add_argument("--mesh-space", type=int, default=1, metavar="K",
                   help="with --videos: additionally shard frame rows "
                        "over a K-way 'space' mesh axis")
    p.add_argument("--mode", default="timelines",
                   choices=sorted(set(MODES) | {"stabilize", "validate",
                                                "wheel", "benchmark",
                                                "legacy-full"}),
                   help="pipeline mode (reference default: timelines)")
    p.add_argument("--chunk", type=int, default=8,
                   help="frames per device dispatch")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--xdim", type=int, default=640)
    p.add_argument("--ydim", type=int, default=480)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bright-option", type=int, default=0, choices=[0, 1, 2],
                   help="brightColor: 0=mean 1=max-V 2=min-V (main.cpp:1320)")
    p.add_argument("--no-output", action="store_true",
                   help="skip video encoding (throughput measurement)")
    p.add_argument("--no-host-prep", action="store_true",
                   help="disable the native FramePump host resize path")
    p.add_argument("--metrics-json", default=None, metavar="PATH",
                   help="write per-run metrics (fps, stage times) as JSON")
    p.add_argument("--preview", action="store_true",
                   help="live imshow window (needs a display; the "
                        "reference shows one per mode)")

    ck = p.add_argument_group("checkpoint/resume")
    ck.add_argument("--checkpoint-every", type=int, default=None,
                    metavar="N", help="save pipeline state every N frames")
    ck.add_argument("--checkpoint", default=None, metavar="PATH",
                    help="checkpoint file (default: <output>.ckpt.npz)")
    ck.add_argument("--resume", default=None, metavar="PATH",
                    help="resume from a checkpoint written by a prior run")

    # Every reference compile-time constant (ripcurrents.hpp:4-13 and the
    # per-mode literals) is a flag; defaults are the reference values.
    c = p.add_argument_group("mode constants")
    c.add_argument("--window-size", type=int, default=10,
                   help="sliding flow-mean window (main.cpp:1084)")
    c.add_argument("--average-buffer", type=int, default=300,
                   help="BUFFER_FRAME ring length (ripcurrents.hpp:11)")
    c.add_argument("--timex-window", type=int, default=500,
                   help="timex exposure length (main.cpp:1213)")
    c.add_argument("--shear-window", type=int, default=100)
    c.add_argument("--bright-window", type=int, default=50)
    c.add_argument("--timeline-vertices", type=int, default=200)
    c.add_argument("--max-streaklines", type=int, default=5)
    c.add_argument("--population-vertices", type=int, default=50)
    c.add_argument("--n-streamline-seeds", type=int, default=20)
    c.add_argument("--legacy-seeds", type=int, default=250)
    c.add_argument("--lk-win", type=int, default=None,
                   help="LK window size (square; preset default 50)")
    c.add_argument("--lk-levels", type=int, default=None)
    c.add_argument("--lk-iters", type=int, default=None)
    c.add_argument("--lk-eps", type=float, default=None)
    c.add_argument("--thr-lower", type=float, default=0.2)
    c.add_argument("--thr-mid", type=float, default=0.5)
    c.add_argument("--thr-upper-init", type=float, default=45.0)
    c.add_argument("--hist-bins", type=int, default=50)
    c.add_argument("--hist-directions", type=int, default=36)
    c.add_argument("--hist-resolution", type=int, default=20)
    c.add_argument("--hist-top-frac", type=float, default=0.05)
    c.add_argument("--warp-impl", default=None,
                   choices=["fused", "tiled", "shift", "gather"],
                   help="override the Farneback warp strategy")
    c.add_argument("--warp-residual", type=int, default=None,
                   help="override the tiled/fused warp residual budget")
    c.add_argument("--warp-subcol", type=int, default=None,
                   help="override the fused-warp subcolumn width "
                        "(e.g. 128; must divide the padded frame width)")
    c.add_argument("--dump-matches", action="store_true",
                   help="--mode stabilize: write per-frame keypoint-match "
                        "visualizations to match/ (the reference's debug "
                        "dump, main.cpp:1625-1637)")
    c.add_argument("--stab-features", default="harris",
                   choices=["harris", "akaze"],
                   help="stabilizeTPU feature engine: Harris corners or "
                        "the TPU-native AKAZE-class detector/descriptor "
                        "(flow/akaze_tpu.py)")

    d = p.add_argument_group(
        "multi-host stream farm (parallel/distributed.py): every host runs "
        "the same command with its own videos; aggregate metrics ride DCN")
    d.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="jax.distributed coordinator address")
    d.add_argument("--num-processes", type=int, default=None)
    d.add_argument("--process-id", type=int, default=None)
    return p


def _mode_config(args):
    import dataclasses

    from ripcurrents_tpu.config import HistogramParams, LKParams, Thresholds
    from ripcurrents_tpu.pipelines.common import ModeConfig
    lk = LKParams.particles()
    lk_kw = {}
    if args.lk_win is not None:
        lk_kw["win"] = (args.lk_win, args.lk_win)
    if args.lk_levels is not None:
        lk_kw["levels"] = args.lk_levels
    if args.lk_iters is not None:
        lk_kw["max_iters"] = args.lk_iters
    if args.lk_eps is not None:
        lk_kw["eps"] = args.lk_eps
    if lk_kw:
        lk = dataclasses.replace(lk, **lk_kw)
    return ModeConfig(
        xdim=args.xdim, ydim=args.ydim, seed=args.seed,
        bright_option=args.bright_option,
        window_size=args.window_size, average_buffer=args.average_buffer,
        timex_window=args.timex_window, shear_window=args.shear_window,
        bright_window=args.bright_window,
        timeline_vertices=args.timeline_vertices,
        max_streaklines=args.max_streaklines,
        population_vertices=args.population_vertices,
        n_streamline_seeds=args.n_streamline_seeds,
        legacy_seeds=args.legacy_seeds,
        lk=lk,
        thresholds=Thresholds(args.thr_lower, args.thr_mid,
                              args.thr_upper_init),
        hist=HistogramParams(bins=args.hist_bins,
                             directions=args.hist_directions,
                             resolution=args.hist_resolution,
                             top_frac=args.hist_top_frac),
        warp_impl=args.warp_impl, warp_residual=args.warp_residual,
        warp_subcol=args.warp_subcol,
        stab_features=args.stab_features,
    )


def _stabilize_akaze(args):
    """AKAZE + cross-match + RANSAC homography stabilization
    (main.cpp:1556-1682). Feature detection/matching is host-side OpenCV —
    the documented non-TPU fallback (SURVEY.md section 2.2); the TPU-native
    stabilizers are --mode phaseCorrelate and the flow-mean stabilizer."""
    import os

    import cv2
    from ripcurrents_tpu.io.video import VideoReader, VideoWriter
    reader = VideoReader(args.video)
    writer = None
    if getattr(args, "dump_matches", False):
        # Per-frame match visualizations, as the reference dumps to a
        # match/ directory next to the output (main.cpp:1625-1637).
        os.makedirs("match", exist_ok=True)
    # OpenCV 5.x moved AKAZE to contrib; SIFT is the closest in-tree
    # detector/descriptor (same cross-match + RANSAC pipeline either way).
    if hasattr(cv2, "AKAZE_create"):
        algorithm = cv2.AKAZE_create()
    else:
        algorithm = cv2.SIFT_create()
    matcher = cv2.DescriptorMatcher_create("BruteForce")
    prev = None
    for n, frame in enumerate(reader):
        cur = cv2.resize(frame, (args.xdim, args.ydim),
                         interpolation=cv2.INTER_AREA)
        if prev is None:
            prev = cur
            continue
        kp1, d1 = algorithm.detectAndCompute(prev, None)
        kp2, d2 = algorithm.detectAndCompute(cur, None)
        correction = cur
        if d1 is not None and d2 is not None and len(kp1) and len(kp2):
            m12 = matcher.match(d1, d2)
            m21 = matcher.match(d2, d1)
            good = []
            for fwd in m12:
                bwd = m21[fwd.trainIdx]
                if bwd.trainIdx == fwd.trainIdx:
                    p1 = kp1[fwd.trainIdx].pt
                    p2 = kp2[fwd.trainIdx].pt
                    if abs(p1[0] - p2[0]) < 1.0 and abs(p1[1] - p2[1]) < 1.0:
                        good.append(fwd)
            if good:
                if getattr(args, "dump_matches", False):
                    vis = cv2.drawMatches(prev, kp1, cur, kp2, good, None)
                    cv2.imwrite(os.path.join("match", f"match_{n}.jpg"),
                                vis)
                src = np.float32([kp1[m.trainIdx].pt for m in good])
                dst = np.float32([kp2[m.trainIdx].pt for m in good])
                if len(good) >= 4:
                    m, _ = cv2.findHomography(src, dst, cv2.RANSAC)
                    if m is not None:
                        correction = cv2.warpPerspective(
                            cur, np.linalg.inv(m), (args.xdim, args.ydim))
        if writer is None and not args.no_output:
            writer = VideoWriter("stablization.mp4", reader.fps,
                                 (args.ydim, args.xdim))
        if writer:
            writer.write(correction)
        prev = correction
        print(f"frames processed: {n}", flush=True)
        if args.max_frames and n >= args.max_frames:
            break
    if writer:
        writer.close()


def _validate(args):
    """validate_streamlines (main.cpp:303-443): integrate one streamline
    through the analytic circular field and report the orbit error."""
    import jax.numpy as jnp
    from ripcurrents_tpu.dynamics import advect
    flow = advect.circular_field(args.ydim, args.xdim)
    res = advect.streamline(jnp.array([200.0, 200.0]), flow, dt=0.03,
                            iterations=3500)
    pts = np.asarray(res.points)
    center = np.array([args.xdim / 2.0, args.ydim / 2.0])
    r = np.sqrt(((pts - center) ** 2).sum(-1))
    drift = abs(r[-1] - r[0]) / r[0]
    print(f"orbit radius start={r[0]:.3f} end={r[-1]:.3f} "
          f"drift={drift * 100:.3f}%")
    return 0 if drift < 0.05 else 1


def _wheel(args):
    """Generate the color-wheel legend PNG (android wheel(),
    jni/ripcurrents.cpp:31-70)."""
    import cv2
    from ripcurrents_tpu.viz.color import color_wheel
    img = np.asarray(color_wheel(480))
    cv2.imwrite("wheel.png", img)
    print("Generated wheel.png")


def _benchmark(args):
    """farnebackAndLkSpeedComparison (ripcurrents_module.cpp:696-721):
    time Farneback vs dense-grid LK on one frame pair. The dense grid
    (every pixel, 307k points at 640x480) runs the dense LK engine
    (flow/dense_lk.py) — box-filter window sums + tiled warp — instead of
    307k independent gather-per-point tracks. Timing materializes a scalar
    reduction (block_until_ready is unreliable on relayed transports)."""
    import time
    import jax
    import jax.numpy as jnp
    from ripcurrents_tpu.config import FarnebackParams, LKParams
    from ripcurrents_tpu.flow.dense_lk import dense_lk
    from ripcurrents_tpu.flow.farneback import farneback
    from ripcurrents_tpu.io.video import VideoReader
    from ripcurrents_tpu.pipelines.common import ModeConfig, prep_frame

    cfg = ModeConfig(xdim=args.xdim, ydim=args.ydim)
    reader = VideoReader(args.video)
    it = iter(reader)
    _, g1 = prep_frame(jnp.asarray(next(it)), cfg, first=True)
    _, g2 = prep_frame(jnp.asarray(next(it)), cfg)

    fb = jax.jit(lambda a, b: jnp.mean(jnp.abs(farneback(
        a, b, FarnebackParams(0.5, 2, 3, 2, 15, 1.2, True)))))
    float(fb(g2, g1))
    t0 = time.perf_counter()
    float(fb(g2, g1))
    t_farne = time.perf_counter() - t0

    lk = jax.jit(lambda a, b: jnp.mean(jnp.abs(
        dense_lk(a, b, LKParams.dense_grid())[0])))
    float(lk(g1, g2))
    t0 = time.perf_counter()
    float(lk(g1, g2))
    t_lk = time.perf_counter() - t0
    n_pts = args.xdim * args.ydim
    print(f"farneback {t_farne * 1e3:.2f} ms")
    print(f"lk (dense grid, {n_pts} points) {t_lk * 1e3:.2f} ms")


def _legacy_full(args):
    """The legacy detector with all three parity output videos
    (ripcurrents.cpp:79-100: video_streamlines, video_streamlines_only,
    video_borders) plus the duty/flow diagnostic views."""
    import dataclasses
    from functools import partial

    import jax
    import jax.numpy as jnp

    from ripcurrents_tpu.io.video import VideoReader, VideoWriter
    from ripcurrents_tpu.pipelines.legacy import make_legacy
    from ripcurrents_tpu.pipelines.runner import scan_chunk

    reader = VideoReader(args.video)
    cfg = dataclasses.replace(_mode_config(args),
                              total_frames=max(reader.frame_count, 1))
    init, step = make_legacy(cfg)
    scan = jax.jit(partial(scan_chunk, step))

    frames_iter = iter(reader)
    first = next(frames_iter)
    state = init(jnp.asarray(first))

    writers = {}
    names = {"overlay_bgr": "video_borders", "streamlines_bgr":
             "video_streamlines", "density_bgr": "video_streamlines_only",
             "flow_hsv_bgr": "video_flow", "duty_bgr": "video_duty",
             "hist_wheel_bgr": "video_histogram"}
    import numpy as np
    buf, n = [], 0
    for frame in frames_iter:
        buf.append(frame)
        n += 1
        if len(buf) == args.chunk or (args.max_frames and n >= args.max_frames):
            state, outs = scan(state, jnp.asarray(np.stack(buf)))
            for field, stem in names.items():
                arr = np.asarray(getattr(outs, field))
                if field not in writers:
                    writers[field] = VideoWriter(
                        f"{stem}.mp4", reader.fps, arr.shape[1:3])
                writers[field].write_batch(arr)
            print(f"frames processed: {n}", flush=True)
            buf = []
        if args.max_frames and n >= args.max_frames:
            break
    for wtr in writers.values():
        wtr.close()


def main(argv=None) -> int:
    import os
    plat = os.environ.get("RIPC_JAX_PLATFORM")
    if plat:
        # Override the backend even when a site hook pre-registered one
        # (e.g. force CPU for tests on TPU-attached hosts).
        import jax
        jax.config.update("jax_platforms", plat)
    if os.environ.get("RIPC_COMPILE_CACHE", "1") != "0":
        # Persistent XLA compile cache: the fused-kernel graphs take
        # 20-40 s to compile; repeat CLI runs on the same shapes drop
        # from minutes to seconds. RIPC_COMPILE_CACHE=0 disables;
        # JAX_COMPILATION_CACHE_DIR (stock jax env var) overrides the dir.
        import jax
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   "/tmp/jax_cache")
        for k, v in (("jax_compilation_cache_dir", cache_dir),
                     ("jax_persistent_cache_min_compile_time_secs", 1.0)):
            try:
                jax.config.update(k, v)
            except Exception:
                pass
    args = build_parser().parse_args(argv)
    if not args.videos and not args.video:
        print("error: an input video is required (positional or "
              "--videos)", file=sys.stderr)
        return 2
    if args.coordinator or (args.num_processes or 0) > 1:
        # Join the multi-host runtime BEFORE any backend use; each host
        # then processes its own videos (stream farm over DCN).
        from ripcurrents_tpu.parallel.distributed import init_cluster
        init_cluster(args.coordinator, args.num_processes, args.process_id)
    if args.mode == "stabilize":
        _stabilize_akaze(args)
        return 0
    if args.mode == "validate":
        return _validate(args)
    if args.mode == "wheel":
        _wheel(args)
        return 0
    if args.mode == "benchmark":
        _benchmark(args)
        return 0
    if args.mode == "legacy-full":
        _legacy_full(args)
        return 0

    cfg = _mode_config(args)
    if args.videos:
        # Multi-camera deployment: N streams in lock-step over the
        # device mesh (pipelines/multirunner.py). The positional slot,
        # if filled, names the output stem (the input role is taken).
        stem = args.video if args.video is not None else args.output
        from ripcurrents_tpu.pipelines.multirunner import run_videos
        run_videos(args.mode, args.videos,
                   None if args.no_output else stem, cfg,
                   chunk=args.chunk, max_frames=args.max_frames,
                   space=args.mesh_space,
                   metrics_json=args.metrics_json)
        return 0

    from ripcurrents_tpu.pipelines.runner import run_video
    out = None if args.no_output else f"{args.output}.mp4"
    frame_skip = 3 if args.mode == "android" else 1
    max_frames = args.max_frames
    if args.mode == "timex":
        # The reference's timex loop runs exactly windowSize frames
        # (main.cpp:1213-1218).
        max_frames = min(max_frames or cfg.timex_window, cfg.timex_window)
    ckpt = args.checkpoint or f"{args.output}.ckpt"
    run_video(args.mode, args.video, out, cfg, chunk=args.chunk,
              max_frames=max_frames, frame_skip=frame_skip,
              host_prep=not args.no_host_prep,
              checkpoint_every=args.checkpoint_every,
              checkpoint_path=ckpt, resume=args.resume,
              metrics_json=args.metrics_json, preview=args.preview)
    return 0


if __name__ == "__main__":
    sys.exit(main())
