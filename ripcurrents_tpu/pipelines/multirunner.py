"""Multi-stream runner: N video/camera streams sharded over a device mesh.

The user-facing deployment surface for SURVEY.md section 2.6's stream
parallelism (the multi-camera story that was previously bench-only):
each input video gets its own decode/host-prep producer thread, frames
are stacked on a leading stream axis, placed with a NamedSharding over
the mesh's 'stream' axis (rows optionally over 'space'), and the
mode's scan step is vmapped across streams — GSPMD partitions the
program so every device advances its own streams with zero
steady-state cross-chip traffic (ICI only if rows are sharded).
Per-stream overlay videos are written; `metrics_json` records the
AGGREGATE frames/sec across all streams.

Reference role: the reference is strictly single-video (its per-frame
loop, RipCurrents_main/main.cpp:484-517, farmed here across streams
and chips). Streams advance in lock-step chunks and processing stops
when the shortest stream ends — on a live multi-camera rig all
streams are endless, so lock-step is the natural schedule.

Single-chip note: on ONE device this runs the vmapped (batched-grid)
form of the kernels, which is measured slower per frame than the
sequential multi-stream scheduler (`farneback_stream_multi`,
docs/DESIGN.md) — the mesh path exists to scale ACROSS chips, where
each device sees batch-1 kernels again.
"""

from __future__ import annotations

import functools
import queue
import threading
import time
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ripcurrents_tpu.io.video import VideoReader, VideoWriter
from ripcurrents_tpu.pipelines.common import GRAY_INPUT, MODES, ModeConfig
from ripcurrents_tpu.pipelines import modes as _modes  # noqa: F401
from ripcurrents_tpu.pipelines import legacy as _legacy  # noqa: F401
from ripcurrents_tpu.pipelines import android as _android  # noqa: F401
from ripcurrents_tpu.pipelines.runner import RunStats


def _stream_mesh(n_streams: int, space: int = 1) -> Mesh:
    """('stream', 'space') mesh: stream axis = the largest divisor of
    n_streams that fits the available devices (streams must divide
    evenly so every device carries the same number), rows over an
    optional 'space' factor."""
    devs = jax.devices()
    budget = max(len(devs) // max(space, 1), 1)
    ns = max(d for d in range(1, min(budget, n_streams) + 1)
             if n_streams % d == 0)
    grid = np.array(devs[:ns * space]).reshape(ns, space)
    return Mesh(grid, ("stream", "space"))


@functools.lru_cache(maxsize=16)
def _multi_program(mode: str, cfg: ModeConfig, n_streams: int):
    """(vmapped init, jitted time-scan of the vmapped step). The scan
    iterates TIME with every stream advanced per step — state carries a
    leading (S,) axis, frames arrive as (T, S, ...)."""
    init_fn, step_fn = MODES[mode](cfg)
    vstep = jax.vmap(step_fn)

    def scan_streams(state, frames_ts):
        return jax.lax.scan(vstep, state, frames_ts)

    return jax.vmap(init_fn), jax.jit(scan_streams)


def _producer(reader, chunk: int, target_hw, gray: bool,
              max_frames: Optional[int], prefetch: int = 3):
    """Decode + host-prep one stream on its own thread, yielding
    (T<=chunk, H, W, 3) u8 stacks (or (T, H, W) gray for gray-input
    modes — 1/3 the upload bytes, same as the single-stream runner)."""
    import cv2
    q: queue.Queue = queue.Queue(maxsize=prefetch)

    def prep(f):
        if f.shape[:2] != target_hw:
            f = cv2.resize(f, (target_hw[1], target_hw[0]),
                           interpolation=cv2.INTER_LINEAR)
        return cv2.cvtColor(f, cv2.COLOR_BGR2GRAY) if gray else f

    def produce():
        try:
            buf, n = [], 0
            for f in reader:
                buf.append(prep(f))
                n += 1
                if len(buf) == chunk:
                    q.put(np.stack(buf))
                    buf = []
                if max_frames and n >= max_frames:
                    break
            if buf:
                q.put(np.stack(buf))
            q.put(None)
        except Exception as e:
            q.put(e)

    threading.Thread(target=produce, daemon=True).start()

    def pop():
        item = q.get()
        if isinstance(item, Exception):
            raise item
        return item  # ndarray or None (end of stream)

    return pop


def run_videos(mode: str, videos: Sequence[str],
               output_stem: Optional[str],
               cfg: Optional[ModeConfig] = None, chunk: int = 8,
               max_frames: Optional[int] = None,
               space: int = 1,
               metrics_json: Optional[str] = None,
               progress: bool = True) -> RunStats:
    """Process N videos through `mode` in lock-step over a device mesh.

    Writes one overlay video per stream (`<output_stem>_s<i>.mp4`;
    None skips encoding) and returns aggregate RunStats (frames =
    total across streams). `space` > 1 additionally shards frame rows
    over a 'space' mesh axis."""
    import dataclasses
    if len(videos) < 1:
        raise ValueError("run_videos needs at least one input video")
    readers = [VideoReader(v) for v in videos]
    if cfg is None:
        cfg = ModeConfig()
    if cfg.total_frames <= 0:
        cfg = dataclasses.replace(
            cfg, total_frames=max(max(r.frame_count for r in readers), 1))
    if mode not in MODES:
        raise KeyError(f"unknown mode {mode!r}; available: {sorted(MODES)}")
    n = len(videos)
    mesh = _stream_mesh(n, space)
    vinit, jscan = _multi_program(mode, cfg, n)
    gray_in = mode in GRAY_INPUT
    target_hw = (cfg.ydim, cfg.xdim)

    # First frames: host INTER_AREA to the common shape (the reference
    # preloads with INTER_AREA, main.cpp:125; identical shapes are
    # required to stack the stream axis).
    import cv2
    iters = [iter(r) for r in readers]
    firsts = []
    for it in iters:
        try:
            f = next(it)
        except StopIteration:
            raise RuntimeError("empty input video")
        if f.shape[:2] != target_hw:
            f = cv2.resize(f, (target_hw[1], target_hw[0]),
                           interpolation=cv2.INTER_AREA)
        firsts.append(f)
    state = vinit(jnp.asarray(np.stack(firsts)))
    state_sharding = NamedSharding(mesh, P("stream"))
    state = jax.device_put(state, state_sharding)
    frame_spec = (P(None, "stream", "space") if space > 1
                  else P(None, "stream"))
    frame_sharding = NamedSharding(mesh, frame_spec)

    pops = [_producer(it, chunk, target_hw, gray_in, max_frames)
            for it in iters]
    writers = [None] * n
    stats = RunStats()

    def flush(pending):
        nonlocal writers
        outs = np.asarray(pending)         # (T, S, H, W, 3)
        for i in range(n):
            if output_stem is not None:
                if writers[i] is None:
                    writers[i] = VideoWriter(f"{output_stem}_s{i}.mp4",
                                             readers[i].fps,
                                             outs.shape[2:4])
                writers[i].write_batch(outs[:, i])
        stats.frames += outs.shape[0] * n
        if progress:
            print(f"frames processed: {stats.frames} "
                  f"({outs.shape[0]} x {n} streams)", flush=True)

    t0 = time.perf_counter()
    pending = None
    while True:
        chunks = [p() for p in pops]
        if any(c is None for c in chunks):
            break
        t = min(c.shape[0] for c in chunks)
        if t == 0:
            break
        stacked = np.stack([c[:t] for c in chunks], axis=1)  # (T, S, ...)
        frames = jax.device_put(stacked, frame_sharding)
        state, outs = jscan(state, frames)
        if pending is not None:
            flush(pending)                 # overlaps the device dispatch
        pending = outs
        if t < chunk:
            break                          # a stream is ending
    if pending is not None:
        flush(pending)
    stats.seconds = time.perf_counter() - t0
    for w in writers:
        if w:
            w.close()
    for r in readers:
        r.close()
    if progress:
        print(f"{stats.frames} frames across {n} streams in "
              f"{stats.seconds:.2f}s (aggregate {stats.fps:.1f} fps)",
              flush=True)
    if metrics_json:
        import json
        with open(metrics_json, "w") as f:
            json.dump({
                "mode": mode, "streams": n,
                "frames_total": stats.frames,
                "seconds": round(stats.seconds, 4),
                "aggregate_fps": round(stats.fps, 3),
                "per_stream_fps": round(stats.fps / n, 3),
                "resolution": [cfg.ydim, cfg.xdim],
                "gray_upload": gray_in,
                "mesh": {"stream": mesh.shape["stream"],
                         "space": mesh.shape["space"]},
                "device": str(jax.devices()[0]),
            }, f)
            f.write("\n")
    return stats
