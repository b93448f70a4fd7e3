"""Stream runner: drives a mode's scan step over a video.

Replaces the reference's per-frame host loops (main.cpp:484-517 etc.) with
a pipelined host/device schedule:

- decode (+ optional native FramePump resize) runs on a producer thread,
  feeding fixed-size chunks through a bounded queue,
- each chunk's `lax.scan` is dispatched asynchronously; the previous
  chunk's outputs are materialized and handed to the writer thread while
  the device crunches the current one,
- encode happens on the VideoWriter's own thread.

When native/libframepump.so is built (`make -C native`), steady-state
frames are resized on host worker threads before upload — the mode's
on-device INTER_LINEAR resize is an exact identity at the target size, so
device work and (tunnel) transfer volume shrink. Both the pump's
fixed-point resize and the device float resize are within +-1 LSB of
cv2.resize (each equally cv2-faithful; they may differ from each other by
+-1 LSB at a few pixels, which chaotic trackers can amplify over long
clips — set host_prep=False for bit-stable comparisons against the pure
device path). First frames keep the raw path because the reference
preloads with INTER_AREA (main.cpp:125).
"""

from __future__ import annotations

import functools
import queue
import threading
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ripcurrents_tpu.io import native as io_native
from ripcurrents_tpu.io.video import VideoReader, VideoWriter
from ripcurrents_tpu.pipelines.common import GRAY_INPUT, MODES, ModeConfig
# mode registration side effects
from ripcurrents_tpu.pipelines import modes as _modes  # noqa: F401
from ripcurrents_tpu.pipelines import legacy as _legacy  # noqa: F401
from ripcurrents_tpu.pipelines import android as _android  # noqa: F401
from ripcurrents_tpu.utils.profiling import StageTimer


@dataclass
class RunStats:
    frames: int = 0
    seconds: float = 0.0

    @property
    def fps(self) -> float:
        return self.frames / self.seconds if self.seconds else 0.0


def scan_chunk(step_fn, state, frames):
    """lax.scan of a mode step over a (T, H, W, 3) chunk."""
    return jax.lax.scan(step_fn, state, frames)


@functools.lru_cache(maxsize=32)
def _program(mode: str, cfg: ModeConfig):
    """Memoized (init_fn, jitted scan) per mode+config: repeated run_video
    calls in one process (bench reps, notebook reruns, resume-after-kill)
    reuse the compiled executable instead of re-tracing a fresh closure."""
    init_fn, step_fn = MODES[mode](cfg)
    return init_fn, jax.jit(partial(scan_chunk, step_fn))


def _chunk_source(frames_iter, chunk: int, frame_skip: int,
                  max_frames: Optional[int], pump, prefetch: int = 3,
                  gray_hw: "Optional[tuple]" = None):
    """Decode (and optionally host-prep) frames on a producer thread,
    yielding (T<=chunk, H, W, 3) uint8 stacks — or (T<=chunk, H, W) gray
    stacks for gray-input modes (`gray_hw` = target (ydim, xdim)): resize +
    BGR2GRAY run on the host (exactly the reference's cv2 ops and order,
    main.cpp:493-494), cutting upload bytes 3x."""
    q: queue.Queue = queue.Queue(maxsize=prefetch)

    def to_gray(f):
        import cv2
        if f.shape[:2] != gray_hw:
            f = cv2.resize(f, (gray_hw[1], gray_hw[0]),
                           interpolation=cv2.INTER_LINEAR)
        return cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)

    def produce():
        try:
            n = 0
            skip = 0
            buf = []
            for f in frames_iter:
                skip += 1
                if skip % frame_skip:  # android-style decode subsampling
                    continue
                if pump is not None:
                    pump.push(f)
                else:
                    buf.append(to_gray(f) if gray_hw is not None else f)
                    if len(buf) == chunk:
                        q.put(np.stack(buf))
                        buf = []
                n += 1
                if max_frames and n >= max_frames:
                    break
            if pump is not None:
                pump.close()
            else:
                if buf:
                    q.put(np.stack(buf))
                q.put(None)
        except Exception as e:  # surface decode errors to the consumer
            q.put(e)

    threading.Thread(target=produce, daemon=True).start()

    if pump is not None:
        while True:
            resized, gray = pump.pop_batch(chunk)
            if gray_hw is not None:
                resized = gray
            if len(resized) == 0:
                # drain any late producer error
                try:
                    item = q.get_nowait()
                    if isinstance(item, Exception):
                        raise item
                except queue.Empty:
                    pass
                return
            yield resized
    else:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item


def _device_prefetch(gen, timer, depth: int = 1):
    """Upload chunks to the device one ahead of consumption.

    jax.device_put is asynchronous: issuing chunk i+1's host->device copy
    while chunk i's scan is still executing overlaps the transfer with
    compute (and with the writer thread's encode), instead of paying it
    serially at the head of every dispatch. Depth 1 bounds device memory
    at one extra chunk. The 'upload' timer leg records only the
    issue cost; the transfer itself hides under the previous chunk's
    device time (the leg budget for the serial wait shows up in
    'dispatch'/'materialize' if the overlap ever fails)."""
    buf = []
    for item in gen:
        with timer.stage("upload"):
            buf.append(jax.device_put(item))
        if len(buf) > depth:
            yield buf.pop(0)
    yield from buf


def run_video(mode: str, video_in: str, video_out: Optional[str],
              cfg: Optional[ModeConfig] = None, chunk: int = 8,
              max_frames: Optional[int] = None,
              frame_skip: int = 1,
              host_prep: bool = True,
              checkpoint_every: Optional[int] = None,
              checkpoint_path: Optional[str] = None,
              resume: Optional[str] = None,
              metrics_json: Optional[str] = None,
              preview: bool = False,
              progress: bool = True) -> RunStats:
    """Process a video through `mode`, optionally writing the overlay video.

    checkpoint_every=N saves the scan state pytree + frame offset to
    checkpoint_path every >=N processed frames; resume=path restores it and
    skips the already-processed frames, so a killed stream run continues
    where it stopped (the reference loses all temporal state on exit,
    SURVEY.md section 5)."""
    import dataclasses

    from ripcurrents_tpu.utils.checkpoint import (load_meta, load_state,
                                                  save_state)
    reader = VideoReader(video_in)
    if cfg is None:
        cfg = ModeConfig()
    if cfg.total_frames <= 0:
        cfg = dataclasses.replace(cfg, total_frames=max(reader.frame_count, 1))
    if mode not in MODES:
        raise KeyError(f"unknown mode {mode!r}; available: {sorted(MODES)}")
    init_fn, scan = _program(mode, cfg)
    writer = None
    stats = RunStats()
    timer = StageTimer()
    frames_iter = iter(reader)
    # Preload first frame raw to initialize state (reference preloads with
    # INTER_AREA, main.cpp:476-480 — handled on device by the mode's init).
    try:
        first = next(frames_iter)
    except StopIteration:
        raise RuntimeError("empty input video")
    state = init_fn(jnp.asarray(first))

    frames_done = 0
    if resume:
        meta = load_meta(resume)
        state = load_state(resume, like=state)
        frames_done = int(meta.get("processed", 0))
        # Reproduce the producer's raw-frame alignment: each processed
        # frame consumed frame_skip raw frames.
        for _ in range(frames_done * frame_skip):
            try:
                next(frames_iter)
            except StopIteration:
                break
        if max_frames is not None:
            max_frames = max(max_frames - frames_done, 0)
        if progress:
            print(f"resumed at frame {frames_done} from {resume}",
                  flush=True)

    gray_in = mode in GRAY_INPUT
    pump = None
    if host_prep and io_native.available() and video_in != "-":
        src_hw = first.shape[:2]
        if src_hw != (cfg.ydim, cfg.xdim):
            pump = io_native.FramePump(src_hw, (cfg.ydim, cfg.xdim),
                                       threads=2, capacity=4 * chunk)

    last_ckpt = 0
    # cv2.imshow on a displayless host aborts the process inside Qt (not a
    # catchable Python exception), so gate on $DISPLAY up front.
    import os
    _preview_ok = bool(os.environ.get("DISPLAY") or
                       os.environ.get("WAYLAND_DISPLAY"))
    if preview and not _preview_ok and progress:
        print("preview disabled: no display", flush=True)

    # With no writer and no preview nobody consumes the rendered frames:
    # skip the full download (the e2e bottleneck on weak host<->device
    # links) and materialize a single pixel per chunk instead — an honest
    # completion barrier on transports where block_until_ready returns
    # before execution finishes.
    need_frames = bool(video_out) or (preview and _preview_ok)

    def flush(pending):
        nonlocal last_ckpt
        outs, chunk_state = pending
        with timer.stage("materialize"):
            if need_frames:
                outs = np.asarray(outs)
            else:
                np.asarray(outs[-1, :1, :1])
        with timer.stage("encode"):
            nonlocal writer
            if video_out:
                if writer is None:
                    writer = VideoWriter(video_out, reader.fps,
                                         outs.shape[1:3])
                writer.write_batch(outs)
        if preview and _preview_ok:
            # the reference's imshow windows (e.g. main.cpp:502); shows the
            # last frame of each chunk to keep up with device rate
            import cv2
            cv2.imshow(mode, outs[-1])
            cv2.waitKey(1)
        stats.frames += len(outs)
        if (checkpoint_every and checkpoint_path and
                stats.frames - last_ckpt >= checkpoint_every):
            save_state(checkpoint_path, chunk_state,
                       {"processed": frames_done + stats.frames,
                        "mode": mode})
            last_ckpt = stats.frames
        if progress:
            print(f"frames processed: {stats.frames}", flush=True)

    t0 = time.perf_counter()
    pending = None
    source = _chunk_source(frames_iter, chunk, frame_skip, max_frames,
                           pump,
                           gray_hw=((cfg.ydim, cfg.xdim) if gray_in
                                    else None))
    for frames in _device_prefetch(source, timer):
        with timer.stage("dispatch"):
            state, outs = scan(state, frames)
        if pending is not None:
            flush(pending)  # overlaps the device's work on this chunk
        pending = (outs, state)
    if pending is not None:
        flush(pending)
    stats.seconds = time.perf_counter() - t0
    if writer:
        writer.close()
    reader.close()
    if progress:
        print(timer.report())
        print(f"{stats.frames} frames in {stats.seconds:.2f}s "
              f"({stats.fps:.1f} fps)"
              + (" [native host prep]" if pump is not None else ""))
    if metrics_json:
        # Per-run structured metrics (SURVEY.md section 5: per-run JSON).
        import json
        with open(metrics_json, "w") as f:
            json.dump({
                "mode": mode, "frames": stats.frames,
                "seconds": round(stats.seconds, 4),
                "fps": round(stats.fps, 3),
                "resolution": [cfg.ydim, cfg.xdim],
                "native_host_prep": pump is not None,
                "gray_upload": gray_in,
                "output_download": need_frames,
                "stages_s": {k: round(v, 4)
                             for k, v in sorted(timer.totals.items())},
                "device": str(jax.devices()[0]),
            }, f)
            f.write("\n")
    return stats
