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
from ripcurrents_tpu.pipelines.common import MODES, ModeConfig
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


def _chunk_source(frames_iter, chunk: int, frame_skip: int,
                  max_frames: Optional[int], pump, prefetch: int = 3):
    """Decode (and optionally host-prep) frames on a producer thread,
    yielding (T<=chunk, H, W, 3) uint8 stacks."""
    q: queue.Queue = queue.Queue(maxsize=prefetch)

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
                    buf.append(f)
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
            resized, _gray = pump.pop_batch(chunk)
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


def run_video(mode: str, video_in: str, video_out: Optional[str],
              cfg: Optional[ModeConfig] = None, chunk: int = 8,
              max_frames: Optional[int] = None,
              frame_skip: int = 1,
              host_prep: bool = True,
              progress: bool = True) -> RunStats:
    """Process a video through `mode`, optionally writing the overlay video."""
    import dataclasses
    reader = VideoReader(video_in)
    if cfg is None:
        cfg = ModeConfig()
    if cfg.total_frames <= 0:
        cfg = dataclasses.replace(cfg, total_frames=max(reader.frame_count, 1))
    if mode not in MODES:
        raise KeyError(f"unknown mode {mode!r}; available: {sorted(MODES)}")
    init_fn, step_fn = MODES[mode](cfg)

    scan = jax.jit(partial(scan_chunk, step_fn))
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

    pump = None
    if host_prep and io_native.available() and video_in != "-":
        src_hw = first.shape[:2]
        if src_hw != (cfg.ydim, cfg.xdim):
            pump = io_native.FramePump(src_hw, (cfg.ydim, cfg.xdim),
                                       threads=2, capacity=4 * chunk)

    def flush(pending):
        with timer.stage("materialize"):
            outs = np.asarray(pending)
        with timer.stage("encode"):
            nonlocal writer
            if video_out:
                if writer is None:
                    writer = VideoWriter(video_out, reader.fps,
                                         outs.shape[1:3])
                writer.write_batch(outs)
        stats.frames += len(outs)
        if progress:
            print(f"frames processed: {stats.frames}", flush=True)

    t0 = time.perf_counter()
    pending = None
    for frames in _chunk_source(frames_iter, chunk, frame_skip, max_frames,
                                pump):
        with timer.stage("dispatch"):
            state, outs = scan(state, jnp.asarray(frames))
        if pending is not None:
            flush(pending)  # overlaps the device's work on this chunk
        pending = outs
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
    return stats
