"""Stream runner: drives a mode's scan step over a video.

Host decode (threaded, io/video.py) feeds fixed-size frame chunks to one
jitted `lax.scan` program per chunk; outputs stream back to a writer
thread. This replaces the reference's per-frame host loops
(main.cpp:484-517 etc.) with a double-buffered host/device pipeline — the
device never waits on the codec and vice versa.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ripcurrents_tpu.io.video import VideoReader, VideoWriter, batched_frames
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


def run_video(mode: str, video_in: str, video_out: Optional[str],
              cfg: Optional[ModeConfig] = None, chunk: int = 8,
              max_frames: Optional[int] = None,
              frame_skip: int = 1,
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
    state = None
    frames_iter = iter(reader)
    # Preload first frame to initialize state (reference preloads with
    # INTER_AREA, main.cpp:476-480).
    try:
        first = next(frames_iter)
    except StopIteration:
        raise RuntimeError("empty input video")
    state = init_fn(jnp.asarray(first))

    def frame_source():
        n = 0
        buf = []
        skip = 0
        for f in frames_iter:
            skip += 1
            if skip % frame_skip:  # android-style decode subsampling
                continue
            buf.append(f)
            n += 1
            if len(buf) == chunk:
                yield np.stack(buf)
                buf = []
            if max_frames and n >= max_frames:
                break
        if buf:
            yield np.stack(buf)

    t0 = time.perf_counter()
    for frames in frame_source():
        with timer.stage("device"):
            state, outs = scan(state, jnp.asarray(frames))
            outs = np.asarray(outs)
        with timer.stage("encode"):
            if video_out:
                if writer is None:
                    writer = VideoWriter(video_out, reader.fps,
                                         outs.shape[1:3])
                writer.write_batch(outs)
        stats.frames += len(frames)
        if progress:
            print(f"frames processed: {stats.frames}", flush=True)
    stats.seconds = time.perf_counter() - t0
    if writer:
        writer.close()
    reader.close()
    if progress:
        print(timer.report())
        print(f"{stats.frames} frames in {stats.seconds:.2f}s "
              f"({stats.fps:.1f} fps)")
    return stats
