"""Tests for the host I/O rim and the native frame pump."""

import os

import cv2
import numpy as np
import pytest

from ripcurrents_tpu.io import native
from ripcurrents_tpu.io.video import VideoReader, VideoWriter, batched_frames


@pytest.fixture()
def tiny_video(tmp_path, rng):
    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    frames = rng.integers(0, 255, (10, 48, 64, 3)).astype(np.uint8)
    for f in frames:
        w.write(f)
    w.release()
    return path, frames


def test_reader_roundtrip(tiny_video):
    path, frames = tiny_video
    r = VideoReader(path)
    got = list(r)
    assert len(got) == 10
    assert got[0].shape == (48, 64, 3)


def test_batched_frames(tiny_video):
    path, _ = tiny_video
    chunks = list(batched_frames(VideoReader(path), batch=4))
    assert [c.shape[0] for c in chunks] == [4, 4, 2]


def test_writer_roundtrip(tmp_path, rng):
    path = str(tmp_path / "out.mp4")
    frames = rng.integers(0, 255, (6, 48, 64, 3)).astype(np.uint8)
    w = VideoWriter(path, 30, (48, 64))
    w.write_batch(frames)
    w.close()
    r = VideoReader(path)
    assert len(list(r)) == 6


@pytest.mark.skipif(not native.available(),
                    reason="libframepump.so not built (make -C native)")
def test_frame_pump_matches_cv2(rng):
    frames = rng.integers(0, 255, (6, 120, 160, 3)).astype(np.uint8)
    pump = native.FramePump((120, 160), (48, 64), threads=2)
    for f in frames:
        pump.push(f)
    resized, gray = pump.pop_batch(6)
    pump.close()
    for i, f in enumerate(frames):
        want = cv2.resize(f, (64, 48), interpolation=cv2.INTER_LINEAR)
        assert np.abs(resized[i].astype(int) - want.astype(int)).max() <= 1
        want_g = cv2.cvtColor(resized[i], cv2.COLOR_BGR2GRAY)
        assert np.abs(gray[i].astype(int) - want_g.astype(int)).max() <= 1
