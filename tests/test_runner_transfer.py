"""Transfer-frugality regression tests for the stream runner.

Gray-input modes (pipelines/common.GRAY_INPUT) must produce output
identical to the full-BGR upload path — the host does exactly the
reference's resize + cvtColor (main.cpp:493-494), so only the transfer
volume changes. And with no writer/preview the runner must not download
the rendered frames at all.
"""

import json

import cv2
import numpy as np
import pytest

from ripcurrents_tpu.pipelines import runner as runner_mod
from ripcurrents_tpu.pipelines.common import GRAY_INPUT, ModeConfig
from ripcurrents_tpu.pipelines.runner import run_video

H, W, T = 48, 64, 8


@pytest.fixture()
def clip_path(tmp_path, rng):
    """Source already at target size so host and device paths see the
    identical decoded frames (no resize on either side)."""
    path = str(tmp_path / "src.mp4")
    yy = np.mgrid[0:H, 0:W][0].astype(np.float32)
    base = rng.uniform(0, 255, (H, W)).astype(np.float32)
    wtr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (W, H))
    for t in range(T):
        wave = 60 * np.sin(2 * np.pi * (yy / 12.0 - t * 0.2))
        g = np.clip(base * 0.5 + wave + 60, 0, 255).astype(np.uint8)
        wtr.write(np.stack([g, g, g], -1))
    wtr.release()
    return path


def _decode(path):
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return np.stack(frames)


def test_gray_upload_matches_bgr_path(clip_path, tmp_path, monkeypatch):
    mode = "subtructAverageVector"
    assert mode in GRAY_INPUT
    cfg = ModeConfig(xdim=W, ydim=H)

    out_gray = str(tmp_path / "gray.mp4")
    run_video(mode, clip_path, out_gray, cfg=cfg, chunk=3, progress=False)

    # Force the full-BGR upload path (device-side resize + bgr_to_gray).
    monkeypatch.setattr(runner_mod, "GRAY_INPUT", frozenset())
    out_bgr = str(tmp_path / "bgr.mp4")
    run_video(mode, clip_path, out_bgr, cfg=cfg, chunk=3, progress=False)

    a, b = _decode(out_gray), _decode(out_bgr)
    assert a.shape == b.shape
    # identical raw frames -> identical encode; decoded comparison is exact
    assert np.array_equal(a, b)


def test_no_output_skips_download(clip_path, tmp_path):
    metrics = str(tmp_path / "m.json")
    stats = run_video("timelines", clip_path, None,
                      cfg=ModeConfig(xdim=W, ydim=H), chunk=3,
                      metrics_json=metrics, progress=False)
    assert stats.frames == T - 1  # first frame is the preload
    m = json.loads(open(metrics).read())
    assert m["output_download"] is False
    assert m["frames"] == T - 1
