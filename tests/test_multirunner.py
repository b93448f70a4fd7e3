"""Multi-stream runner (pipelines/multirunner.py): N videos in lock-step
sharded over the mesh's 'stream' axis — the user-facing deployment of
SURVEY.md section 2.6's stream parallelism (VERDICT r4 task #6). Runs on
the 8-virtual-CPU-device mesh from conftest."""

import json

import cv2
import numpy as np
import pytest

from ripcurrents_tpu.pipelines.common import ModeConfig
from ripcurrents_tpu.pipelines.multirunner import (_stream_mesh,
                                                   run_videos)
from ripcurrents_tpu.pipelines.runner import run_video


def _write_clip(path, n, shift, size=(160, 120), seed=0):
    rng = np.random.default_rng(seed)
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30,
                        size)
    base = rng.uniform(0, 255, (size[1], size[0], 3)).astype(np.float32)
    for t in range(n):
        w.write(np.clip(np.roll(base, shift * t, axis=1), 0, 255)
                .astype(np.uint8))
    w.release()


def _decode(path):
    cap = cv2.VideoCapture(str(path))
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return np.stack(frames)


def test_stream_mesh_divides_streams():
    # 8 CPU devices: 2 streams -> stream axis 2; 3 streams -> 3;
    # 5 streams -> 5; 16 streams -> 8 (largest divisor <= devices).
    assert _stream_mesh(2).shape["stream"] == 2
    assert _stream_mesh(3).shape["stream"] == 3
    assert _stream_mesh(16).shape["stream"] == 8
    # space shards reduce the stream budget
    m = _stream_mesh(2, space=2)
    assert m.shape == {"stream": 2, "space": 2}


@pytest.mark.parametrize("mode", ["timelines", "subtructAverageVector"])
def test_two_streams_match_single_stream(tmp_path, mode):
    """Each stream's output must match what the single-stream runner
    produces for the same video: the vmapped+sharded scan is the SAME
    program per stream (tiny float-reassociation slack only)."""
    a, b = tmp_path / "a.mp4", tmp_path / "b.mp4"
    _write_clip(a, 9, shift=1, seed=1)
    _write_clip(b, 9, shift=2, seed=2)
    cfg = ModeConfig(xdim=160, ydim=120)
    mj = tmp_path / "m.json"
    stats = run_videos(mode, [str(a), str(b)], str(tmp_path / "multi"),
                       cfg, chunk=4, metrics_json=str(mj),
                       progress=False)
    assert stats.frames == 16  # 8 scanned frames x 2 streams

    got_a = _decode(tmp_path / "multi_s0.mp4")
    got_b = _decode(tmp_path / "multi_s1.mp4")
    for src, got in ((a, got_a), (b, got_b)):
        run_video(mode, str(src), str(tmp_path / "single.mp4"), cfg,
                  chunk=4, host_prep=False, progress=False)
        want = _decode(tmp_path / "single.mp4")
        assert got.shape == want.shape
        # identical pre-encode arrays -> identical encodes; allow a
        # sliver of pixels for vmap float reassociation
        assert np.mean(got != want) < 0.01, mode

    m = json.loads(mj.read_text())
    assert m["streams"] == 2
    assert m["frames_total"] == 16
    assert m["aggregate_fps"] > 0
    assert m["mesh"]["stream"] == 2
    assert m["gray_upload"] == (mode == "subtructAverageVector")


def test_streams_with_space_sharding(tmp_path):
    """2 streams x 2-row shards on the virtual mesh: the GSPMD row
    sharding must not change results."""
    a, b = tmp_path / "a.mp4", tmp_path / "b.mp4"
    _write_clip(a, 5, shift=1, seed=3)
    _write_clip(b, 5, shift=2, seed=4)
    cfg = ModeConfig(xdim=160, ydim=120)
    run_videos("timelines", [str(a), str(b)], str(tmp_path / "sp"),
               cfg, chunk=4, space=2, progress=False)
    run_videos("timelines", [str(a), str(b)], str(tmp_path / "ns"),
               cfg, chunk=4, space=1, progress=False)
    for i in (0, 1):
        got = _decode(tmp_path / f"sp_s{i}.mp4")
        want = _decode(tmp_path / f"ns_s{i}.mp4")
        assert np.mean(got != want) < 0.01


def test_unequal_lengths_stop_at_shortest(tmp_path):
    a, b = tmp_path / "a.mp4", tmp_path / "b.mp4"
    _write_clip(a, 12, shift=1, seed=5)
    _write_clip(b, 6, shift=2, seed=6)
    cfg = ModeConfig(xdim=160, ydim=120)
    stats = run_videos("timelines", [str(a), str(b)], None, cfg,
                       chunk=4, progress=False)
    # shortest stream has 5 scannable frames; lock-step chunks of 4
    # process 4+1 and stop when the short stream ends
    assert stats.frames <= 2 * 5 + 2 * 4
    assert stats.frames >= 2 * 4


def test_cli_videos_flag(tmp_path, monkeypatch):
    """The --videos CLI surface drives run_videos end-to-end."""
    from ripcurrents_tpu import cli
    a, b = tmp_path / "a.mp4", tmp_path / "b.mp4"
    _write_clip(a, 6, shift=1, seed=7)
    _write_clip(b, 6, shift=2, seed=8)
    monkeypatch.chdir(tmp_path)
    rc = cli.main(["agg", "--videos", str(a), str(b), "--mode",
                   "timelines", "--xdim", "160", "--ydim", "120",
                   "--chunk", "4",
                   "--metrics-json", str(tmp_path / "mm.json")])
    assert rc == 0
    m = json.loads((tmp_path / "mm.json").read_text())
    assert m["streams"] == 2 and m["aggregate_fps"] > 0
    # positional before --videos names the output stem
    assert (tmp_path / "agg_s0.mp4").exists()
    assert (tmp_path / "agg_s1.mp4").exists()
    # guard rail: no input at all is an error
    assert cli.main(["--mode", "timelines"]) == 2
