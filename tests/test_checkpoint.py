"""Checkpoint/resume and determinism tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ripcurrents_tpu.pipelines.common import MODES, ModeConfig
from ripcurrents_tpu.pipelines import modes as _m  # noqa: F401
from ripcurrents_tpu.utils.checkpoint import load_state, save_state, load_meta

CFG = ModeConfig(xdim=96, ydim=64, total_frames=8, window_size=3,
                 timeline_vertices=8)


def test_checkpoint_roundtrip_resumes_identically(tmp_path, beach_frames):
    init, step = MODES["subtructAverageVectorWithWindow"](CFG)
    state = init(jnp.asarray(beach_frames[0]))
    state, _ = jax.lax.scan(step, state, jnp.asarray(beach_frames[1:4]))

    path = str(tmp_path / "ckpt.npz")
    save_state(path, state, meta={"frame": 3})

    fresh = init(jnp.asarray(beach_frames[0]))
    restored = load_state(path, fresh)
    assert load_meta(path) == {"frame": 3}

    s1, out1 = jax.lax.scan(step, state, jnp.asarray(beach_frames[4:]))
    s2, out2 = jax.lax.scan(step, restored, jnp.asarray(beach_frames[4:]))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_checkpoint_structure_mismatch_rejected(tmp_path, beach_frames):
    init1, _ = MODES["subtructAverageVectorWithWindow"](CFG)
    init2, _ = MODES["timex"](CFG)
    s1 = init1(jnp.asarray(beach_frames[0]))
    s2 = init2(jnp.asarray(beach_frames[0]))
    path = str(tmp_path / "ckpt.npz")
    save_state(path, s1)
    try:
        load_state(path, s2)
        assert False, "expected structure mismatch"
    except ValueError:
        pass


def test_cli_kill_and_resume_bit_identical(tmp_path, beach_frames):
    """run_video --checkpoint-every/--resume: a run killed mid-stream and
    resumed from its checkpoint writes exactly the frames the
    uninterrupted run would have (MJPG/.avi: intra-only codec, so per-frame
    bytes are comparable)."""
    import cv2

    from ripcurrents_tpu.pipelines.runner import run_video

    src = str(tmp_path / "clip.avi")
    wr = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 30, (160, 120))
    for f in beach_frames:
        wr.write(cv2.resize(f, (160, 120)))
    wr.release()

    cfg = ModeConfig(xdim=96, ydim=64, total_frames=8, window_size=3,
                     timeline_vertices=8)
    full = str(tmp_path / "full.avi")
    run_video("subtructAverageVectorWithWindow", src, full, cfg, chunk=2,
              progress=False, host_prep=False)

    ckpt = str(tmp_path / "state.ckpt")
    part1 = str(tmp_path / "part1.avi")
    run_video("subtructAverageVectorWithWindow", src, part1, cfg, chunk=2,
              max_frames=4, checkpoint_every=2, checkpoint_path=ckpt,
              progress=False, host_prep=False)
    part2 = str(tmp_path / "part2.avi")
    run_video("subtructAverageVectorWithWindow", src, part2, cfg, chunk=2,
              resume=ckpt + ".npz", progress=False, host_prep=False)

    def decode(p):
        cap = cv2.VideoCapture(p)
        out = []
        while True:
            ok, f = cap.read()
            if not ok:
                return np.stack(out)
            out.append(f)

    want = decode(full)
    got = np.concatenate([decode(part1), decode(part2)])
    np.testing.assert_array_equal(want, got)


def test_pipeline_deterministic(beach_frames):
    init, step = MODES["timelines"](CFG)
    outs = []
    for _ in range(2):
        state = init(jnp.asarray(beach_frames[0]))
        _, out = jax.lax.scan(step, state, jnp.asarray(beach_frames[1:]))
        outs.append(np.asarray(out))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_no_nans_with_debug_nans(beach_frames):
    """The reference's latent data races (static maxima under forEach) are
    structurally gone; this guards the numerics under jax_debug_nans
    (SURVEY.md section 5 race-detection rebuild)."""
    init, step = MODES["subtructAverageVector"](CFG)
    with jax.debug_nans(True):
        state = init(jnp.asarray(beach_frames[0]))
        _, out = jax.lax.scan(step, state, jnp.asarray(beach_frames[1:4]))
        np.asarray(out)
