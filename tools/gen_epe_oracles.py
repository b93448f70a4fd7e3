"""Generate the committed cv2 EPE-oracle flows for bench.py's quality stage.

Round-3 failure mode (VERDICT r3 weak #2): the bench's EPE rows computed
their cv2.calcOpticalFlowFarneback oracles ON THE CLOCK inside the quality
stage — a 1080p host Farneback plus a fresh device compile blew the stage
budget and the EPE rows (the accuracy guardrail licensing the iters_hires
speed trade) have never landed in an official record. The oracle flows are
deterministic functions of committed code (bench.make_clip /
tools/golden_detector_1080p.make_rip_clip with fixed seeds + pinned cv2
params), so they are precomputed here ONCE and committed as a small
compressed asset; the bench stage then only runs the device side.

Flows are stored float16 (max quantization error ~4e-3 px at the <=8 px
magnitudes these clips produce — two orders below the 0.5 px budget and
the ~0.3 px measured means). A content hash of each input pair is stored
so the stage can detect clip drift instead of silently scoring against a
stale oracle.

Usage: python tools/gen_epe_oracles.py    (host-only; writes
       ripcurrents_tpu/assets/epe_oracles_v1.npz)
"""

import hashlib
import importlib.util
import pathlib
import sys

import numpy as np

sys.path.insert(0, ".")


def pair_hash(clip):
    return hashlib.sha256(np.ascontiguousarray(clip).tobytes()).hexdigest()


def main():
    import cv2

    from bench import make_clip
    from ripcurrents_tpu.config import FarnebackParams

    here = pathlib.Path(__file__).resolve().parent
    spec = importlib.util.spec_from_file_location(
        "golden_detector_1080p", here / "golden_detector_1080p.py")
    gd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gd)

    p = FarnebackParams.windowed()

    def cv2_flow(clip):
        return cv2.calcOpticalFlowFarneback(
            clip[0], clip[1], None, p.pyr_scale, p.levels, p.winsize,
            p.iterations, p.poly_n, p.poly_sigma,
            cv2.OPTFLOW_FARNEBACK_GAUSSIAN)

    out = {}
    # The exact pairs bench.py's quality stage scores (fresh rng per
    # shape, as the stage always constructed them).
    clip_640 = make_clip(480, 640, 2, np.random.default_rng(0))
    clip_1080 = make_clip(1080, 1920, 2, np.random.default_rng(0))
    clip_rip = gd.make_rip_clip(2)[..., 0]
    for name, clip in (("bench640", clip_640), ("bench1080", clip_1080),
                       ("rip1080", clip_rip)):
        want = cv2_flow(clip)
        out[name + "_flow"] = want.astype(np.float16)
        out[name + "_hash"] = np.frombuffer(
            bytes.fromhex(pair_hash(clip)), np.uint8)
        print(f"{name}: flow range [{want.min():.2f}, {want.max():.2f}] "
              f"|flow| mean {np.hypot(want[..., 0], want[..., 1]).mean():.3f}")

    dest = here.parent / "ripcurrents_tpu" / "assets" / "epe_oracles_v1.npz"
    np.savez_compressed(dest, **out)
    print(f"wrote {dest} ({dest.stat().st_size / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
