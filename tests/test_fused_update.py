"""Interpret-mode tests of the fused Farneback Pallas kernels.

The fused kernels (flow/fused_update.py) only run natively on TPU; here
they execute under pltpu.force_tpu_interpret_mode() on CPU and are checked
against the portable XLA formulations for cases where the tiled
base+residual warp is EXACT (uniform integer / small-fractional flow), plus
the final blur+solve against the reference separable blur.

Reference semantics: OpenCV FarnebackUpdateMatrices
(cv2 modules/video/src/optflowgf.cpp, as transcribed in
flow/farneback.update_matrices — reference call sites
RipCurrents_main/main.cpp:264,609,961,1119,1481).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import importlib

fu = importlib.import_module("ripcurrents_tpu.flow.fused_update")
# the flow package re-exports the farneback *function*; get the module
fb = importlib.import_module("ripcurrents_tpu.flow.farneback")


H, W = 40, 300          # true size; padded to (48?, 384) by th=... / 128
TH = 24                 # small row tile for the test


def _expansions(rng):
    img0 = rng.uniform(0, 255, (H, W)).astype(np.float32)
    img1 = np.roll(img0, 1, axis=1) * 0.9 + 5.0
    e = []
    for img in (img0, img1):
        e.append(fb.poly_exp(jnp.asarray(img), 7, 1.1,
                             channels_first=True, impl="shifted"))
    return e[0], e[1]


def _reference_update(r0cf, r1cf, flow):
    """update_matrices with the exact gather warp (channels-last API)."""
    m = fb.update_matrices(jnp.moveaxis(r0cf, 0, -1),
                           jnp.moveaxis(r1cf, 0, -1), flow,
                           warp_budget=None, warp_impl="gather")
    return jnp.moveaxis(m, -1, 0)


def _prep(r0cf, r1cf):
    return fu.prepare_expansions(r0cf, r1cf, TH)


@pytest.mark.parametrize("dxdy", [(0.0, 0.0), (3.0, -2.0), (1.25, -0.75)])
def test_fused_update_matches_gather_for_uniform_flow(dxdy):
    """Uniform flow within the residual budget => the tiled base+residual
    warp is exact, so the fused kernel must reproduce the gather-warp
    update away from the frame border (where gather's out-of-frame rule
    and the subcolumn base interact)."""
    rng = np.random.default_rng(7)
    r0, r1 = _expansions(rng)
    flow_cf = jnp.full((2, H, W), 0.0).at[0].set(dxdy[0]).at[1].set(dxdy[1])
    flow_cl = jnp.moveaxis(flow_cf, 0, -1)

    with pltpu.force_tpu_interpret_mode():
        got = fu.fused_update_prepped(_prep(r0, r1), flow_cf, bres=2)
    # the kernels store expansions in bf16; quantize the reference inputs
    # identically so the comparison isolates kernel logic
    q = lambda a: a.astype(jnp.bfloat16).astype(jnp.float32)  # noqa: E731
    want = _reference_update(q(r0), q(r1), flow_cl)

    b = 8  # ignore border ramp-affected + out-of-frame rows/cols
    got_i = np.asarray(got)[:, b:H - b, b:W - b]
    want_i = np.asarray(want)[:, b:H - b, b:W - b]
    np.testing.assert_allclose(got_i, want_i, rtol=2e-2, atol=2e-2)


def test_fused_final_solve_matches_reference_blur():
    """fused_final_solve == separable replicate-border blur + 2x2 solve."""
    rng = np.random.default_rng(3)
    r0, r1 = _expansions(rng)
    flow_cf = jnp.zeros((2, H, W))
    with pltpu.force_tpu_interpret_mode():
        prep = _prep(r0, r1)
        m = fu.fused_update_prepped(prep, flow_cf, bres=2)
        got = fu.fused_final_solve(prep, m, winsize=10, gaussian=True)
    mm = jnp.moveaxis(m[:, :H, :W], 0, -1)
    want = fb._solve_flow(fb._blur_m(mm, 10, True))
    # fused_final_solve returns channels-first (2, H, W). The in-kernel
    # blur matmuls run bf16 (f32 accumulate): band-weight quantization puts
    # ~1e-2 px of rounding between the two paths (vs the 0.5 px EPE bar).
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(got, 0, -1)),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


def test_fused_iter_composes_blur_solve_warp_update():
    """One fused iteration == final-solve of M, then a fused update from
    that flow (the kernels share the warp/update code, so this checks the
    in-kernel blur+solve wiring)."""
    rng = np.random.default_rng(11)
    r0, r1 = _expansions(rng)
    flow0 = jnp.zeros((2, H, W))
    with pltpu.force_tpu_interpret_mode():
        prep = _prep(r0, r1)
        m0 = fu.fused_update_prepped(prep, flow0, bres=2)
        got = fu.fused_iter_prepped(prep, m0, winsize=10, gaussian=True,
                                    bres=2)
        flow1 = fu.fused_final_solve(prep, m0, winsize=10, gaussian=True)
        want = fu.fused_update_prepped(prep, flow1, bres=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)




@pytest.mark.parametrize("iterations", [1, 3])
def test_fused_level_matches_kernel_chain(iterations):
    """The whole-level mega-kernel (update + iterations + final solve in
    one pallas_call, M ping-ponging in VMEM) must reproduce the 3-kernel
    chain exactly (same algebra, same bf16 M storage)."""
    rng = np.random.default_rng(7)
    r0, r1 = _expansions(rng)
    flow0 = jnp.asarray(
        rng.uniform(-1.5, 1.5, (2, H, W)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        prep = _prep(r0, r1)
        m = fu.fused_update_prepped(prep, flow0, bres=2)
        for _ in range(iterations - 1):
            m = fu.fused_iter_prepped(prep, m, winsize=10, gaussian=True,
                                      bres=2)
        want = fu.fused_final_solve(prep, m, winsize=10, gaussian=True)
        got = fu.fused_level_prepped(prep, flow0, winsize=10,
                                     gaussian=True, bres=2,
                                     iterations=iterations)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_streamed_table_matches_resident():
    """stream_table=True (per-tile halo window DMA from HBM — the 4K /
    small-VMEM layout) must reproduce the resident-table kernels exactly:
    the window holds the same bf16 rows _warp_subcols reads in place."""
    rng = np.random.default_rng(5)
    r0, r1 = _expansions(rng)
    flow0 = jnp.asarray(
        rng.uniform(-1.5, 1.5, (2, H, W)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        prep = _prep(r0, r1)
        m_res = fu.fused_update_prepped(prep, flow0, bres=2)
        m_str = fu.fused_update_prepped(prep, flow0, bres=2,
                                        stream_table=True)
        it_res = fu.fused_iter_prepped(prep, m_res, winsize=10,
                                       gaussian=True, bres=2)
        it_str = fu.fused_iter_prepped(prep, m_res, winsize=10,
                                       gaussian=True, bres=2,
                                       stream_table=True)
    np.testing.assert_array_equal(np.asarray(m_res), np.asarray(m_str))
    np.testing.assert_array_equal(np.asarray(it_res), np.asarray(it_str))


def test_vmem_gating_thresholds():
    """chain_vmem_bytes: the 4K resident table must exceed the v5e-class
    budget while the streamed layout stays within it; 1080p stays resident
    (so the gating flips the layout exactly where intended)."""
    th = fu._row_tile(2160)
    hp, wp = -(-2160 // th) * th, -(-3840 // 128) * 128
    v5e = 128 * 1024 * 1024 - fu._VMEM_HEADROOM
    assert fu.chain_vmem_bytes(hp, wp, th, stream_table=False) > v5e
    assert fu.chain_vmem_bytes(hp, wp, th, stream_table=True) <= v5e
    th = fu._row_tile(1080)
    hp, wp = -(-1080 // th) * th, 1920
    assert fu.chain_vmem_bytes(hp, wp, th, stream_table=False) <= v5e


def test_fused_level_padded_io_matches_cropped():
    """padded_io=True (flow carried in the padded (2, Hp, Wp) kernel
    layout across pyramid levels) must equal the true-shape entry point
    on the true region — the padding is pure layout."""
    rng = np.random.default_rng(13)
    r0, r1 = _expansions(rng)
    flow0 = jnp.asarray(
        rng.uniform(-1.5, 1.5, (2, H, W)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        prep = _prep(r0, r1)
        hp, wp = prep["hpwp"]
        flow0p = jnp.pad(flow0, ((0, 0), (0, hp - H), (0, wp - W)))
        want = fu.fused_level_prepped(prep, flow0, winsize=10,
                                      gaussian=True, bres=2, iterations=2)
        got = fu.fused_level_prepped(prep, flow0p, winsize=10,
                                     gaussian=True, bres=2, iterations=2,
                                     padded_io=True)
    np.testing.assert_array_equal(np.asarray(got[:, :H, :W]),
                                  np.asarray(want))


def test_resize_bilinear_cf_padded_matches_pad_crop_scale():
    """The padded pyramid upsample == crop -> resize_bilinear_cf ->
    scale -> zero-pad, with source pad garbage ignored."""
    from ripcurrents_tpu.ops.image import (resize_bilinear_cf,
                                           resize_bilinear_cf_padded)
    rng = np.random.default_rng(5)
    sh_t, sw_t = 37, 150
    dh, dw = 75, 300
    src = jnp.asarray(rng.normal(0, 2, (2, 48, 256)).astype(np.float32))
    want = resize_bilinear_cf(src[:, :sh_t, :sw_t], (dh, dw)) * 2.0
    got = resize_bilinear_cf_padded(src, (sh_t, sw_t), (dh, dw),
                                    (80, 384), scale=2.0)
    assert got.shape == (2, 80, 384)
    np.testing.assert_allclose(np.asarray(got[:, :dh, :dw]),
                               np.asarray(want), rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(got[:, dh:, :]) == 0.0)
    assert np.all(np.asarray(got[:, :, dw:]) == 0.0)


def test_resize_bilinear_cf_padded_2x_fast_path():
    """The exact-2x interleave fast path == the banded-matmul form (same
    two-tap convex combinations; border clamps may differ by 1 ulp)."""
    from ripcurrents_tpu.ops import image as im
    rng = np.random.default_rng(6)
    sh_t, sw_t = 37, 150
    dh, dw = 2 * sh_t, 2 * sw_t
    src = jnp.asarray(rng.normal(0, 2, (2, 48, 256)).astype(np.float32))
    want = im.resize_bilinear_cf(src[:, :sh_t, :sw_t], (dh, dw)) * 2.0
    got = im.resize_bilinear_cf_padded(src, (sh_t, sw_t), (dh, dw),
                                       (80, 384), scale=2.0)
    assert got.shape == (2, 80, 384)
    np.testing.assert_allclose(np.asarray(got[:, :dh, :dw]),
                               np.asarray(want), rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(got[:, dh:, :]) == 0.0)
    assert np.all(np.asarray(got[:, :, dw:]) == 0.0)


def test_fused_level_pipe_matches_unpipelined():
    """The software-pipelined mega-kernel (_level_kernel_pipe: blur+solve
    of tile i interleaved with the warp+update of the lagged tile) must be
    bit-identical to the plain kernel — same arithmetic, different
    schedule. th=16 -> ty_n=3, the pipe minimum."""
    rng = np.random.default_rng(23)
    r0, r1 = _expansions(rng)
    flow0 = jnp.asarray(
        rng.uniform(-1.5, 1.5, (2, H, W)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        prep = fu.prepare_expansions(r0, r1, 16)
        for iters in (1, 3):
            want = fu.fused_level_prepped(prep, flow0, winsize=10,
                                          gaussian=True, bres=2,
                                          iterations=iters,
                                          resident_table=True)
            for pipe in (1, 2):   # 2 = split M refs (_level_kernel_pipe2)
                got = fu.fused_level_prepped(prep, flow0, winsize=10,
                                             gaussian=True, bres=2,
                                             iterations=iters,
                                             resident_table=True,
                                             pipe=pipe)
                np.testing.assert_array_equal(np.asarray(got),
                                              np.asarray(want))


def test_fused_level_resident_table_matches_streamed():
    """resident_table=True (whole bf16 warp table VMEM-resident, no p1
    window double buffer) must be bit-identical to the streamed layout —
    the window DMA delivers exactly the rows _warp_subcols reads in
    place."""
    rng = np.random.default_rng(17)
    r0, r1 = _expansions(rng)
    flow0 = jnp.asarray(
        rng.uniform(-1.5, 1.5, (2, H, W)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        prep = _prep(r0, r1)
        want = fu.fused_level_prepped(prep, flow0, winsize=10,
                                      gaussian=True, bres=2, iterations=2)
        got = fu.fused_level_prepped(prep, flow0, winsize=10,
                                     gaussian=True, bres=2, iterations=2,
                                     resident_table=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("dxdy", [(3.0, -2.0), (1.25, -0.75)])
def test_fused_update_subcol128_matches_gather_for_uniform_flow(dxdy):
    """warp_subcol=128 (narrow subcolumn bases): uniform flow within the
    residual budget stays exact for ANY subcolumn partition, so the
    narrow layout must reproduce the gather-warp update too (the A/B
    knob for the detector presets, FarnebackParams.warp_subcol)."""
    rng = np.random.default_rng(7)
    r0, r1 = _expansions(rng)
    flow_cf = jnp.full((2, H, W), 0.0).at[0].set(dxdy[0]).at[1].set(dxdy[1])
    flow_cl = jnp.moveaxis(flow_cf, 0, -1)

    with pltpu.force_tpu_interpret_mode():
        prep = fu.prepare_expansions(r0, r1, TH, subcol=128)
        assert prep["sw"] == 128
        got = fu.fused_update_prepped(prep, flow_cf, bres=2)
    q = lambda a: a.astype(jnp.bfloat16).astype(jnp.float32)  # noqa: E731
    want = _reference_update(q(r0), q(r1), flow_cl)
    b = 8
    np.testing.assert_allclose(np.asarray(got)[:, b:H - b, b:W - b],
                               np.asarray(want)[:, b:H - b, b:W - b],
                               rtol=2e-2, atol=2e-2)


def test_fused_level_subcol128_runs_and_tracks_default():
    """The mega-kernel accepts the narrow-subcolumn prep; on smooth
    (non-uniform) flow its result stays within the tiled-warp deviation
    envelope of the default layout."""
    rng = np.random.default_rng(7)
    r0, r1 = _expansions(rng)
    flow0 = jnp.asarray(
        rng.uniform(-1.0, 1.0, (2, H, W)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = fu.fused_level_prepped(
            fu.prepare_expansions(r0, r1, TH, subcol=128), flow0,
            winsize=10, gaussian=True, bres=2, iterations=2)
        ref = fu.fused_level_prepped(
            fu.prepare_expansions(r0, r1, TH), flow0,
            winsize=10, gaussian=True, bres=2, iterations=2)
    d = np.abs(np.asarray(got) - np.asarray(ref))[:, 4:H - 4, 4:W - 4]
    assert np.median(d) < 0.05
    assert np.mean(d) < 0.25


def test_fused_level_vmapped_matches_per_stream():
    """vmap over a batch of independent streams (the multi-camera
    aggregate-throughput path, tools/bench_ab.py) must equal per-stream
    calls — guards the batched-grid lowering of the mega-kernel."""
    flows, preps = [], []
    for s in range(2):
        rng = np.random.default_rng(30 + s)
        r0, r1 = _expansions(rng)
        preps.append(_prep(r0, r1))
        flows.append(jnp.asarray(
            rng.uniform(-1.5, 1.5, (2, H, W)).astype(np.float32)))
    # stack only the array leaves; hw/hpwp/th/sw are static metadata (in
    # the production vmap path they come from shapes, never from tracers)
    akeys = [k for k, v in preps[0].items() if hasattr(v, "ndim")]
    batched = {k: jnp.stack([p[k] for p in preps]) for k in akeys}
    bflow = jnp.stack(flows)

    def level(parrs, flow):
        prep = dict(preps[0])
        prep.update(parrs)
        return fu.fused_level_prepped(prep, flow, winsize=10,
                                      gaussian=True, bres=2, iterations=2)

    with pltpu.force_tpu_interpret_mode():
        got = jax.vmap(level)(batched, bflow)
        want = jnp.stack([
            level({k: p[k] for k in akeys}, f)
            for p, f in zip(preps, flows)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("shift", ["mx", "mxy"])
def test_shift_impls_bit_identical(shift):
    """The MXU one-hot base-shift implementations (_shift_block 'mx' /
    'mxy') must be BIT-identical to the roll path: one-hot selection of
    bf16 table values with f32 accumulation is exact, and the tap loop
    is shared (_tap_sum). Non-uniform flow drives nonzero per-subcolumn
    bases in both axes."""
    rng = np.random.default_rng(5)
    r0, r1 = _expansions(rng)
    # smooth, large-ish flow => varied integer bases per subcolumn
    flow0 = jnp.asarray(np.stack([
        6.0 * np.sin(np.linspace(0, 3, H))[:, None]
        * np.ones((1, W), np.float32),
        5.0 * np.cos(np.linspace(0, 2, W))[None, :]
        * np.ones((H, 1), np.float32)]).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        prep = _prep(r0, r1)
        base = fu.fused_level_prepped(prep, flow0, winsize=10,
                                      gaussian=True, bres=2,
                                      iterations=2, shift="roll")
        got = fu.fused_level_prepped(prep, flow0, winsize=10,
                                     gaussian=True, bres=2,
                                     iterations=2, shift=shift)
        m_roll = fu.fused_update_prepped(prep, flow0, bres=2,
                                         shift="roll")
        m_got = fu.fused_update_prepped(prep, flow0, bres=2, shift=shift)
        ms_roll = fu.fused_update_prepped(prep, flow0, bres=2,
                                          stream_table=True, shift="roll")
        ms_got = fu.fused_update_prepped(prep, flow0, bres=2,
                                         stream_table=True, shift=shift)
    assert float(np.abs(np.asarray(got) - np.asarray(base)).max()) == 0.0
    assert float(np.abs(np.asarray(m_got.astype(jnp.float32))
                        - np.asarray(m_roll.astype(jnp.float32))).max()) \
        == 0.0
    assert float(np.abs(np.asarray(ms_got.astype(jnp.float32))
                        - np.asarray(ms_roll.astype(jnp.float32))).max()) \
        == 0.0


@pytest.mark.parametrize("pipe", [0, 2])
def test_fused_level_ups_matches_separate_upsample(pipe):
    """ups_src (the in-kernel level-to-level upsample) must reproduce
    resize_bilinear_cf_padded + fused_level_prepped exactly: bilinear is
    2-tap per output per axis, so both forms compute the same single
    fused-multiply pair per pass — no reassociation to tolerate."""
    from ripcurrents_tpu.ops.image import resize_bilinear_cf_padded

    fh, fw, ch, cw, th = 96, 256, 48, 128, 24
    rng = np.random.default_rng(5)
    img0 = rng.uniform(0, 255, (fh, fw)).astype(np.float32)
    img1 = np.roll(img0, 1, axis=1) * 0.9 + 5.0
    r0 = fb.poly_exp(jnp.asarray(img0), 7, 1.1, channels_first=True,
                     impl="shifted")
    r1 = fb.poly_exp(jnp.asarray(img1), 7, 1.1, channels_first=True,
                     impl="shifted")
    coarse = jnp.asarray(
        rng.uniform(-2.0, 2.0, (2, ch, cw)).astype(np.float32))
    ref_flow = resize_bilinear_cf_padded(coarse, (ch, cw), (fh, fw),
                                         (fh, fw), 2.0)
    with pltpu.force_tpu_interpret_mode():
        prep = fu.prepare_expansions(r0, r1, th)
        want = fu.fused_level_prepped(prep, ref_flow, 10, True, 2, 2,
                                      padded_io=True, resident_table=True,
                                      pipe=pipe)
        got = fu.fused_level_prepped(prep, coarse, 10, True, 2, 2,
                                     padded_io=True, resident_table=True,
                                     pipe=pipe,
                                     ups_src=((ch, cw), (ch, cw), 2.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ups_mats_reproduce_padded_resize():
    """The _ups_mats matrices, applied exactly as the kernel applies them
    (per-tile y matmul over the clamped coarse row window, then
    per-128-block x matmuls), equal resize_bilinear_cf_padded."""
    from ripcurrents_tpu.ops.image import resize_bilinear_cf_padded

    fh, fw, hp, wp, th = 90, 250, 96, 256, 24
    ch, cw, sph, spw = 45, 125, 48, 128
    rng = np.random.default_rng(9)
    coarse = np.zeros((2, sph, spw), np.float32)
    coarse[:, :ch, :cw] = rng.uniform(-3, 3, (2, ch, cw))
    mats = fu._ups_mats((fh, fw), (hp, wp), th, (ch, cw), (sph, spw), 2.0)
    assert mats is not None
    uy, ux, oxs, whu = mats
    want = np.asarray(resize_bilinear_cf_padded(
        jnp.asarray(coarse), (ch, cw), (fh, fw), (hp, wp), 2.0))
    got = np.zeros((2, hp, wp), np.float32)
    for i in range(hp // th):
        oy = min(max(i * (th // 2) - 8, 0) // 8 * 8, sph - whu)
        cwin = coarse[:, oy:oy + whu, :]
        for c in range(2):
            t = uy[i] @ cwin[c]
            row = np.concatenate(
                [t[:, ox:ox + ux.shape[1]] @ ux[b]
                 for b, ox in enumerate(oxs)], axis=1)
            got[c, i * th:(i + 1) * th] = row
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("pipe", [0, 2])
def test_fused_level_prep_next_emits_expansion(pipe):
    """prep_spec (the lagged-stream prep fusion): the host kernel must
    emit the next frame's expansion table for the target level
    (here: the full-res level of a 192x512 frame, hosted by a 96x256
    level kernel) matching the XLA prep, while leaving its own flow
    output untouched."""
    from ripcurrents_tpu.config import FarnebackParams

    fh, fw, th = 96, 256, 24
    nh, nw = 192, 512
    rng = np.random.default_rng(13)
    img0 = rng.uniform(0, 255, (fh, fw)).astype(np.float32)
    img1 = np.roll(img0, 1, axis=1) * 0.9 + 5.0
    r0 = fb.poly_exp(jnp.asarray(img0), 7, 1.1, channels_first=True,
                     impl="shifted")
    r1 = fb.poly_exp(jnp.asarray(img1), 7, 1.1, channels_first=True,
                     impl="shifted")
    img_next = rng.uniform(0, 255, (nh, nw)).astype(np.float32)
    p = FarnebackParams.windowed()
    pargs = fb._prep_level_args(nh, nw, p, 0)
    # Comparison target: the BLOCKED bf16 prep (what the kernel mirrors
    # and what the TPU runs). On CPU poly_exp_level gates to the dense
    # f32 path for compile speed; force the blocked branch here.
    import functools as _ft
    orig_ok = fb._pallas_ok
    fb._pallas_ok = _ft.lru_cache(maxsize=1)(lambda: True)
    try:
        want = np.asarray(fb._precompute_level(
            jnp.asarray(img_next), nh, nw, p, 0, cf=True)
            .astype(jnp.float32))
    finally:
        fb._pallas_ok = orig_ok
    flow0 = jnp.zeros((2, fh, fw), jnp.float32)
    n_prep = fh // th
    assert fu._prep_tile_mats(pargs, n_prep) is not None
    with pltpu.force_tpu_interpret_mode():
        prep = fu.prepare_expansions(r0, r1, th)
        base = fu.fused_level_prepped(prep, flow0, 10, True, 2, 2,
                                      padded_io=True, resident_table=True,
                                      pipe=pipe)
        got_flow, table = fu.fused_level_prepped(
            prep, flow0, 10, True, 2, 2, padded_io=True,
            resident_table=True, pipe=pipe,
            prep_img=jnp.asarray(img_next), prep_spec=(pargs, n_prep))
    # the prep phase must not perturb the kernel's own flow
    np.testing.assert_array_equal(np.asarray(got_flow), np.asarray(base))
    got = np.asarray(table.astype(jnp.float32))
    assert got.shape == want.shape
    # The kernel multiplies the SAME dense-matrix slices as the blocked
    # path; bf16 contractions over differently-padded windows leave a
    # handful of one-ULP rounding spots (amplified where the
    # antisymmetric xg taps cancel), so assert functional equality:
    # tiny mean error + a vanishing large-deviation fraction.
    d = np.abs(got - want)
    assert d.mean() < 1e-4, d.mean()
    assert (d > 0.01).mean() < 1e-3, (d > 0.01).mean()
