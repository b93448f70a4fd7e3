"""Farneback dense optical flow as a jit-compiled XLA program.

This replaces every cv::calcOpticalFlowFarneback call site in the reference
(RipCurrents_main/main.cpp:264,609,961,1119,1481; ripcurrents.cpp:215;
RipCurrents_android jni/ripcurrents.cpp:167,171). The algorithm is
Farneback's polynomial-expansion method (Farneback 2003) with OpenCV's
exact numerical conventions, re-expressed TPU-first:

- per-level frame prep (Gaussian pre-smooth, pyramid resize, both
  expansion correlations, kernel-layout padding, bf16 cast) is one
  composed pair of banded-matmul passes on the MXU (poly_exp_level),
- the flow-conditioned resampling + normal-equation update + window blur
  + 2x2 solve iterate inside fused Pallas kernels on TPU
  (flow/fused_update.py); portable XLA formulations of the warp (gather /
  shift decomposition / tiled base+residual) remain for CPU, spatial
  sharding, and parity testing,
- `farneback_stream` carries per-frame expansions through a video scan so
  consecutive pairs expand each frame once (identical results).

Everything is static-shaped and scan/vmap friendly; batching over frame
pairs is `jax.vmap(farneback, ...)`.

Conventions: images are (H, W) float32 (uint8 accepted), flow is (H, W, 2)
with channel 0 = dx (columns), channel 1 = dy (rows) — same as OpenCV.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ripcurrents_tpu.config import FarnebackParams
from ripcurrents_tpu.ops.conv import gaussian_kernel
from ripcurrents_tpu.ops.image import (resize_bilinear,
                                       resize_bilinear_cf,
                                       resize_bilinear_cf_padded)


@functools.lru_cache(maxsize=1)
def _pipe_default() -> int:
    """Mega-kernel schedule selector (RIPC_PIPE, default 2).
    RIPC_PIPE=0: serial schedule. RIPC_PIPE=1: lagged-warp software
    pipeline with the M ping-pong in ONE scratch ref (traced half
    offsets); RIPC_PIPE=2 (default): same schedule with the halves in
    TWO statically distinct refs so Mosaic can PROVE the warp writes
    and blur reads independent (fused_update.py _level_kernel_pipe2).
    Measured on v5e at 1080p windowed: 2 is +3.3% over 0, bit-exact
    (dev 0.0 vs serial, including the vmapped chunked path)."""
    import os
    try:
        return int(os.environ.get("RIPC_PIPE", "2") or "2")
    except ValueError:
        return 2   # unparsable input keeps the measured-best schedule


@functools.lru_cache(maxsize=1)
def _wshift_default() -> str:
    """Base-shift implementation inside the fused warp (RIPC_WSHIFT).
    'roll' — f32 upcast + two pltpu.roll passes (VPU shuffle traffic);
    'mx' — both shifts as one-hot bf16 MXU matmuls (zero rolls, zero
    cast pass, movement rides the otherwise-idle MXU);
    'mxy' — y shift as the matmul (emits f32 — kills the cast and one
    roll), x as the lane roll. All three are bit-identical
    (fused_update._shift_block; tests/test_fused_update.py) —
    scheduling only. Hardware A/B (v5e, 2026-08-20, isolated warp at
    the production bres=1 sw=640 config, tools/bench_warp_variants.py):
    roll 0.542 ms/app, mx 0.551, mxy 0.596, no-shift floor 0.470 — the
    one-hot matmuls do NOT beat the rolls (the Sx build plus the
    matmul->tap serialization costs what the roll shuffles cost), so
    'roll' stays the default and the knob documents the measured
    alternative."""
    import os
    v = os.environ.get("RIPC_WSHIFT", "roll").strip().lower()
    return v if v in ("roll", "mx", "mxy") else "roll"


@functools.lru_cache(maxsize=1)
def _upsk_default() -> bool:
    """IN-KERNEL level-to-level flow upsample opt-in (RIPC_UPSK=1): the
    mega-kernel consumes the coarse padded flow and computes each
    tile's init flow at it == 0 as two small f32 MXU matmuls
    (fused_update._ups_mats), removing the separate upsample dispatch
    between levels and replacing the fine-flow init HBM read (~16.7 MB
    at 1080p L0) with the coarse read (~4.5 MB). Bit-identical to the
    XLA padded upsample (bilinear is 2-tap per output per axis — one
    fused-multiply pair, no reassociation; max dev 0.0 on-chip).
    Measured on v5e 1080p windowed (r4): 798 vs 815 fps — the it == 0
    coarse-window DMA wait plus the serialized ups matmuls cost more
    than the separate XLA dispatches they remove, so the knob stays an
    opt-in record of the measured-negative variant."""
    import os
    return os.environ.get("RIPC_UPSK", "0") != "0"


@functools.lru_cache(maxsize=1)
def _prep_pallas_default() -> bool:
    """Two-kernel Pallas expansion prep opt-in (RIPC_PREP=1): same banded
    matrices as the XLA blocked path, 2 dispatches instead of ~70 — A/B
    knob until confirmed faster on hardware."""
    import os
    return os.environ.get("RIPC_PREP", "0") != "0"


@functools.lru_cache(maxsize=1)
def _ups_pallas_default() -> bool:
    """Single-kernel Pallas flow upsample opt-in (RIPC_UPS=1): same
    resize matrices as the XLA banded-matmul path, one dispatch instead
    of ~25 small ops — A/B knob until confirmed faster on hardware."""
    import os
    return os.environ.get("RIPC_UPS", "0") != "0"


def _upsample_flow_padded(flow, src_true, dst_true, dst_pad, scale):
    """Level-to-level flow upsample in the padded (2, Hp, Wp) layout:
    Pallas kernel on TPU when enabled and the geometry admits it, else
    the XLA per-block banded matmuls."""
    if _ups_pallas_default() and jax.default_backend() == "tpu":
        from ripcurrents_tpu.ops.resize_pallas import (
            resize_bilinear_cf_padded_pallas, resize_cf_padded_pallas_ok)
        if resize_cf_padded_pallas_ok(flow.shape[1:], src_true, dst_true,
                                      dst_pad, scale):
            return resize_bilinear_cf_padded_pallas(
                flow, src_true, dst_true, dst_pad, scale)
    return resize_bilinear_cf_padded(flow, src_true, dst_true, dst_pad,
                                     scale)


# ---------------------------------------------------------------------------
# Polynomial expansion
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _poly_exp_consts(n: int, sigma: float):
    """Gaussian applicability kernels and the needed inverse-Gram entries.

    The local signal model is f(x, y) ~ c + r0*x + r1*y + r2*x^2 + r3*y^2
    + r4*xy fitted by Gaussian-weighted least squares over a (2n+1)^2
    window. The Gram matrix G of the basis under the separable Gaussian
    weight has only four distinct nonzero inverse entries that the
    coefficients depend on (ig11, ig03, ig33, ig55).
    """
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    g /= g.sum()
    xg = x * g
    xxg = x * x * g

    gy = g[:, None]
    gx = g[None, :]
    w = gy * gx
    xs = x[None, :]
    ys = x[:, None]
    G = np.zeros((6, 6))
    G[0, 0] = w.sum()
    G[1, 1] = (w * xs * xs).sum()
    G[2, 2] = G[1, 1]
    G[3, 3] = (w * xs ** 4).sum()
    G[4, 4] = G[3, 3]
    G[5, 5] = (w * xs * xs * ys * ys).sum()
    G[0, 3] = G[3, 0] = G[0, 4] = G[4, 0] = G[1, 1]
    G[3, 4] = G[4, 3] = G[5, 5]
    invG = np.linalg.inv(G)
    ig11, ig03, ig33, ig55 = invG[1, 1], invG[0, 3], invG[3, 3], invG[5, 5]
    return (g.astype(np.float32), xg.astype(np.float32), xxg.astype(np.float32),
            float(ig11), float(ig03), float(ig33), float(ig55))


def _corr1d_multi(img: jax.Array, kernels: list[np.ndarray], axis: int) -> list[jax.Array]:
    """Correlate a 2-D image with several 1-D kernels along one axis,
    replicate border. Returns one (H, W) array per kernel."""
    n = (len(kernels[0]) - 1) // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (n, n)
    x = jnp.pad(img, pad, mode="edge")
    outs = []
    length = img.shape[axis]
    for k in kernels:
        acc = None
        for i, ki in enumerate(k):
            sl = [slice(None), slice(None)]
            sl[axis] = slice(i, i + length)
            term = x[tuple(sl)] * float(ki)
            acc = term if acc is None else acc + term
        outs.append(acc)
    return outs


@functools.lru_cache(maxsize=32)
def _y_section_stride(ph: int) -> int:
    """Row stride of the g/xg/xxg sections inside the stacked y-pass
    matrix/intermediate: ph rounded up to the 128-block size so no output
    block straddles two sections (see the note in _level_prep_matrices)."""
    return -(-ph // 128) * 128


def _level_prep_matrices(h: int, w: int, lh: int, lw: int, n: int,
                         sigma: float, smooth_sz: int, blur_sigma: float,
                         ph: "int | None" = None, pw: "int | None" = None,
                         pad_off: "tuple[int, int]" = (0, 0)):
    """Compose (reflect-101 Gaussian pre-smooth at full res) o (bilinear
    level resize) o (poly-expansion banded correlation) into one y matrix
    and three x matrices, built in float64 host-side.

    All three stages are separable linear maps, so the whole per-level
    frame prep collapses into two MXU matmul passes over the FULL-RES
    image — no intermediate smoothed/resized images ever touch HBM. This
    replaces the reference's per-level GaussianBlur + pyramid resize
    (cv2 calcOpticalFlowFarneback internals) with algebraically identical
    matrices (composition in f64 is, if anything, more accurate than the
    sequential f32 passes).
    """
    from ripcurrents_tpu.ops.conv import gaussian_kernel
    from ripcurrents_tpu.ops.image import _linear_weights

    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    g /= g.sum()
    xg = x * g
    xxg = x * x * g

    kg = np.asarray(gaussian_kernel(smooth_sz, blur_sigma), np.float64)

    def blur_mat(size: int) -> np.ndarray:
        B = np.zeros((size, size))
        half = (len(kg) - 1) // 2
        for d in range(size):
            for i, kv in enumerate(kg):
                s = d - half + i
                while s < 0 or s >= size:   # reflect-101
                    s = -s if s < 0 else 2 * (size - 1) - s
                B[d, s] += kv
        return B

    def resize_mat(src: int, dst: int) -> np.ndarray:
        if src == dst:
            return np.eye(src)
        idx, wgt = _linear_weights(src, dst)
        R = np.zeros((dst, src))
        np.add.at(R, (np.repeat(np.arange(dst), 2), idx.reshape(-1)),
                  wgt.astype(np.float64).reshape(-1))
        return R

    def band_mat(size: int, k: np.ndarray) -> np.ndarray:
        """(dst, src) banded correlation with replicate border."""
        half = (len(k) - 1) // 2
        B = np.zeros((size, size))
        for i, kv in enumerate(k):
            src = np.clip(np.arange(size) - half + i, 0, size - 1)
            np.add.at(B, (np.arange(size), src), kv)
        return B

    ph = lh if ph is None else ph
    pw = lw if pw is None else pw
    oy, ox = pad_off

    def padded(m, rows, off):                    # embed at [off, off+lh)
        return np.pad(m, ((off, rows - off - m.shape[0]), (0, 0)))

    pre_y = resize_mat(h, lh) @ blur_mat(h)      # (lh, h)
    pre_x = resize_mat(w, lw) @ blur_mat(w)      # (lw, w)
    # Sections stacked at a 128-aligned stride (_y_section_stride), not at
    # ph: a 128-output-block straddling two sections would otherwise read
    # the tail of one src window AND the head of the next, and since
    # block_band_windows shares ONE window width across blocks, that
    # single straddler used to poison every block to a full-source window
    # (e.g. 318 -> 1080 rows at the 540x960 level, ~3.4x the y-pass
    # FLOPs). The pad rows are zero and the consumers slice them away, so
    # results are bit-identical.
    ph_s = _y_section_stride(ph)
    by3 = np.concatenate([padded(band_mat(lh, k) @ pre_y, ph_s, oy)
                          for k in (g, xg, xxg)], axis=0).T   # (h, 3*ph_s)
    bx_g = padded(band_mat(lw, g) @ pre_x, pw, ox).T          # (w, pw)
    bx_xg = padded(band_mat(lw, xg) @ pre_x, pw, ox).T
    bx_xxg = padded(band_mat(lw, xxg) @ pre_x, pw, ox).T
    return (by3.astype(np.float32), bx_g.astype(np.float32),
            bx_xg.astype(np.float32), bx_xxg.astype(np.float32))


@functools.lru_cache(maxsize=64)
def _banded_blocks(which, h, w, lh, lw, n, sigma, smooth_sz,
                   blur_sigma, ph, pw, pad_off):
    """Decompose one of the dense level-prep matrices into per-output-block
    windows: tuple of (src0, W_b (SRCW, width) | None, width); None marks
    an all-zero block (the padded canvas margins — skipped at runtime).

    The dense composed matrices are extremely sparse-banded (~35-of-1920
    nonzero per column at level 0), so a dense matmul wastes >95% of its
    MXU FLOPs. Each 128-wide output block only touches a short source
    window; the windows and weights are sliced EXACTLY out of the dense
    matrix, so borders/resize phase/padding need no special cases."""
    from ripcurrents_tpu.ops.banded import block_band_windows
    mats = _level_prep_matrices(h, w, lh, lw, n, sigma, smooth_sz,
                                blur_sigma, ph, pw, pad_off)
    m = {"y": mats[0], "x_g": mats[1], "x_xg": mats[2],
         "x_xxg": mats[3]}[which]
    return block_band_windows(m, 128)


@functools.lru_cache(maxsize=64)
def _banded_blocks_x3(h, w, lh, lw, n, sigma, smooth_sz,
                      blur_sigma, ph, pw, pad_off):
    """The three x-pass matrices (g, xg, xxg) fused into ONE weight block
    per 128-col output block: (src0, W (SRCW, 3*width) | None, width)
    with W columns [g | xg | xxg] over the UNION source window.

    One (3ph, SRCW) @ (SRCW, 3*width) matmul per block replaces three
    narrow ones — the x pass is dispatch-overhead-bound at these shapes
    (45 sub-200-MFLOP dots at 1080p), so a 3x fatter N dim at ~1.5x the
    FLOPs is a net win on the MXU. The unused row ranges of the xg/xxg
    columns (xg only needs the first 2*ph LHS rows, xxg the first ph) are
    computed and discarded by the epilogue slices."""
    from ripcurrents_tpu.ops.banded import block_band_windows
    mats = _level_prep_matrices(h, w, lh, lw, n, sigma, smooth_sz,
                                blur_sigma, ph, pw, pad_off)
    return block_band_windows(mats[1:4], 128)   # x_g, x_xg, x_xxg fused


def _poly_exp_level_dense(img, ph, pw, ig11, ig03, ig33, ig55, args,
                          channels_first, out_dtype):
    """Dense-matrix form of poly_exp_level (CPU fallback)."""
    by3, bx_g, bx_xg, bx_xxg = (jnp.asarray(m)
                                for m in _level_prep_matrices(*args))
    ps = _y_section_stride(ph)
    t = jnp.einsum("sn,sw->nw", by3, img.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    t0, t1 = t[:ph], t[ps:ps + ph]
    tg = jnp.einsum("sn,hs->hn", bx_g, t,
                    preferred_element_type=jnp.float32)
    b1, b3, b5 = tg[:ph], tg[ps:ps + ph], tg[2 * ps:2 * ps + ph]
    txg = jnp.einsum("sn,hs->hn", bx_xg, jnp.concatenate([t0, t1]),
                     preferred_element_type=jnp.float32)
    b2, b6 = txg[:ph], txg[ph:]
    b4 = jnp.einsum("sn,hs->hn", bx_xxg, t0,
                    preferred_element_type=jnp.float32)
    out = jnp.stack([b2 * ig11, b3 * ig11,
                     b1 * ig03 + b4 * ig33,
                     b1 * ig03 + b5 * ig33,
                     b6 * ig55], axis=0 if channels_first else -1)
    return out.astype(out_dtype) if out_dtype is not None else out


def _apply_blocked_left(img: jax.Array, blocks, out_dtype=jnp.float32
                        ) -> jax.Array:
    """OUT = M^T @ IMG with the same per-block decomposition (used for the
    y pass, where the output-row blocks each read a short row window of
    the full-res image). Matmul dtype follows img's dtype; accumulation is
    f32, stored as out_dtype (bf16 when the result feeds the bf16 x
    passes)."""
    cols = img.shape[1]
    outs = []
    for src0, wb, width in blocks:
        if wb is None:
            outs.append(jnp.zeros((width, cols), out_dtype))
        else:
            outs.append(jnp.dot(
                jnp.asarray(np.ascontiguousarray(wb.T)).astype(img.dtype),
                jax.lax.slice(img, (src0, 0), (src0 + wb.shape[0], cols)),
                preferred_element_type=jnp.float32).astype(out_dtype))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def poly_exp_level(img: jax.Array, lh: int, lw: int, n: int, sigma: float,
                   smooth_sz: int, blur_sigma: float,
                   channels_first: bool = False,
                   pad_hw: "tuple[int, int] | None" = None,
                   pad_off: "tuple[int, int]" = (0, 0),
                   out_dtype=None) -> jax.Array:
    """Polynomial expansion of one pyramid level computed straight from the
    FULL-RES frame: pre-smooth + resize + both 1-D correlations fused into
    two banded-matmul passes (see _level_prep_matrices).

    pad_hw=(Ph, Pw) with pad_off=(oy, ox): emit the expansion embedded at
    rows [oy, oy+lh), cols [ox, ox+lw) of a (Ph, Pw) zero canvas — the
    exact halo'd layout the fused Pallas kernels keep resident in VMEM —
    with the padding FREE inside the matmuls (zero rows/cols in the band
    matrices) instead of separate pad passes. out_dtype=bfloat16 fuses the
    storage cast into the channel stack.
    """
    h, w = img.shape
    ph, pw = pad_hw if pad_hw is not None else (lh, lw)
    _, _, _, ig11, ig03, ig33, ig55 = _poly_exp_consts(n, sigma)
    args = (h, w, lh, lw, n, sigma, smooth_sz, blur_sigma, ph, pw, pad_off)

    if not _pallas_ok():
        # CPU / virtual-mesh path: the block decomposition only saves MXU
        # FLOPs and its many small dots inflate CPU compile time — use the
        # dense composed matrices (algebraically identical) there.
        return _poly_exp_level_dense(img, ph, pw, ig11, ig03, ig33, ig55,
                                     args, channels_first, out_dtype)

    # The prep matmuls run in bf16 with f32 accumulation: the source frame
    # is uint8-valued (exact in bf16) and the banded weights quantize at
    # ~0.4% relative — the same scale as the bf16 storage cast the
    # expansion table already gets. ~4x MXU throughput vs f32 passes.
    if _prep_pallas_default() and channels_first:
        from ripcurrents_tpu.flow.prep_pallas import (poly_exp_level_pallas,
                                                      prep_pallas_ok)
        if prep_pallas_ok(*args):
            return poly_exp_level_pallas(
                img, args, ig11, ig03, ig33, ig55, _y_section_stride(ph),
                out_dtype if out_dtype is not None else jnp.float32)
    mdt = jnp.bfloat16
    t = _apply_blocked_left(img.astype(mdt), _banded_blocks("y", *args),
                            mdt)
    bx3 = _banded_blocks_x3(*args)
    odt = out_dtype if out_dtype is not None else jnp.float32

    # Per-output-block x passes (all three kernels as ONE fused-weight
    # matmul — see _banded_blocks_x3) + coefficient combine + storage
    # cast, so the (3ph, Pw) f32 x-pass intermediates never materialize —
    # XLA fuses the combine/cast into each block matmul's epilogue.
    cols = []
    for s0, wb, width in bx3:
        if wb is None:
            cols.append(jnp.zeros((5, ph, width), odt))
            continue
        big = jnp.dot(
            jax.lax.slice(t, (0, s0), (t.shape[0], s0 + wb.shape[0])),
            jnp.asarray(wb).astype(mdt),
            preferred_element_type=jnp.float32)
        ps = _y_section_stride(ph)
        tgb = big[:, :width]
        b1b, b3b, b5b = (tgb[:ph], tgb[ps:ps + ph],
                         tgb[2 * ps:2 * ps + ph])
        b2b = big[:ph, width:2 * width]
        b6b = big[ps:ps + ph, width:2 * width]
        b4b = big[:ph, 2 * width:]
        cols.append(jnp.stack(
            [b2b * ig11, b3b * ig11,
             b1b * ig03 + b4b * ig33,
             b1b * ig03 + b5b * ig33,
             b6b * ig55], axis=0).astype(odt))
    out = jnp.concatenate(cols, axis=2) if len(cols) > 1 else cols[0]
    if not channels_first:
        out = jnp.moveaxis(out, 0, -1)
    return out


def poly_exp(img: jax.Array, n: int, sigma: float,
             channels_first: bool = False,
             impl: str = "shifted") -> jax.Array:
    """Per-pixel quadratic expansion coefficients, channels
    [x, y, x^2, y^2, xy]: (H, W, 5), or (5, H, W) if channels_first.
    Gaussian window half-size n.

    impl 'shifted': VPU shifted-add chains (full f32).
    impl 'banded': the 1-D correlations as banded matmuls on the MXU
    (~5-20x faster at 1080p; runs at the backend's matmul precision,
    i.e. bf16 passes on TPU by default).
    """
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_consts(n, sigma)
    if impl == "banded":
        h, w = img.shape
        by3 = jnp.asarray(np.concatenate(
            [_banded_replicate(h, k.tobytes()) for k in (g, xg, xxg)],
            axis=1))
        bx_g = jnp.asarray(_banded_replicate(w, g.tobytes()))
        bx_xg = jnp.asarray(_banded_replicate(w, xg.tobytes()))
        bx_xxg = jnp.asarray(_banded_replicate(w, xxg.tobytes()))
        t = jnp.einsum("sn,sw->nw", by3, img,
                       preferred_element_type=jnp.float32)
        t0, t1, t2 = t[:h], t[h:2 * h], t[2 * h:]
        tg = jnp.einsum("sn,hs->hn", bx_g, jnp.concatenate([t0, t1, t2]),
                        preferred_element_type=jnp.float32)
        b1, b3, b5 = tg[:h], tg[h:2 * h], tg[2 * h:]
        txg = jnp.einsum("sn,hs->hn", bx_xg, jnp.concatenate([t0, t1]),
                         preferred_element_type=jnp.float32)
        b2, b6 = txg[:h], txg[h:]
        b4 = jnp.einsum("sn,hs->hn", bx_xxg, t0,
                        preferred_element_type=jnp.float32)
    else:
        t0, t1, t2 = _corr1d_multi(img, [g, xg, xxg], axis=0)
        b1, b2, b4 = _corr1d_multi(t0, [g, xg, xxg], axis=1)
        (b3, b6) = _corr1d_multi(t1, [g, xg], axis=1)
        (b5,) = _corr1d_multi(t2, [g], axis=1)
    cx = b2 * ig11
    cy = b3 * ig11
    cxx = b1 * ig03 + b4 * ig33
    cyy = b1 * ig03 + b5 * ig33
    cxy = b6 * ig55
    return jnp.stack([cx, cy, cxx, cyy, cxy],
                     axis=0 if channels_first else -1)


# ---------------------------------------------------------------------------
# Flow-conditioned matrix update
# ---------------------------------------------------------------------------

# Border down-weighting ramp (5 px) so window sums near the frame edge do not
# dominate; mirrors OpenCV's FarnebackUpdateMatrices border attenuation.
_BORDER_RAMP = np.array([0.14, 0.14, 0.4472, 0.4472, 0.4472, 1.0], np.float32)


@functools.lru_cache(maxsize=32)
def _border_scale(h: int, w: int) -> np.ndarray:
    ramp = _BORDER_RAMP
    bxy = np.full((max(h, w),), 1.0, np.float32)
    d = np.minimum(np.arange(max(h, w)), np.arange(max(h, w))[::-1])
    bxy = ramp[np.minimum(d, 5)]
    return bxy[:h, None] * bxy[None, :w]


def _warp5_gather(r1: jax.Array, flow: jax.Array):
    """Exact flow-conditioned bilinear resample via gather (reference
    semantics, any displacement). Slow on TPU: per-pixel gathers have no
    hardware path. Returns (samples, inside)."""
    h, w = r1.shape[0], r1.shape[1]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    fx, fy = xs + flow[..., 0], ys + flow[..., 1]
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    inside = (x1 >= 0) & (y1 >= 0) & (x1 < w - 1) & (y1 < h - 1)
    ax = fx - x1
    ay = fy - y1
    x1i = jnp.clip(x1.astype(jnp.int32), 0, w - 2)
    y1i = jnp.clip(y1.astype(jnp.int32), 0, h - 2)
    a00 = ((1 - ax) * (1 - ay))[..., None]
    a01 = (ax * (1 - ay))[..., None]
    a10 = ((1 - ax) * ay)[..., None]
    a11 = (ax * ay)[..., None]
    r1s = (a00 * r1[y1i, x1i] + a01 * r1[y1i, x1i + 1] +
           a10 * r1[y1i + 1, x1i] + a11 * r1[y1i + 1, x1i + 1])
    return r1s, inside


def _warp5_shift(r1: jax.Array, flow: jax.Array, budget: int):
    """TPU-native warp: masked shift decomposition.

    bilinear(T, p + d) == sum over integer shifts s of
    hat(dx - sx) * hat(dy - sy) * T(p + s), where hat(t) = max(0, 1 - |t|)
    selects exactly the 4 bilinear taps. TPUs have no per-lane gather, so
    this trades the pathological per-pixel gather (~40 ms per 1080p call)
    for (2*budget+2)^2 fused shifted multiply-adds on the VPU (~1-3 ms).

    Exact for |d| <= budget; pixels beyond the budget are treated like
    OpenCV's out-of-frame case (documented deviation for extreme motion).
    The inner sum over sx is hoisted: row_sy = sum_sx hat(dx-sx) * T(y+sy,
    x+sx) uses weights independent of sy, so each row term is built once.
    """
    h, w = r1.shape[0], r1.shape[1]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    dx, dy = flow[..., 0], flow[..., 1]
    fx, fy = xs + dx, ys + dy
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    inside = ((x1 >= 0) & (y1 >= 0) & (x1 < w - 1) & (y1 < h - 1) &
              (jnp.abs(dx) <= budget) & (jnp.abs(dy) <= budget))

    pad = budget + 1
    p = jnp.pad(r1, ((pad, pad), (pad, pad), (0, 0)))

    # lax.scan over the vertical shift keeps each XLA fusion at
    # single-shift-row size (a fully unrolled double loop fuses into one
    # giant kernel that blows the 16MB scoped-VMEM limit at 1080p); the
    # horizontal pass stays unrolled inside the body where weights are
    # sy-independent.
    def body(acc, sy):
        syf = sy.astype(jnp.float32)
        wy = jnp.clip(1.0 - jnp.abs(dy - syf), 0.0, 1.0)[..., None]
        row = jnp.zeros_like(r1)
        for sx in range(-budget, budget + 2):
            wx = jnp.clip(1.0 - jnp.abs(dx - sx), 0.0, 1.0)[..., None]
            blk = jax.lax.dynamic_slice(
                p, (pad + sy, pad + sx, 0), r1.shape)
            row = row + wx * blk
        return acc + wy * row, None

    acc, _ = jax.lax.scan(body, jnp.zeros_like(r1),
                          jnp.arange(-budget, budget + 2))
    return acc, inside


def _warp5_tiled(r1: jax.Array, flow: jax.Array, bres: int = 6,
                 max_base: int = 96, th: int = 64, tw: int = 256):
    """TPU warp, tiled base + residual decomposition.

    Per output tile, the rounded tile-mean displacement (the "base") is
    applied as one dynamic slice of the padded table — arbitrary-magnitude
    motion costs nothing. The per-pixel remainder is resolved by the
    shift-decomposition sum over just (2*bres+2)^2 terms. Exact wherever a
    pixel's displacement stays within +-bres px of its tile mean (and
    |mean| <= max_base); other pixels are treated as out-of-frame, like
    OpenCV's border case — a documented deviation confined to violently
    non-smooth flow.

    Compared to the flat budget warp (_warp5_shift) this is both unbounded
    in displacement and ~(budget/bres)^2 cheaper on the VPU.
    """
    h, w, nc = r1.shape[0], r1.shape[1], r1.shape[2]
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    p_pad = max_base + bres + 1
    p = jnp.pad(r1, ((p_pad, p_pad + hp - h), (p_pad, p_pad + wp - w),
                     (0, 0)))
    dxp = jnp.pad(flow[..., 0], ((0, hp - h), (0, wp - w)))
    dyp = jnp.pad(flow[..., 1], ((0, hp - h), (0, wp - w)))
    ty_n, tx_n = hp // th, wp // tw

    def tiled(a):
        return a.reshape(ty_n, th, tx_n, tw).transpose(0, 2, 1, 3)

    dx_t = tiled(dxp)
    dy_t = tiled(dyp)
    # mean base over REAL pixels only — the pad-to-tile-multiple region
    # carries zero flow and must not bias the mean (at 640x480 with 64-px
    # tiles a third of the bottom tile row is padding). A median would be
    # more outlier-robust at motion boundaries, but its per-tile sort costs
    # ~3 ms at 1080p; boundary pixels that stray past the residual budget
    # fall back to the out-of-frame path either way.
    valid = jnp.zeros((hp, wp), jnp.float32).at[:h, :w].set(1.0)
    v_t = tiled(valid)
    v_sum = jnp.maximum(v_t.sum((-1, -2)), 1.0)
    base_x = jnp.clip(jnp.round(dx_t.sum((-1, -2)) / v_sum),
                      -max_base, max_base).astype(jnp.int32)
    base_y = jnp.clip(jnp.round(dy_t.sum((-1, -2)) / v_sum),
                      -max_base, max_base).astype(jnp.int32)

    block_h = th + 2 * (bres + 1)
    block_w = tw + 2 * (bres + 1)
    tys, txs = jnp.meshgrid(jnp.arange(ty_n), jnp.arange(tx_n),
                            indexing="ij")

    def tile_fn(ty, tx, by, bx, dyt, dxt):
        start = (ty * th + p_pad + by - (bres + 1),
                 tx * tw + p_pad + bx - (bres + 1), 0)
        blk = jax.lax.dynamic_slice(p, start, (block_h, block_w, nc))
        # Residuals past the budget are clamped to its edge: the sample is
        # displaced by a bounded offset instead of zeroed, which keeps the
        # constraint informative for the handful of pixels whose flow
        # strays far from the tile mean (zeroing them poisons the
        # window-blurred solve around motion extremes).
        ry = jnp.clip(dyt - by.astype(jnp.float32), -bres, bres)
        rx = jnp.clip(dxt - bx.astype(jnp.float32), -bres, bres)
        # Residuals are clamped to [-bres, bres], so tap bres+1's hat
        # weight is identically zero: (2*bres+1)^2 terms, bit-identical.
        acc = jnp.zeros((th, tw, nc), jnp.float32)
        for sy in range(-bres, bres + 1):
            wy = jnp.clip(1.0 - jnp.abs(ry - sy), 0.0, 1.0)[..., None]
            row = jnp.zeros((th, tw, nc), jnp.float32)
            for sx in range(-bres, bres + 1):
                wx = jnp.clip(1.0 - jnp.abs(rx - sx), 0.0, 1.0)[..., None]
                sub = blk[bres + 1 + sy:bres + 1 + sy + th,
                          bres + 1 + sx:bres + 1 + sx + tw, :]
                row = row + wx * sub
            acc = acc + wy * row
        return acc

    out_tiles = jax.vmap(tile_fn)(
        tys.reshape(-1), txs.reshape(-1),
        base_y.reshape(-1), base_x.reshape(-1),
        dy_t.reshape(-1, th, tw), dx_t.reshape(-1, th, tw))
    out = out_tiles.reshape(ty_n, tx_n, th, tw, nc).transpose(
        0, 2, 1, 3, 4).reshape(hp, wp, nc)[:h, :w]

    # validity: frame bounds + residual-within-budget
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    dx, dy = flow[..., 0], flow[..., 1]
    x1 = jnp.floor(xs + dx)
    y1 = jnp.floor(ys + dy)
    inside = (x1 >= 0) & (y1 >= 0) & (x1 < w - 1) & (y1 < h - 1)
    return out, inside


def _warp5_shift_mask(h: int, w: int, flow: jax.Array, budget: int):
    """Just the validity mask of the shift warp (for external warp impls)."""
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    dx, dy = flow[..., 0], flow[..., 1]
    x1 = jnp.floor(xs + dx)
    y1 = jnp.floor(ys + dy)
    inside = ((x1 >= 0) & (y1 >= 0) & (x1 < w - 1) & (y1 < h - 1) &
              (jnp.abs(dx) <= budget) & (jnp.abs(dy) <= budget))
    return None, inside


def update_matrices(r0: jax.Array, r1: jax.Array, flow: jax.Array,
                    warp_budget: int | None = None,
                    warp_impl: str = "shift",
                    warp_residual: int = 6,
                    warp_tile: tuple[int, int] = (64, 256)) -> jax.Array:
    """Build the per-pixel normal-equation channels M = (G11, G12, G22, h1, h2).

    r0/r1: (H, W, 5) polynomial expansions of the two frames; flow (H, W, 2)
    is the current displacement estimate used to resample r1. Warp strategy
    selection is documented on config.FarnebackParams.
    """
    h, w = r0.shape[0], r0.shape[1]
    if warp_budget is None or warp_impl == "gather":
        r1s, inside = _warp5_gather(r1, flow)
    elif warp_impl == "tiled":
        r1s, inside = _warp5_tiled(r1, flow, bres=warp_residual,
                                   th=warp_tile[0], tw=warp_tile[1])
    elif warp_impl == "pallas":
        from ripcurrents_tpu.flow.warp_pallas import warp5_shift_pallas
        r1s = warp5_shift_pallas(r1, flow, warp_budget)
        _, inside = _warp5_shift_mask(r1.shape[0], r1.shape[1], flow,
                                      warp_budget)
    else:
        r1s, inside = _warp5_shift(r1, flow, warp_budget)
    dx, dy = flow[..., 0], flow[..., 1]

    # Linear terms: difference of expansions, -(b1 - b0)/2; quadratic terms:
    # averaged A matrices (off-diagonal xy coefficient carries the extra 1/2
    # from A's symmetrization). Where the warp lands outside the frame the
    # second frame's sample is treated as zero (so the linear term degrades
    # to r0/2) and the quadratic terms fall back to frame 0 alone.
    r2 = jnp.where(inside, (r0[..., 0] - r1s[..., 0]) * 0.5, r0[..., 0] * 0.5)
    r3 = jnp.where(inside, (r0[..., 1] - r1s[..., 1]) * 0.5, r0[..., 1] * 0.5)
    r4 = jnp.where(inside, (r0[..., 2] + r1s[..., 2]) * 0.5, r0[..., 2])
    r5 = jnp.where(inside, (r0[..., 3] + r1s[..., 3]) * 0.5, r0[..., 3])
    r6 = jnp.where(inside, (r0[..., 4] + r1s[..., 4]) * 0.25, r0[..., 4] * 0.5)

    # Fold the prior displacement back in so the solve yields total flow.
    r2 = r2 + r4 * dx + r6 * dy
    r3 = r3 + r6 * dx + r5 * dy

    scale = jnp.asarray(_border_scale(h, w))
    r2, r3, r4, r5, r6 = (t * scale for t in (r2, r3, r4, r5, r6))

    m0 = r4 * r4 + r6 * r6
    m1 = (r4 + r5) * r6
    m2 = r5 * r5 + r6 * r6
    m3 = r4 * r2 + r6 * r3
    m4 = r6 * r2 + r5 * r3
    return jnp.stack([m0, m1, m2, m3, m4], axis=-1)


def _solve_flow(m: jax.Array) -> jax.Array:
    """Per-pixel 2x2 solve of the blurred normal equations."""
    g11, g12, g22, h1, h2 = (m[..., i] for i in range(5))
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    fx = (g22 * h1 - g12 * h2) * idet
    fy = (g11 * h2 - g12 * h1) * idet
    return jnp.stack([fx, fy], axis=-1)




def _banded_replicate(n: int, kbytes: bytes) -> np.ndarray:
    """(n, n) banded correlation matrix for a 1-D kernel with replicate
    border folded into the band (out = B^T contracted against the input)."""
    k = np.frombuffer(kbytes, np.float32)
    half = (len(k) - 1) // 2
    B = np.zeros((n, n), np.float32)
    dst = np.arange(n)
    for i, kv in enumerate(k):
        src = np.clip(dst - half + i, 0, n - 1)
        np.add.at(B, (src, dst), kv)
    return B


def _blur_m(m: jax.Array, winsize: int, gaussian: bool) -> jax.Array:
    """Window-sum the matrix channels: Gaussian (sigma = winsize/2*0.3) or box.

    Each 1-D pass is a banded-matrix matmul so the separable window blur
    runs on the MXU (~6x faster than a shifted-add chain on the VPU at
    1080p); the replicate border is folded into the band matrix.
    """
    half = winsize // 2
    if gaussian:
        x = np.arange(-half, half + 1, dtype=np.float64)
        sig = max(half * 0.3, 1e-6)
        k = np.exp(-(x * x) / (2 * sig * sig))
        k = (k / k.sum()).astype(np.float32)
    else:
        k = np.full((2 * half + 1,), 1.0 / (2 * half + 1), np.float32)
    by = jnp.asarray(_banded_replicate(m.shape[0], k.tobytes()))
    bx = jnp.asarray(_banded_replicate(m.shape[1], k.tobytes()))
    t = jnp.einsum("sn,swc->nwc", by, m,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("sn,hsc->hnc", bx, t,
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Pyramid driver
# ---------------------------------------------------------------------------

def _level_geometry(h: int, w: int, p: FarnebackParams, k: int):
    scale = p.pyr_scale ** k
    lw = int(round(w * scale))
    lh = int(round(h * scale))
    sigma = (1.0 / scale - 1.0) * 0.5
    smooth_sz = max(int(round(sigma * 5)) | 1, 3)
    return scale, lh, lw, sigma, smooth_sz


def _prep_level_args(h, w, p: FarnebackParams, k):
    """The poly_exp_level argument tuple for pyramid level k in the
    fused kernels' halo'd table layout (shared by farneback_precompute
    and the in-kernel prep fusion so both build the SAME matrices)."""
    from ripcurrents_tpu.flow.fused_update import HALO_X, HALO_Y, _row_tile
    _, lh, lw, sigma, smooth_sz = _level_geometry(h, w, p, k)
    th = _row_tile(lh)
    ph = -(-lh // th) * th + 2 * HALO_Y
    pw = -(-lw // 128) * 128 + 2 * HALO_X
    return (h, w, lh, lw, p.poly_n, p.poly_sigma, smooth_sz, sigma,
            ph, pw, (HALO_Y, HALO_X))


def _precompute_level(f: jax.Array, h, w, p: FarnebackParams, k,
                      cf: bool):
    """One level of farneback_precompute (split out so the lagged-stream
    prep fusion can compute fallback levels identically)."""
    _, lh, lw, sigma, smooth_sz = _level_geometry(h, w, p, k)
    if p.poly_impl == "banded":
        pad_hw, pad_off, dt = None, (0, 0), None
        if cf:
            from ripcurrents_tpu.flow.fused_update import (
                HALO_X, HALO_Y, _row_tile)
            th = _row_tile(lh)
            pad_hw = (-(-lh // th) * th + 2 * HALO_Y,
                      -(-lw // 128) * 128 + 2 * HALO_X)
            pad_off = (HALO_Y, HALO_X)
            dt = jnp.bfloat16
        return poly_exp_level(f, lh, lw, p.poly_n, p.poly_sigma,
                              smooth_sz, sigma, channels_first=cf,
                              pad_hw=pad_hw, pad_off=pad_off,
                              out_dtype=dt)
    kg = jnp.asarray(gaussian_kernel(smooth_sz, sigma), jnp.float32)
    level_img = resize_bilinear(_gauss_blur_reflect(f, kg), (lh, lw))
    return poly_exp(level_img, p.poly_n, p.poly_sigma,
                    channels_first=cf, impl=p.poly_impl)


def farneback_precompute(frame: jax.Array, p: FarnebackParams):
    """Per-level polynomial expansions of one frame (coarsest first).

    In a video stream, consecutive frame pairs share a frame; carrying
    this tuple through the stream's scan halves the expansion work (the
    flow result is bit-identical to the pairwise entry point — cv2 has no
    counterpart because it recomputes both pyramids per call)."""
    f = frame.astype(jnp.float32)
    h, w = f.shape
    cf = p.warp_impl == "fused" and _fused_ok(h, w)
    out = []
    for k in range(p.levels, -1, -1):
        _, lh, lw, sigma, smooth_sz = _level_geometry(h, w, p, k)
        if p.poly_impl == "banded":
            # Pre-smooth + level resize + expansion correlations fused
            # into two banded-matmul passes over the full-res frame. The
            # fused-kernel path gets the halo'd bf16 VMEM-resident layout
            # for free (zero margins folded into the band matrices, the
            # storage cast fused into the channel stack).
            pad_hw, pad_off, dt = None, (0, 0), None
            if cf:
                from ripcurrents_tpu.flow.fused_update import (
                    HALO_X, HALO_Y, _row_tile)
                th = _row_tile(lh)
                pad_hw = (-(-lh // th) * th + 2 * HALO_Y,
                          -(-lw // 128) * 128 + 2 * HALO_X)
                pad_off = (HALO_Y, HALO_X)
                dt = jnp.bfloat16
            out.append(poly_exp_level(f, lh, lw, p.poly_n, p.poly_sigma,
                                      smooth_sz, sigma, channels_first=cf,
                                      pad_hw=pad_hw, pad_off=pad_off,
                                      out_dtype=dt))
        else:
            kg = jnp.asarray(gaussian_kernel(smooth_sz, sigma), jnp.float32)
            level_img = resize_bilinear(_gauss_blur_reflect(f, kg),
                                        (lh, lw))
            out.append(poly_exp(level_img, p.poly_n, p.poly_sigma,
                                channels_first=cf, impl=p.poly_impl))
    return tuple(out)


def farneback(prev: jax.Array, nxt: jax.Array, p: FarnebackParams,
              init_flow: jax.Array | None = None) -> jax.Array:
    """Dense flow from `prev` to `nxt`; (H, W) -> (H, W, 2) float32.

    Matches cv2.calcOpticalFlowFarneback(prev, nxt, None, p...) to sub-pixel
    agreement (see tests/test_farneback.py EPE bounds).
    """
    return farneback_from_expansions(
        farneback_precompute(prev, p), farneback_precompute(nxt, p),
        prev.shape, p, init_flow)


def farneback_stream(prev_exp, nxt: jax.Array, p: FarnebackParams,
                     init_flow: jax.Array | None = None,
                     channels_first: bool = False):
    """Streaming step: (previous frame's expansions, next frame) ->
    (flow, next frame's expansions). Carry the returned expansions in the
    scan state to amortize one expansion per frame pair.

    channels_first=True returns flow as (2, h, w) — the kernels' native
    layout — skipping the trailing relayout for consumers that split
    u/v anyway (channels-last (h, w, 2) packs only 2 of 128 lanes in the
    minor dim, so the default layout costs a full-array transpose)."""
    nxt_exp = farneback_precompute(nxt, p)
    flow = farneback_from_expansions(prev_exp, nxt_exp, nxt.shape, p,
                                     init_flow, channels_first)
    return flow, nxt_exp


def farneback_stream_lagged(carry, frame: jax.Array, p: FarnebackParams,
                            channels_first: bool = False):
    """One-frame-lagged streaming step with IN-KERNEL next-frame prep
    (r4): carry = (expansions of frame t-1, expansions of frame t);
    feeding frame t+1 returns flow(t-1 -> t) and the carry advanced to
    (e_t, e_{t+1}) — with e_{t+1}'s prep matmuls computed INSIDE the
    pair's mega-kernels on MXU cycles the warp tap stream leaves idle
    (farneback_from_expansions prep_next_frame), so the separate
    per-frame XLA prep chain leaves the critical path entirely.

    Cost: one frame of output latency (~33 ms at 30 fps — immaterial
    for the multi-camera deployment). Flow values are functionally
    equal to farneback_stream: the kernel-hosted prep matches the XLA
    prep up to one-ULP bf16 rounding spots (mean < 1e-4, <0.1% of
    pixels — test_fused_update.py tolerance), measured bit-identical
    flow on v5e. Initialize the carry with jax.vmap-free calls:
    ``(farneback_precompute(f0, p), farneback_precompute(f1, p))``."""
    e_a, e_b = carry
    flow, e_c = farneback_from_expansions(
        e_a, e_b, frame.shape, p, None, channels_first,
        prep_next_frame=frame)
    return flow, (e_b, e_c)


def farneback_stream_chunk(prev_exp, frames: jax.Array, p: FarnebackParams,
                           channels_first: bool = False):
    """Chunked streaming step: (expansions of frame t, frames t+1..t+B)
    -> (B stacked flows, expansions of frame t+B).

    Consecutive pair flows of ONE stream are independent given the
    per-frame expansions — the stream scan shares only expansions, never
    flow (the reference never sets OPTFLOW_USE_INITIAL_FLOW,
    main.cpp:264,609,961,1119,1481). Batching B pairs per dispatch vmaps
    the pair kernels over a leading axis, handing Mosaic/XLA B
    independent kernel grids to hide inter-kernel bubbles and DMA
    latency behind. Same dense flow for the same single stream (equal to
    the per-step scan up to float reassociation from the vmapped
    matmuls, see tests), higher per-chip throughput; the cost is B
    frames of latency (~B/30 s on a live 30 fps camera).
    """
    es = jax.vmap(lambda f: farneback_precompute(f, p))(frames)
    e_all = jax.tree.map(
        lambda head, rest: jnp.concatenate([head[None], rest]),
        prev_exp, es)
    e0 = jax.tree.map(lambda x: x[:-1], e_all)
    e1 = jax.tree.map(lambda x: x[1:], e_all)
    flows = jax.vmap(
        lambda a, b: farneback_from_expansions(
            a, b, frames.shape[1:], p, None, channels_first))(e0, e1)
    return flows, jax.tree.map(lambda x: x[-1], es)


def farneback_stream_multi(prev_exps, frames: jax.Array,
                           p: FarnebackParams,
                           channels_first: bool = False,
                           consume=None, frame_map=None):
    """Multi-stream step with SEQUENTIAL per-stream scheduling: N
    independent camera streams advanced F frames each inside one
    dispatch.

    prev_exps is the per-stream expansion carry stacked on a leading
    stream axis (as produced by ``jax.vmap(farneback_precompute)`` over
    the streams' first frames, or by a previous call); frames is
    (N, F, h, w). Returns (flows, new_exps) where flows is
    (N, F, h, w, 2) (or (N, F, 2, h, w) channels_first).

    Why not vmap: batching the Pallas mega-kernels over a stream axis
    extends their grids and evicts the VMEM-resident warp tables —
    measured 417-454 fps aggregate vs 516 fps single-stream at 1080p on
    v5e (docs/DESIGN.md). Unrolling the (static, small) stream axis in
    Python keeps every kernel at single-stream VMEM residency, so the
    per-chip aggregate tracks the single-stream rate (r5 decomposition
    at matched 16-frame scans, same process, warm: x2/x4 ~902-904 vs
    single ~912-915 fps at 1080p — the ~1% is cross-stream
    kernel-transition scheduling, constant in N, not a VMEM
    regression; the vmapped form re-measured 680 fps, still dead);
    latency per dispatch is N*F frame periods, fine for
    the multi-camera deployment (BASELINE.md config #5) at chunk sizes
    of a few frames. This is the multi-camera scheduler the reference
    lacks entirely (it is single-video, main.cpp:55-90).

    `consume` (optional): a per-frame reducer flow -> pytree applied
    INSIDE each stream's scan, mirroring how the mode pipelines consume
    flow (pipelines/runner scans analysis over each frame's flow rather
    than keeping it). With consume set, the stacked (N, F, 2, h, w)
    flow array is never materialized to HBM (~17 MB/frame of write+read
    traffic the deployment never pays); the return is the stacked
    per-frame consume results instead.

    `frame_map` (optional): a per-frame transform applied to each frame
    INSIDE its stream's scan, just before the engine. Deployment leaves
    it None; the benchmark harness uses it to inject its rep-dependency
    perturbation per (h, w) frame at the point the deployment would
    ingest it — perturbing the whole (N, F, h, w) batch outside the
    scans materializes a full-batch HBM temp per rep that the
    deployment never pays (VERDICT r3 task #5).
    """
    n = frames.shape[0]
    flows, new_exps = [], []
    for s in range(n):
        e_s = jax.tree.map(lambda x, s=s: x[s], prev_exps)

        def body(e, f):
            if frame_map is not None:
                f = frame_map(f)
            fl, e2 = farneback_stream(e, f, p,
                                      channels_first=channels_first)
            return e2, fl if consume is None else consume(fl)

        e_out, fl_s = jax.lax.scan(body, e_s, frames[s])
        flows.append(fl_s)
        new_exps.append(e_out)
    return (jax.tree.map(lambda *xs: jnp.stack(xs), *flows),
            jax.tree.map(lambda *xs: jnp.stack(xs), *new_exps))


def farneback_from_expansions(e0, e1, hw, p: FarnebackParams,
                              init_flow: jax.Array | None = None,
                              channels_first: bool = False,
                              prep_next_frame: jax.Array | None = None):
    """Dense flow from two frames' precomputed expansions.

    prep_next_frame (lagged-stream prep fusion, r4): additionally
    compute the NEXT frame's per-level expansions, hosting each level's
    prep matmuls inside a mega-kernel one pyramid level coarser (where
    the MXU idles during the VPU warp taps — the separate XLA prep
    dispatch chain disappears from the critical path). Returns
    (flow, next_expansions) in that case; levels whose geometry cannot
    host fall back to the identical XLA prep. Kernel-hosted tables are
    functionally equal to the XLA path (same dense matrices, same
    bf16/f32 contraction order padded with zero terms; one-ULP bf16
    rounding spots possible — measured bit-identical flow on v5e)."""
    h, w = hw
    prep_tables = {}
    prep_f = (prep_next_frame.astype(jnp.float32)
              if prep_next_frame is not None else None)
    cf = p.warp_impl == "fused" and _fused_ok(h, w)
    wr = p.warp_residual
    subcol = p.warp_subcol
    it_sched = None
    if h * w >= p.warp_hires_px:
        if p.warp_residual_hires is not None:
            wr = p.warp_residual_hires
        if p.warp_subcol_hires is not None:
            subcol = p.warp_subcol_hires
        it_sched = p.iters_hires
    flow = None
    prev_true = None
    for idx, k in enumerate(range(p.levels, -1, -1)):
        scale, lh, lw, sigma, smooth_sz = _level_geometry(h, w, p, k)
        r0, r1 = e0[idx], e1[idx]
        bres_k = (wr[min(k, len(wr) - 1)] if isinstance(wr, tuple) else wr)
        if it_sched is None:
            iters_k = p.iterations
        elif isinstance(it_sched, tuple):
            iters_k = it_sched[min(k, len(it_sched) - 1)]
        else:
            iters_k = it_sched
        # A schedule entry of 0 would behave inconsistently across the
        # kernel paths (the fused chains still run one effective solve,
        # the XLA fallback would run none and leave the level's flow
        # unrefined — ADVICE r3 #1): every level runs >= 1 iteration.
        iters_k = max(1, iters_k)

        if cf:
            # Channels-first Pallas hot loop. Flow stays in the PADDED
            # (2, Hp, Wp) kernel layout across levels: the level-to-level
            # upsample embeds the crop, the zero pads and the 1/pyr_scale
            # rescale inside its resize matrices
            # (resize_bilinear_cf_padded), so no per-level jnp.pad / crop
            # / multiply passes ever run — one crop+moveaxis at the end.
            # With the FUSED upsample (r4, _ups_mats — OPT-IN via
            # RIPC_UPSK=1, measured-negative: 798 vs 815 fps, see
            # docs/DESIGN.md and _upsk_default()), the mega-kernel
            # consumes the coarse flow directly and computes each
            # tile's init flow in-kernel at it == 0, removing the
            # separate upsample dispatch and its fine-flow HBM
            # round-trip entirely (bit-identical: bilinear is 2-tap
            # exact in both forms).
            from ripcurrents_tpu.flow.fused_update import (
                _prep_tile_mats, _row_tile, _ups_mats, chain_vmem_budget,
                chain_vmem_bytes, fused_final_solve, fused_iter_prepped,
                fused_level_prepped, fused_update_prepped,
                level_vmem_budget, level_vmem_bytes,
                level_vmem_budget_resident, level_vmem_bytes_resident,
                prepare_expansions)
            th = _row_tile(lh)
            hp, wp = -(-lh // th) * th, -(-lw // 128) * 128
            coarse = None
            if flow is None:
                if init_flow is not None:
                    f0 = jnp.moveaxis(
                        resize_bilinear(init_flow, (lh, lw)) * scale,
                        -1, 0)
                    flow = jnp.pad(f0, ((0, 0), (0, hp - lh),
                                        (0, wp - lw)))
                else:
                    flow = jnp.zeros((2, hp, wp), jnp.float32)
            else:
                # Defer the upsample: the mega-kernel path fuses it
                # in-kernel when the geometry admits; the chain path
                # materializes it below.
                coarse = (flow, prev_true)
                flow = None
            prev_true = (lh, lw)
            prep = prepare_expansions(r0, r1, th, hw=(lh, lw),
                                      subcol=subcol)
            # Preferred shape: the WHOLE level (first update + every
            # iteration + final solve) as ONE kernel with M ping-ponging
            # in VMEM (fused_level_prepped) — no HBM round-trips and no
            # per-call overheads between iterations. Levels whose M
            # ping-pong exceeds the VMEM budget (e.g. 4K) fall back to
            # the 3-kernel chain, where M lives in its padded (5, Hp, Wp)
            # HBM layout between kernels.
            resident = (level_vmem_bytes_resident(hp, wp, th)
                        <= level_vmem_budget_resident())
            if resident or level_vmem_bytes(hp, wp, th) <= \
                    level_vmem_budget():
                # Software-pipelined kernel when the layout admits it
                # (resident table, >= 3 row tiles): the MXU blur of tile
                # i overlaps the VPU warp of tile i-1 (RIPC_PIPE=0 keeps
                # the serial schedule; 1/2 pick the pipelined variants).
                pipe = (_pipe_default()
                        if (resident and hp // th >= 3
                            and iters_k >= 1) else 0)
                ups_src = None
                if coarse is not None:
                    cflow, ctrue = coarse
                    if (_upsk_default() and pipe != 1
                            and _ups_mats((lh, lw), (hp, wp), th,
                                          tuple(ctrue),
                                          tuple(cflow.shape[1:]),
                                          1.0 / p.pyr_scale) is not None):
                        ups_src = (tuple(ctrue),
                                   tuple(cflow.shape[1:]),
                                   1.0 / p.pyr_scale)
                        flow = cflow
                    else:
                        flow = _upsample_flow_padded(
                            cflow, ctrue, (lh, lw), (hp, wp),
                            1.0 / p.pyr_scale)
                # Lagged-stream prep fusion: this kernel (level k) hosts
                # the prep of the next frame's level k-1 expansion —
                # one level finer, whose own kernel is the busiest and
                # most VMEM-tight (the finest kernel hosts nothing).
                prep_spec = prep_img = None
                if prep_f is not None and k >= 1 and pipe != 1:
                    pargs = _prep_level_args(h, w, p, k - 1)
                    n_prep = hp // th
                    n_steps = (iters_k + 1) * (hp // th)
                    if (n_steps - 1 >= n_prep
                            and _prep_tile_mats(pargs, n_prep)
                            is not None):
                        prep_spec = (pargs, n_prep)
                        prep_img = prep_f
                res = fused_level_prepped(prep, flow, p.winsize,
                                          p.gaussian, bres_k,
                                          iters_k, padded_io=True,
                                          resident_table=resident,
                                          pipe=pipe,
                                          shift=_wshift_default(),
                                          ups_src=ups_src,
                                          prep_img=prep_img,
                                          prep_spec=prep_spec)
                if prep_spec is not None:
                    flow, prep_tables[k - 1] = res
                else:
                    flow = res
                continue
            # 3-kernel chain; the warp table streams its per-tile row
            # windows from HBM when it cannot be VMEM-resident (4K frames,
            # small-VMEM chips). _fused_ok guaranteed the streamed layout
            # fits. The chain kernels take true-size flow; re-enter the
            # padded layout afterwards (4K-only cost).
            if coarse is not None:
                flow = _upsample_flow_padded(
                    coarse[0], coarse[1], (lh, lw), (hp, wp),
                    1.0 / p.pyr_scale)
            stream = (chain_vmem_bytes(hp, wp, th, False)
                      > chain_vmem_budget())
            m = fused_update_prepped(prep, flow[:, :lh, :lw], bres_k,
                                     stream_table=stream,
                                     shift=_wshift_default())
            for _ in range(iters_k - 1):
                m = fused_iter_prepped(prep, m, p.winsize, p.gaussian,
                                       bres_k, stream_table=stream,
                                       shift=_wshift_default())
            fl = fused_final_solve(prep, m, p.winsize, p.gaussian)
            flow = jnp.pad(fl, ((0, 0), (0, hp - lh), (0, wp - lw)))
            continue

        # Portable XLA path: flow at its true (lh, lw, 2) shape.
        if flow is None:
            if init_flow is not None:
                flow = resize_bilinear(init_flow, (lh, lw)) * scale
            else:
                flow = jnp.zeros((lh, lw, 2), jnp.float32)
        else:
            flow = resize_bilinear(flow, (lh, lw)) * (1.0 / p.pyr_scale)

        impl = "tiled" if p.warp_impl == "fused" else p.warp_impl
        tile = _adaptive_tile(lh, lw, p.warp_tile)
        m = update_matrices(r0, r1, flow, p.warp_budget, impl,
                            bres_k, tile)
        for i in range(iters_k):
            flow = _solve_flow(_blur_m(m, p.winsize, p.gaussian))
            if i < iters_k - 1:
                m = update_matrices(r0, r1, flow, p.warp_budget, impl,
                                    bres_k, tile)
    if cf:
        out = flow[:, :h, :w]
        out = out if channels_first else jnp.moveaxis(out, 0, -1)
    else:
        out = jnp.moveaxis(flow, -1, 0) if channels_first else flow
    if prep_next_frame is None:
        return out
    nxt = tuple(
        prep_tables[k] if k in prep_tables
        else _precompute_level(prep_f, h, w, p, k, cf)
        for k in range(p.levels, -1, -1))
    return out, nxt


def _adaptive_tile(lh: int, lw: int, tile: tuple[int, int]) -> tuple[int, int]:
    """Shrink the warp tile for small level images so the tile-mean base
    stays locally representative (>= ~4 tile rows, 2 tile columns). Keeps
    Mosaic's (8, 128) f32 tiling alignment."""
    th, tw = tile
    th = min(th, max(8, (lh // 4) // 8 * 8))
    tw = min(tw, max(128, (lw // 2) // 128 * 128))
    return th, tw


@functools.lru_cache(maxsize=1)
def _pallas_ok() -> bool:
    """The fused Pallas path needs a real TPU backend; on CPU (tests,
    virtual multi-chip meshes) and under GSPMD spatial sharding the
    algebraically identical 'tiled' XLA path is used instead."""
    return jax.default_backend() == "tpu"


def _fused_ok(h: int, w: int) -> bool:
    """True when the fused Pallas engine can run frames of (h, w) on the
    attached chip: TPU backend AND the finest (largest) level's 3-kernel
    chain fits VMEM at least in its streamed-table layout. On small-VMEM
    generations (v2-v4) this is False and the engine stays on the XLA
    tiled warp (ADVICE r1 #5).

    The backend check is deliberately OUTSIDE the cached geometry check:
    caching `_pallas_ok() and geom` per (h, w) would freeze the backend
    answer at first call, making monkeypatched-_pallas_ok interpret
    tests silently exercise the wrong path when another test touched
    the same shape first."""
    return _pallas_ok() and _fused_geom_ok(h, w)


@functools.lru_cache(maxsize=64)
def _fused_geom_ok(h: int, w: int) -> bool:
    from ripcurrents_tpu.flow.fused_update import (_row_tile,
                                                   chain_vmem_budget,
                                                   chain_vmem_bytes)
    th = _row_tile(h)
    hp = -(-h // th) * th
    wp = -(-w // 128) * 128
    return chain_vmem_bytes(hp, wp, th, True) <= chain_vmem_budget()


def _gauss_blur_reflect(img: jax.Array, k: jax.Array) -> jax.Array:
    """Separable Gaussian blur with reflect-101 border (cv2 default)."""
    n = (k.shape[0] - 1) // 2
    x = jnp.pad(img, ((n, n), (n, n)), mode="reflect")
    acc = None
    for i in range(k.shape[0]):
        t = x[i:i + img.shape[0]] * k[i]
        acc = t if acc is None else acc + t
    out = acc
    acc = None
    for i in range(k.shape[0]):
        t = out[:, i:i + img.shape[1]] * k[i]
        acc = t if acc is None else acc + t
    return acc
