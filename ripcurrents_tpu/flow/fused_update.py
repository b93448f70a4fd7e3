"""Pallas TPU kernels: fused Farneback matrix update / iterate / solve.

This is the production hot loop of the Farneback engine (the iteration body
of cv2-style calcOpticalFlowFarneback — reference call sites
RipCurrents_main/main.cpp:264,609,961,1119,1481). Three kernels over
full-width row tiles (th, Wp):

- ``fused_update_prepped``: the first matrix update of a pyramid level —
  tiled base + residual warp of the second frame's polynomial expansion
  plus the FarnebackUpdateMatrices normal-equation tail, from the
  upsampled flow.
- ``fused_iter_prepped``: one FULL iteration — window-blur the previous
  normal equations, solve the per-pixel 2x2 systems, derive per-subcolumn
  integer bases, warp + update — the intermediate flow never leaves VMEM.
- ``fused_final_solve``: the trailing window-blur + solve producing the
  level's flow field.

TPU-native design notes:

- M (the 5 normal-equation channels) lives in HBM at its natural padded
  shape (5, Hp, Wp) with NO replicate-pad round-trip between iterations
  (the v1 kernel re-padded M with jnp.pad every iteration — a full extra
  HBM read+write). Each tile manually DMAs a row window clamped into
  bounds; offsets are written 8*(x//8) so Mosaic can prove (8,128)-tile
  alignment.
- The separable window blur runs on the MXU: per-tile y band matrices
  (BlockSpec-delivered) that fold in BOTH the clamped window offset and
  cv2's replicate border, and a block-banded (384,128) x matrix applied
  per 128-lane block with replicate edge blocks — no rotates/shifts.
- The bf16 expansion table is a whole-array VMEM input, resident across
  grid steps (25 MB at 1080p vs the chip's 128 MB VMEM), so it is DMA'd
  from HBM once per call instead of once per tile; subcolumn halo blocks
  are plain ref loads at dynamic sublane offsets.
- The warp applies a per-(th x SW) subcolumn rounded mean displacement
  ("base") as dynamic rotates (pltpu.roll), then resolves the per-pixel
  remainder (clamped to +-bres) with the (2*bres+1)^2-term shift
  decomposition of bilinear sampling — exact wherever a pixel's
  displacement stays within bres px of its block mean (see
  flow/farneback.py _warp5_tiled for the algebra and the documented
  deviation). Lane-offset slices are hoisted out of the tap double-loop.
- OpenCV's 5-px border attenuation is computed in-kernel from iota (no
  scale input array).
- The production shape is the whole-level MEGA-KERNEL (_level_kernel):
  update + every iteration + final solve in one pallas_call, M
  ping-ponging between two VMEM halves (never touching HBM between
  iterations), the warp table whole-array VMEM-resident when it fits
  (level_vmem_bytes_resident — one table DMA per level instead of one
  halo window per iteration x tile), the init flow DMA'd per tile during
  the it==0 steps only, and flow consumed/produced in the padded
  (2, Hp, Wp) layout (padded_io) so the pyramid driver never pads/crops
  between levels.

The per-iteration cost floor is the warp's shift-decomposition tap loop
on the VPU (the MXU has no per-lane gather path to move it to); measured
variants that do NOT beat it: bf16 tap FMAs, narrow-window rolls,
sign-select bilinear corners, traced-sublane window loads (see
tools/bench_warp_variants.py for the numbers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Expansion-table halo per side (multiples of the (8, 128) f32 tiling).
# Bounds the supported per-block base displacement to +-(HALO - bres - 1).
HALO_Y = 32
HALO_X = 128
# M-window row halo (>= winsize//2 of every reference preset).
MHALO_Y = 16
# Storage dtype of the normal-equation channels between iterations
# (bf16 halves the dominant per-iteration HBM traffic; the blur matmuls
# and solve still accumulate in f32).
M_DTYPE = jnp.bfloat16
# Intermediate dtype BETWEEN the y and x blur matmuls. bf16 runs both
# matmuls at the MXU bf16 rate with ZERO cast passes (the y matmul
# consumes the bf16 M storage directly and emits bf16 for the x matmul);
# the extra rounding is on the order of the M bf16 storage noise. f32
# restores the old behavior (both matmuls at the f32 MXU rate).
BLUR_MID_DTYPE = jnp.bfloat16


@functools.lru_cache(maxsize=1)
def device_vmem_bytes() -> int:
    """Per-core VMEM capacity of the attached TPU (heuristic by device
    kind; conservative for older generations). Used to gate the resident
    warp-table layout and the whole-level mega-kernel — on small-VMEM
    chips (v2-v4) or giant frames (4K) the kernels fall back to streamed
    window DMA, and past that to the XLA tiled warp (ADVICE r1 #5)."""
    mb = 1024 * 1024
    try:
        import jax as _jax
        kind = _jax.devices()[0].device_kind.lower()
    except Exception:
        return 128 * mb
    if "v2" in kind or "v3" in kind:
        return 16 * mb
    if "v4" in kind:
        return 32 * mb
    return 128 * mb   # v5e/v5p/v6e and later


def _row_tile(lh: int) -> int:
    """Row-tile height: multiple of 8, minimal padding, ~96-160 rows."""
    best = None
    for th in range(96, 161, 8):
        hp = -(-lh // th) * th
        key = (hp - lh, -th)
        if best is None or key < best[0]:
            best = (key, th)
    th = best[1]
    return min(th, -(-lh // 8) * 8)   # never taller than the padded image


def _subcol_width(wp: int, pref: "int | None" = None) -> int:
    """Warp-base subcolumn width: multiple of 128 dividing Wp, <= 384.

    pref (e.g. 128) overrides the default when it divides Wp: narrower
    subcolumns track local motion tighter (smaller residual vs the block
    mean -> a smaller bres may hold accuracy) at the cost of more
    rolls — the detector presets' tap count is the lever
    (FarnebackParams.warp_subcol)."""
    if pref is not None and wp % pref == 0:
        return pref
    q = wp // 128
    for d in (3, 2, 1):
        if q % d == 0:
            return 128 * d
    return wp


def _blur_taps(winsize: int, gaussian: bool) -> tuple[float, ...]:
    half = winsize // 2
    if gaussian:
        x = np.arange(-half, half + 1, dtype=np.float64)
        sig = max(half * 0.3, 1e-6)
        k = np.exp(-(x * x) / (2 * sig * sig))
        k = k / k.sum()
    else:
        k = np.full((2 * half + 1,), 1.0 / (2 * half + 1))
    return tuple(float(v) for v in k)


# ---------------------------------------------------------------------------
# In-kernel subroutines (operate on jnp values inside a pallas kernel)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _yblur_bands(ty_n: int, th: int, wh: int, hp: int, h: int,
                 taps: tuple) -> np.ndarray:
    """(ty_n, th, WH) per-tile y-blur band matrices.

    Tile i's matrix maps its DMA'd M row-window (rows [oy_i, oy_i+WH) of
    the padded array) to the blurred tile rows, folding in BOTH the
    window's clamped offset and cv2's replicate border at the true image
    edge — so the kernel's y blur is one small MXU matmul per channel
    with no rotates, shifts, or edge selects."""
    half = (len(taps) - 1) // 2
    bands = np.zeros((ty_n, th, wh), np.float32)
    for i in range(ty_n):
        oy = min(max(i * th - MHALO_Y, 0), hp - wh)
        for d in range(th):
            for o, kv in enumerate(taps):
                src = min(max(i * th + d - half + o, 0), h - 1)
                loc = src - oy
                if 0 <= loc < wh:
                    bands[i, d, loc] += kv
    return bands


@functools.lru_cache(maxsize=64)
def _xblur_blocks(taps: tuple) -> np.ndarray:
    """(384, 128) block-banded x-blur matrix.

    out[b*128+m] = sum_o k[o] * src(b*128+m+o-half); with the source row
    extended by one replicate block on each side, the three 128-col source
    blocks {b, b+1, b+2} of the extension cover every tap (half <= 10), so
    the whole x blur is ext_blocks(th, nb, 384) @ A(384, 128) on the MXU."""
    half = (len(taps) - 1) // 2
    a = np.zeros((384, 128), np.float32)
    for m in range(128):
        for o_i, kv in enumerate(taps):
            o = o_i - half
            j = 1 + (m + o) // 128
            a[j * 128 + ((m + o) % 128), m] += kv
    return a


def _yblur_window(mwin, by_i):
    """y window blur: per-channel (th, WH) @ (WH, Wp) MXU matmul.

    The band matrix is cast to the M storage dtype (bf16 in production —
    the matmul consumes M with no cast pass and runs at the bf16 MXU
    rate) and the result is emitted at BLUR_MID_DTYPE straight into the
    x matmul (f32 MXU accumulation either way)."""
    by_i = by_i.astype(mwin.dtype)
    # Mosaic requires a 32-bit matmul accumulator; the MXU accumulates
    # f32 internally either way, so f32-acc + cast is bit-identical to
    # the old bf16 preferred_element_type form.
    outs = [jnp.dot(by_i, mwin[c],
                    preferred_element_type=jnp.float32)
            .astype(BLUR_MID_DTYPE)
            for c in range(5)]
    return jnp.stack(outs, axis=0)


def _xblur_rows(acc, w_true, a_big):
    """x window blur of (5, th, Wp): replicate-fix the alignment padding,
    extend with one replicate block per side, then one block-banded MXU
    matmul per channel (see _xblur_blocks). acc arrives at BLUR_MID_DTYPE
    from the y matmul; operands run at that dtype (f32 accumulate)."""
    th, wp = acc.shape[1], acc.shape[2]
    nb = wp // 128
    colw1 = jax.lax.slice(acc, (0, 0, w_true - 1),
                          (5, th, w_true))
    col0 = jax.lax.slice(acc, (0, 0, 0), (5, th, 1))
    if w_true < wp:
        ci = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wp), 2)
        acc = jnp.where(ci > w_true - 1, colw1, acc)
    lblk = jnp.broadcast_to(col0, (5, th, 128))
    rblk = jnp.broadcast_to(colw1, (5, th, 128))
    ext = jnp.concatenate([lblk, acc, rblk], axis=2)
    a_big = a_big.astype(acc.dtype)
    blocks = []
    for b in range(nb):
        e = jax.lax.slice(ext, (0, 0, b * 128),
                          (5, th, b * 128 + 384)).reshape(5 * th, 384)
        blocks.append(jnp.dot(e, a_big,
                              preferred_element_type=jnp.float32))
    out = jnp.concatenate(blocks, axis=1) if nb > 1 else blocks[0]
    return out.reshape(5, th, wp)


def _solve(mb):
    """Per-pixel 2x2 solve of blurred normal equations (5,th,Wp)->dx,dy."""
    idet = 1.0 / (mb[0] * mb[2] - mb[1] * mb[1] + 1e-3)
    dx = (mb[2] * mb[3] - mb[1] * mb[4]) * idet
    dy = (mb[0] * mb[4] - mb[1] * mb[3]) * idet
    return dx, dy


def _tap_sum(colvars, rx, ry, bres, th, sw, y0=HALO_Y):
    """The (2*bres+1)^2-term shift-decomposition tap loop shared by the
    warp variants: returns sum_{sy,sx} wy(sy) wx(sx) T[sy, sx] over the
    5 channels. y0 is the colvars row corresponding to tap sy == 0
    (HALO_Y for full halo blocks; bres for pre-shifted narrow blocks).

    bres == 1: the nine 2-D weight planes wy*wx are built ONCE and shared
    across the 5 channels (9 muls + 5*9 FMAs per element vs the factored
    form's 5*(9+3) FMAs — ~10% fewer VPU instructions). bres >= 2: the
    factored form (x-combine per sy, then one wy FMA) wins, since the
    shared-plane build grows as n^2 against the factored form's n savings
    (break-even at n = 2*bres+1 = 5)."""
    wxs = [jnp.clip(1.0 - jnp.abs(rx - sx), 0.0, 1.0)
           for sx in range(-bres, bres + 1)]
    if bres == 1:
        acc = jnp.zeros((5, th, sw), jnp.float32)
        for sy in range(-bres, bres + 1):
            wy = jnp.clip(1.0 - jnp.abs(ry - sy), 0.0, 1.0)
            for k in range(2 * bres + 1):
                w2 = wy * wxs[k]
                sub = jax.lax.slice(
                    colvars[k], (0, y0 + sy, 0),
                    (5, y0 + sy + th, sw))
                acc = acc + w2[None] * sub
        return acc
    acc = jnp.zeros((5, th, sw), jnp.float32)
    for sy in range(-bres, bres + 1):
        wy = jnp.clip(1.0 - jnp.abs(ry - sy), 0.0, 1.0)
        row = jnp.zeros((5, th, sw), jnp.float32)
        for k in range(2 * bres + 1):
            sub = jax.lax.slice(
                colvars[k], (0, y0 + sy, 0),
                (5, y0 + sy + th, sw))
            row = row + wxs[k][None] * sub
        acc = acc + wy[None] * row
    return acc


def _block_base(dxs, dys, cnt, bres):
    """Per-subcolumn rounded-mean integer base displacement, clamped so
    the shifted tap window stays inside the halo."""
    bx = jnp.clip(jnp.round(jnp.sum(dxs) / cnt),
                  -(HALO_X - bres - 1), HALO_X - bres - 1
                  ).astype(jnp.int32)
    by = jnp.clip(jnp.round(jnp.sum(dys) / cnt),
                  -(HALO_Y - bres - 1), HALO_Y - bres - 1
                  ).astype(jnp.int32)
    return bx, by


def _shift_block(blk, bx, by, bres, th, sw, shift):
    """Apply the integer base displacement (bx, by) to one halo block
    blk (5, SH, SWW) bf16 and return (shifted f32 block, y0, x0) where
    the tap at (sy, sx) reads rows [y0+sy, y0+sy+th) x lanes
    [x0+sx, x0+sx+sw). Three bit-identical implementations:

    - 'roll': f32 upcast + two pltpu.roll passes (VPU shuffle traffic —
      the two rolls cost ~0.18 ms per 1080p application).
    - 'mx':   BOTH shifts as one-hot bf16 MXU matmuls Sy @ blk @ Sx —
      zero rolls, zero cast pass (the second matmul emits f32), the
      movement rides the otherwise-idle MXU, and the block shrinks to
      (th+2b, ~sw+2b) before the VPU tap stream. One-hot selection of
      bf16 values with f32 accumulation is exact, so results are
      bit-identical to 'roll' (tests/test_fused_update.py).
    - 'mxy':  y shift as the (cheap) one-hot matmul emitting f32
      directly (kills the cast pass and one roll), x as the lane roll.
    """
    sh = th + 2 * HALO_Y
    sww = blk.shape[2]
    if shift == "roll":
        blk = blk.astype(jnp.float32)
        blk = pltpu.roll(blk, jnp.remainder(sh - by, sh), axis=1)
        blk = pltpu.roll(blk, jnp.remainder(sww - bx, sww), axis=2)
        return blk, HALO_Y, HALO_X
    thb = th + 2 * bres
    ry = jax.lax.broadcasted_iota(jnp.int32, (thb, sh), 0)
    ly = jax.lax.broadcasted_iota(jnp.int32, (thb, sh), 1)
    sy_mat = (ly - ry == by + (HALO_Y - bres)).astype(jnp.bfloat16)
    if shift == "mxy":
        ych = [jnp.dot(sy_mat, blk[c], preferred_element_type=jnp.float32)
               for c in range(5)]
        blk_y = jnp.stack(ych, axis=0)            # (5, thb, SWW) f32
        blk_y = pltpu.roll(blk_y, jnp.remainder(sww - bx, sww), axis=2)
        return blk_y, bres, HALO_X
    # 'mx'
    swb_used = sw + 2 * bres
    swb = -(-swb_used // 128) * 128
    lx = jax.lax.broadcasted_iota(jnp.int32, (sww, swb), 0)
    jx = jax.lax.broadcasted_iota(jnp.int32, (sww, swb), 1)
    sx_mat = ((lx - jx == bx + (HALO_X - bres)) &
              (jx < swb_used)).astype(jnp.bfloat16)
    shifted = []
    for c in range(5):
        ym = jnp.dot(sy_mat, blk[c],
                     preferred_element_type=jnp.float32
                     ).astype(jnp.bfloat16)   # exact: values are bf16
        shifted.append(jnp.dot(ym, sx_mat,
                               preferred_element_type=jnp.float32))
    return jnp.stack(shifted, axis=0), bres, bres  # (5, thb, swb) f32


def _warp_subcols(tbl_ref, i, dx, dy, counts_ref, bres, sw, th,
                  shift="roll"):
    """Tiled base + residual warp over per-(th x SW) subcolumn bases.

    tbl_ref: whole halo-padded expansion table (5, Hp+2*HALO_Y,
    Wp+2*HALO_X) bf16, RESIDENT in VMEM across grid steps (it fits: 25 MB
    at 1080p against the chip's 128 MB VMEM) — each subcolumn loads its
    halo block straight from it, so the table is DMA'd from HBM once per
    kernel call instead of once per tile. dx/dy (th, Wp) current flow.
    Returns r1s (5, th, Wp)."""
    wp = dx.shape[1]
    nsub = wp // sw
    sh = th + 2 * HALO_Y
    sww = sw + 2 * HALO_X
    cols = []
    for s in range(nsub):
        dxs = jax.lax.slice(dx, (0, s * sw), (th, (s + 1) * sw))
        dys = jax.lax.slice(dy, (0, s * sw), (th, (s + 1) * sw))
        bx, by = _block_base(dxs, dys, counts_ref[i, s], bres)
        blk = tbl_ref[:, pl.ds(i * th, sh), pl.ds(s * sw, sww)]
        blk, y0, x0 = _shift_block(blk, bx, by, bres, th, sw, shift)
        # Residuals past the budget are clamped to its edge (bounded
        # sample misplacement beats zeroing — see _warp5_tiled).
        rx = jnp.clip(dxs - bx.astype(jnp.float32),
                      -float(bres), float(bres))
        ry = jnp.clip(dys - by.astype(jnp.float32),
                      -float(bres), float(bres))
        # Tap range note: residuals are CLAMPED to [-bres, bres], so the
        # hat weight of tap bres+1 is identically zero (hat(t) = 0 for
        # |t| >= 1); (2*bres+1)^2 terms suffice — bit-identical to the
        # naive (2*bres+2)^2 decomposition, 30% fewer VPU FMAs at bres=2.
        # Hoist the lane-offset slices (cross-lane data movement) out of
        # the double loop: 2*bres+1 column variants instead of
        # (2*bres+1)^2; the inner loop then takes only sublane-offset
        # slices, which are cheap offset reads.
        colvars = [jax.lax.slice(blk, (0, 0, x0 + sx),
                                 (5, blk.shape[1], x0 + sx + sw))
                   for sx in range(-bres, bres + 1)]
        cols.append(_tap_sum(colvars, rx, ry, bres, th, sw, y0=y0))
    return jnp.concatenate(cols, axis=2) if len(cols) > 1 else cols[0]


def _warp_win(win_ref, slot, i, dx, dy, counts_ref, bres, sw, th,
              shift="roll"):
    """Tiled base + residual warp reading the CURRENT tile's expansion
    window out of the double-buffered p1 scratch (row-stacked layout
    (5, 2*SH, Wp+2*HALO_X); window `slot` holds rows [i*th, i*th+SH) of
    the halo'd table). Same algebra as _warp_subcols."""
    sh = th + 2 * HALO_Y
    wp = dx.shape[1]
    nsub = wp // sw
    sww = sw + 2 * HALO_X
    row0 = slot * sh
    cols = []
    for s in range(nsub):
        dxs = jax.lax.slice(dx, (0, s * sw), (th, (s + 1) * sw))
        dys = jax.lax.slice(dy, (0, s * sw), (th, (s + 1) * sw))
        bx, by = _block_base(dxs, dys, counts_ref[i, s], bres)
        blk = win_ref[:, pl.ds(row0, sh), pl.ds(s * sw, sww)]
        blk, y0, x0 = _shift_block(blk, bx, by, bres, th, sw, shift)
        rx = jnp.clip(dxs - bx.astype(jnp.float32),
                      -float(bres), float(bres))
        ry = jnp.clip(dys - by.astype(jnp.float32),
                      -float(bres), float(bres))
        colvars = [jax.lax.slice(blk, (0, 0, x0 + sx),
                                 (5, blk.shape[1], x0 + sx + sw))
                   for sx in range(-bres, bres + 1)]
        cols.append(_tap_sum(colvars, rx, ry, bres, th, sw, y0=y0))
    return jnp.concatenate(cols, axis=2) if len(cols) > 1 else cols[0]


def _border_ramp(d):
    """OpenCV FarnebackUpdateMatrices 5-px border attenuation ramp as a
    piecewise select over the edge distance (negative d = alignment pad ->
    weight 0, matching the zero-padded scale array it replaces)."""
    return jnp.where(
        d < 0, 0.0,
        jnp.where(d <= 1, 0.14, jnp.where(d <= 4, 0.4472, 1.0)))


def _update_tail_vals(r0, r1s, dx, dy, i, th, h_true, w_true):
    """FarnebackUpdateMatrices tail: constraint terms, prior-flow fold-back,
    border down-weighting (computed from iota — no scale input array);
    returns the 5 normal-equation channels as a list of (th, Wp) f32.

    The border scale is separable (it only ever varies along one axis per
    factor), so it is built from (th, 1) x (1, Wp) ramps — one broadcast
    multiply instead of ~12 full-plane VPU ops. The inside test uses
    floor(v) >= 0 <=> v >= 0 and floor(v) < K <=> v < K (K integer) to
    drop the two floor passes. Values are bit-identical to the 2-D form."""
    wp = dx.shape[1]
    ys = (jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)
          + i * th).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1).astype(jnp.float32)
    scale = (_border_ramp(jnp.minimum(ys, float(h_true) - 1 - ys)) *
             _border_ramp(jnp.minimum(xs, float(w_true) - 1 - xs)))
    xpd = xs + dx
    ypd = ys + dy
    inside = ((xpd >= 0.0) & (ypd >= 0.0) &
              (xpd < float(w_true) - 1) & (ypd < float(h_true) - 1))

    r2 = jnp.where(inside, (r0[0] - r1s[0]) * 0.5, r0[0] * 0.5)
    r3 = jnp.where(inside, (r0[1] - r1s[1]) * 0.5, r0[1] * 0.5)
    r4 = jnp.where(inside, (r0[2] + r1s[2]) * 0.5, r0[2])
    r5 = jnp.where(inside, (r0[3] + r1s[3]) * 0.5, r0[3])
    r6 = jnp.where(inside, (r0[4] + r1s[4]) * 0.25, r0[4] * 0.5)

    r2 = r2 + r4 * dx + r6 * dy
    r3 = r3 + r6 * dx + r5 * dy

    r2 = r2 * scale
    r3 = r3 * scale
    r4 = r4 * scale
    r5 = r5 * scale
    r6 = r6 * scale

    return [r4 * r4 + r6 * r6,
            (r4 + r5) * r6,
            r5 * r5 + r6 * r6,
            r4 * r2 + r6 * r3,
            r6 * r2 + r5 * r3]


def _update_tail(r0, r1s, dx, dy, i, th, h_true, w_true, out_ref):
    """_update_tail_vals stored per channel into out_ref."""
    vals = _update_tail_vals(r0, r1s, dx, dy, i, th, h_true, w_true)
    dt = out_ref.dtype
    for c in range(5):
        out_ref[c] = vals[c].astype(dt)


def _m_window(i, th, wh, hp):
    """Clamped-in-bounds start row of the M row-window. Written as 8*(x//8)
    so Mosaic can PROVE the DMA offset respects the (8, 128) tiling (all
    terms are multiples of 8 anyway, but clip() alone is not provably so).
    """
    return 8 * jnp.clip((i * th - MHALO_Y) // 8, 0, (hp - wh) // 8)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _r0_dma(p0_hbm, tile, th, wp, scr, sem, slot):
    """Async copy of frame-0's (5, th, Wp) expansion tile out of its
    halo'd bf16 HBM table (row offset 8-aligned, lane offset HALO_X)."""
    return pltpu.make_async_copy(
        p0_hbm.at[:, pl.ds(HALO_Y + tile * th, th), pl.ds(HALO_X, wp)],
        scr.at[slot], sem.at[slot])


def _update_kernel(bres, th, sw, h_true, w_true, stream_table, shift,
                   counts_ref, dx_ref, dy_ref, p0_hbm, p1_ref,
                   out_ref, r0_scr, r0_sem, *p1_bufs):
    """stream_table=False: p1 is the whole VMEM-resident halo'd table.
    stream_table=True: p1 stays in HBM; per-tile halo row windows are
    double-buffer DMA'd into p1_bufs (for tables too large to be
    resident — 4K frames, small-VMEM chips)."""
    i = pl.program_id(0)
    n_t = pl.num_programs(0)
    wp = dx_ref.shape[1]
    slot = jax.lax.rem(i, 2)
    sh = th + 2 * HALO_Y

    @pl.when(i == 0)
    def _():
        _r0_dma(p0_hbm, 0, th, wp, r0_scr, r0_sem, 0).start()
        if stream_table:
            _p1_win_dma(p1_ref, 0, th, sh, *p1_bufs, 0).start()

    @pl.when(i + 1 < n_t)
    def _():
        ns = jax.lax.rem(i + 1, 2)
        _r0_dma(p0_hbm, i + 1, th, wp, r0_scr, r0_sem, ns).start()
        if stream_table:
            _p1_win_dma(p1_ref, i + 1, th, sh, *p1_bufs, ns).start()

    dx = dx_ref[:]
    dy = dy_ref[:]
    if stream_table:
        _p1_win_dma(p1_ref, i, th, sh, *p1_bufs, slot).wait()
        r1s = _warp_win(p1_bufs[0], slot, i, dx, dy, counts_ref, bres,
                        sw, th, shift)
    else:
        r1s = _warp_subcols(p1_ref, i, dx, dy, counts_ref, bres, sw, th,
                            shift)
    _r0_dma(p0_hbm, i, th, wp, r0_scr, r0_sem, slot).wait()
    r0 = r0_scr[slot].astype(jnp.float32)
    _update_tail(r0, r1s, dx, dy, i, th, h_true, w_true, out_ref)


def _iter_kernel(bres, th, sw, wh, hp, h_true, w_true, stream_table,
                 shift,
                 counts_ref, by_ref, abig_ref, p0_hbm, p1_ref,
                 m_hbm, out_ref, m_scratch, r0_scr, m_sem, r0_sem,
                 *p1_bufs):
    i = pl.program_id(0)
    n_t = pl.num_programs(0)
    wp = m_hbm.shape[2]
    sh = th + 2 * HALO_Y

    def dma_m(tile, slot):
        return pltpu.make_async_copy(
            m_hbm.at[:, pl.ds(_m_window(tile, th, wh, hp), wh), :],
            m_scratch.at[slot], m_sem.at[slot])

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        dma_m(0, 0).start()
        _r0_dma(p0_hbm, 0, th, wp, r0_scr, r0_sem, 0).start()
        if stream_table:
            _p1_win_dma(p1_ref, 0, th, sh, *p1_bufs, 0).start()

    @pl.when(i + 1 < n_t)
    def _():
        ns = jax.lax.rem(i + 1, 2)
        dma_m(i + 1, ns).start()
        _r0_dma(p0_hbm, i + 1, th, wp, r0_scr, r0_sem, ns).start()
        if stream_table:
            _p1_win_dma(p1_ref, i + 1, th, sh, *p1_bufs, ns).start()

    dma_m(i, slot).wait()
    mb = _yblur_window(m_scratch[slot], by_ref[0])
    mb = _xblur_rows(mb, w_true, abig_ref[:])
    dx, dy = _solve(mb)
    # Zero the alignment-pad rows/cols: the in-kernel solve produces
    # (replicate-blurred) non-zero flow there, but the subcolumn base means
    # divide by REAL-pixel counts — unmasked pads would bias the rounded
    # base on ragged tiles (h % th != 0 or w % 128 != 0).
    ys = jax.lax.broadcasted_iota(jnp.int32, (dx.shape[0], 1), 0) + i * th
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, dx.shape[1]), 1)
    valid = (ys < h_true) & (xs < w_true)   # (th,1)&(1,wp) -> broadcast
    dx = jnp.where(valid, dx, 0.0)
    dy = jnp.where(valid, dy, 0.0)

    if stream_table:
        _p1_win_dma(p1_ref, i, th, sh, *p1_bufs, slot).wait()
        r1s = _warp_win(p1_bufs[0], slot, i, dx, dy, counts_ref, bres,
                        sw, th, shift)
    else:
        r1s = _warp_subcols(p1_ref, i, dx, dy, counts_ref, bres, sw, th,
                            shift)
    _r0_dma(p0_hbm, i, th, wp, r0_scr, r0_sem, slot).wait()
    r0 = r0_scr[slot].astype(jnp.float32)
    _update_tail(r0, r1s, dx, dy, i, th, h_true, w_true, out_ref)


def _final_kernel(th, wh, hp, h_true, w_true,
                  by_ref, abig_ref, m_hbm, out_ref, m_scratch, m_sem):
    i = pl.program_id(0)
    n_t = pl.num_programs(0)

    def dma_m(tile, slot):
        return pltpu.make_async_copy(
            m_hbm.at[:, pl.ds(_m_window(tile, th, wh, hp), wh), :],
            m_scratch.at[slot], m_sem.at[slot])

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        dma_m(0, 0).start()

    @pl.when(i + 1 < n_t)
    def _():
        dma_m(i + 1, jax.lax.rem(i + 1, 2)).start()

    dma_m(i, slot).wait()
    mb = _yblur_window(m_scratch[slot], by_ref[0])
    mb = _xblur_rows(mb, w_true, abig_ref[:])
    dx, dy = _solve(mb)
    out_ref[0] = dx
    out_ref[1] = dy


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def prepare_expansions(e0: jax.Array, e1: jax.Array, th: int,
                       hw: "tuple[int, int] | None" = None,
                       table_dtype=jnp.bfloat16,
                       subcol: "int | None" = None):
    """Per-level kernel inputs: both frames' expansions in the halo'd bf16
    VMEM-resident layout (5, Hp+2*HALO_Y, Wp+2*HALO_X) plus the
    per-(tile, subcolumn) real-pixel counts. One array per frame serves
    BOTH roles (frame-0 constraint terms AND frame-1 warp table), so a
    streamed frame's expansion is padded/cast exactly once.

    Accepts expansions either already halo'd (poly_exp_level pad_hw /
    pad_off emits that layout for free — pass hw=(h, w)) or raw
    (5, h, w), which are padded+cast here."""
    h, w = hw if hw is not None else e0.shape[1:]
    hp = -(-h // th) * th
    wp = -(-w // 128) * 128
    sw = _subcol_width(wp, subcol)
    want = (hp + 2 * HALO_Y, wp + 2 * HALO_X)
    if e0.shape[1:] != want:
        pad = ((0, 0), (HALO_Y, HALO_Y + hp - h),
               (HALO_X, HALO_X + wp - w))
        e0 = jnp.pad(e0, pad).astype(table_dtype)
        e1 = jnp.pad(e1, pad).astype(table_dtype)
    ty_n, nsub = hp // th, wp // sw
    rows = np.minimum(np.arange(ty_n) * th + th, h) - np.arange(ty_n) * th
    cols = np.clip(w - np.arange(nsub) * sw, 0, sw)
    counts = np.maximum(rows[:, None] * cols[None, :], 1).astype(np.float32)
    return {"p0": e0, "p1": e1, "counts": jnp.asarray(counts),
            "hw": (h, w), "hpwp": (hp, wp), "th": th, "sw": sw}


@functools.partial(jax.jit, static_argnames=("bres", "th", "hw", "hpwp",
                                             "stream_table", "sw",
                                             "shift"))
def _fused_update(p0, p1, counts, flow, hw, hpwp, bres, th,
                  stream_table=False, sw=None, shift="roll"):
    h, w = hw
    hp, wp = hpwp
    sw = sw or _subcol_width(wp)
    sh = th + 2 * HALO_Y
    # flow arrives channels-first (2, lh, lw) from the level driver.
    dx = jnp.pad(flow[0], ((0, hp - h), (0, wp - w)))
    dy = jnp.pad(flow[1], ((0, hp - h), (0, wp - w)))
    ty_n = hp // th
    kern = functools.partial(_update_kernel, bres, th, sw, h, w,
                             stream_table, shift)
    scratch = [
        pltpu.VMEM((2, 5, th, wp), p0.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if stream_table:
        scratch += [pltpu.VMEM((5, 2 * sh, wp + 2 * HALO_X), p1.dtype),
                    pltpu.SemaphoreType.DMA((2,))]
    out = pl.pallas_call(
        kern,
        grid=(ty_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # counts
            pl.BlockSpec((th, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),               # dx
            pl.BlockSpec((th, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),               # dy
            # Frame-0 tiles are double-buffer DMA'd from HBM; frame-1's
            # warp table stays resident in VMEM across grid steps when it
            # fits, else its halo row windows are DMA'd per tile.
            pl.BlockSpec(memory_space=pl.ANY),                # p0
            pl.BlockSpec(memory_space=pl.ANY if stream_table
                         else pltpu.VMEM),                       # p1
        ],
        out_specs=pl.BlockSpec((5, th, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, hp, wp), M_DTYPE),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(counts, dx, dy, p0, p1)
    return out


@functools.lru_cache(maxsize=64)
def _update_seq(hw, hpwp, bres, th, stream_table, sw, shift):
    @jax.custom_batching.sequential_vmap
    def f(p0, p1, counts, flow):
        return _fused_update(p0, p1, counts, flow, hw, hpwp, bres, th,
                             stream_table, sw, shift)
    return f


def fused_update_prepped(prep, flow, bres: int = 2,
                         stream_table: bool = False,
                         shift: str = "roll") -> jax.Array:
    """First matrix update of a level from the upsampled flow:
    -> (5, Hp, Wp) normal-equation channels (padded layout; the iteration
    and final-solve kernels consume it as-is).

    vmap over streams lowers to a sequential per-stream loop
    (sequential_vmap): Pallas ANY-space operands cannot be batch-blocked,
    and one 1080p stream already saturates the chip, so per-stream
    sequencing is both required and optimal."""
    f = _update_seq(tuple(prep["hw"]), tuple(prep["hpwp"]), bres,
                    prep["th"], stream_table, prep.get("sw"), shift)
    return f(prep["p0"], prep["p1"], prep["counts"], flow)


@functools.partial(jax.jit, static_argnames=("winsize", "gaussian", "bres",
                                             "th", "hw", "hpwp",
                                             "stream_table", "sw",
                                             "shift"))
def _fused_iter(p0, p1, counts, m, hw, hpwp, winsize, gaussian, bres, th,
                stream_table=False, sw=None, shift="roll"):
    h, w = hw
    hp, wp = hpwp
    sw = sw or _subcol_width(wp)
    sh = th + 2 * HALO_Y
    taps = _blur_taps(winsize, gaussian)
    half = winsize // 2
    assert half <= MHALO_Y, "blur reach exceeds the M window halo"
    wh = min(th + 2 * MHALO_Y, hp)
    ty_n = hp // th
    by_all = jnp.asarray(_yblur_bands(ty_n, th, wh, hp, h, taps))
    a_big = jnp.asarray(_xblur_blocks(taps))
    kern = functools.partial(_iter_kernel, bres, th, sw, wh, hp, h, w,
                             stream_table, shift)
    scratch = [
        pltpu.VMEM((2, 5, wh, wp), m.dtype),
        pltpu.VMEM((2, 5, th, wp), p0.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if stream_table:
        scratch += [pltpu.VMEM((5, 2 * sh, wp + 2 * HALO_X), p1.dtype),
                    pltpu.SemaphoreType.DMA((2,))]
    out = pl.pallas_call(
        kern,
        grid=(ty_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # counts
            pl.BlockSpec((1, th, wh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),               # y bands
            pl.BlockSpec(memory_space=pltpu.VMEM),               # x blocks
            # Frame-0 tiles DMA'd from HBM; frame-1's warp table resident
            # when it fits, else streamed per tile.
            pl.BlockSpec(memory_space=pl.ANY),                # p0
            pl.BlockSpec(memory_space=pl.ANY if stream_table
                         else pltpu.VMEM),                       # p1
            pl.BlockSpec(memory_space=pl.ANY),                # M
        ],
        out_specs=pl.BlockSpec((5, th, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, hp, wp), M_DTYPE),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(counts, by_all, a_big, p0, p1, m)
    return out


@functools.lru_cache(maxsize=64)
def _iter_seq(hw, hpwp, winsize, gaussian, bres, th, stream_table, sw,
              shift):
    @jax.custom_batching.sequential_vmap
    def f(p0, p1, counts, m):
        return _fused_iter(p0, p1, counts, m, hw, hpwp, winsize,
                           gaussian, bres, th, stream_table, sw, shift)
    return f


def fused_iter_prepped(prep, m, winsize: int, gaussian: bool,
                       bres: int = 2,
                       stream_table: bool = False,
                       shift: str = "roll") -> jax.Array:
    """One fused Farneback iteration: M -> updated M, flow stays in VMEM
    (the caller runs fused_final_solve after the last call). vmap lowers
    to a sequential per-stream loop (see fused_update_prepped)."""
    f = _iter_seq(tuple(prep["hw"]), tuple(prep["hpwp"]), winsize,
                  gaussian, bres, prep["th"], stream_table,
                  prep.get("sw"), shift)
    return f(prep["p0"], prep["p1"], prep["counts"], m)


@functools.partial(jax.jit, static_argnames=("winsize", "gaussian", "th",
                                             "hw"))
def _fused_final(m, hw, winsize, gaussian, th):
    h, w = hw
    _, hp, wp = m.shape
    taps = _blur_taps(winsize, gaussian)
    assert winsize // 2 <= MHALO_Y, "blur reach exceeds the M window halo"
    wh = min(th + 2 * MHALO_Y, hp)
    ty_n = hp // th
    by_all = jnp.asarray(_yblur_bands(ty_n, th, wh, hp, h, taps))
    a_big = jnp.asarray(_xblur_blocks(taps))
    kern = functools.partial(_final_kernel, th, wh, hp, h, w)
    out = pl.pallas_call(
        kern,
        grid=(ty_n,),
        in_specs=[
            pl.BlockSpec((1, th, wh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((2, th, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 5, wh, wp), m.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(by_all, a_big, m)
    return out[:, :h, :w]


# ---------------------------------------------------------------------------
# Whole-level mega-kernel: update + all iterations + final solve in ONE
# pallas_call, M ping-ponging between two VMEM halves (never touching HBM)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _ups_mats(hw, hpwp, th, src_true, src_pad, scale):
    """Host-built matrices for the IN-KERNEL level-to-level flow upsample
    (r4): the mega-kernel consumes the COARSE padded flow directly and
    computes each tile's init flow as two small f32 matmuls at it == 0,
    replacing the separate XLA upsample dispatch between levels (and its
    full-size fine-flow HBM round-trip: the kernel reads ~4x fewer init
    bytes). Bilinear resize is 2-tap per output per axis, so the matmul
    results are bit-identical to resize_bilinear_cf_padded (each output
    is a single fused-multiply pair per pass; no reassociation).

    Returns (uy, ux, ox_tuple, whu) or None when the geometry does not
    admit the uniform windows (non-2x level ratios, tiny levels) — the
    caller then falls back to the separate upsample:
      uy (ty_n, th, WHU): per-tile y bands over src rows
        [oy(i), oy(i)+WHU), oy(i) = clamp(i*th//2 - 8, 0, SPh - WHU)
        (the same formula the kernel's DMA uses), scale folded in;
      ux (nb, XWU, 128): per-128-col-block x bands over src cols
        [ox_b, ox_b+XWU), static ox_b per block.
    Zero rows/cols embed the padded canvas exactly like the XLA path."""
    from ripcurrents_tpu.ops.image import _linear_weights
    h, w = hw
    hp, wp = hpwp
    sht, swt = src_true
    sph, spw = src_pad
    ty_n, nb = hp // th, wp // 128
    # whu covers the window slack introduced by rounding oy down to a
    # multiple of 8 (Mosaic needs provably (8,128)-aligned DMA offsets).
    whu = -(-(th // 2 + 24) // 8) * 8
    xwu = 128
    if sph < whu or spw < xwu or th % 2 or (sph - whu) % 8:
        return None
    yidx, ywgt = _linear_weights(sht, h)
    xidx, xwgt = _linear_weights(swt, w)
    uy = np.zeros((ty_n, th, whu), np.float32)
    for i in range(ty_n):
        oy = min(max(i * (th // 2) - 8, 0) // 8 * 8, sph - whu)
        for d in range(th):
            gd = i * th + d
            if gd >= h:
                continue
            for k in range(yidx.shape[1]):
                s = int(yidx[gd, k]) - oy
                if not 0 <= s < whu:
                    return None
                uy[i, d, s] += float(ywgt[gd, k]) * scale
    ux = np.zeros((nb, xwu, 128), np.float32)
    oxs = []
    for b in range(nb):
        ox = min(max(b * 64 - 8, 0), spw - xwu)
        oxs.append(ox)
        for m in range(128):
            gc = b * 128 + m
            if gc >= w:
                continue
            for k in range(xidx.shape[1]):
                s = int(xidx[gc, k]) - ox
                if not 0 <= s < xwu:
                    return None
                ux[b, s, m] += float(xwgt[gc, k])
    return uy, ux, tuple(oxs), whu


@functools.lru_cache(maxsize=64)
def _prep_tile_mats(prep_args, n_prep):
    """Host-built per-tile matrices for the IN-KERNEL next-frame
    polynomial expansion (r4 prep fusion): the mega-kernel of pyramid
    level k additionally computes level k-1 of the NEXT frame's
    expansion table during its grid steps, hiding the prep matmuls (MXU)
    under the warp tap stream (VPU) — the lagged-stream schedule
    (farneback.farneback_stream_lagged).

    prep_args = the flow/farneback._level_prep_matrices argument tuple
    for the TARGET level with the halo'd table layout embedded
    (ph = table rows, pw = table cols, pad_off = (HALO_Y, HALO_X)).
    The dense composed matrices are sliced into:
      uy (n_prep, winy, 3*tl): per-prep-tile y weights over img rows
        [oy(j), oy(j)+winy) — table-row tile j covers table rows
        [r0(j), r0(j)+tl), r0(j) = min(j*tl, table_h - tl) (the last
        tile clamps to the table end; overlapping rows are written
        twice with identical values);
      ux (nb, srcw, 384): per-128-col-block fused x3 weights over img
        cols [ox(b), ox(b)+srcw), ox(b) static.
    Window sizes and offsets come from the dense matrices' actual
    support (static tuples; the prep tiles are fully unrolled in the
    kernel). Returns (uy, ux, oys, oxs, tl, ig) or None when the
    support exceeds the image (degenerate levels — caller falls back).
    Slicing the SAME dense matrices the XLA path multiplies keeps the
    in-kernel results bit-equal (identical f32-accumulated contractions
    padded with zero terms)."""
    from ripcurrents_tpu.flow.farneback import (_level_prep_matrices,
                                                _poly_exp_consts,
                                                _y_section_stride)
    h, w = prep_args[0], prep_args[1]
    n, sigma = prep_args[4], prep_args[5]
    table_h, table_w = prep_args[8], prep_args[9]
    by3, bx_g, bx_xg, bx_xxg = _level_prep_matrices(*prep_args)
    ph_s = _y_section_stride(table_h)
    _, _, _, ig11, ig03, ig33, ig55 = _poly_exp_consts(n, sigma)
    tl = -(-table_h // n_prep // 8) * 8
    nb = table_w // 128

    def support(mat, c0, c1):
        rows = np.nonzero(mat[:, c0:c1].any(axis=1))[0]
        return (int(rows[0]), int(rows[-1]) + 1) if rows.size else (0, 1)

    y_spans = []
    for j in range(n_prep):
        r0 = min(j * tl, table_h - tl)
        los, his = zip(*[support(by3, s * ph_s + r0, s * ph_s + r0 + tl)
                         for s in range(3)])
        y_spans.append((min(los), max(his)))
    winy = -(-(max(hi - (lo // 8 * 8) for lo, hi in y_spans)) // 8) * 8
    x_spans = [tuple(zip(*[support(bx, b * 128, (b + 1) * 128)
                           for bx in (bx_g, bx_xg, bx_xxg)]))
               for b in range(nb)]
    x_spans = [(min(los), max(his)) for los, his in x_spans]
    srcw = -(-(max(hi - (lo // 8 * 8) for lo, hi in x_spans)) // 8) * 8
    if winy > h or srcw > w:
        return None
    # uy stored pre-transposed (3*tl, winy) and pre-cast to the bf16
    # matmul dtype — exactly the casts the XLA blocked path applies to
    # its weight slices.
    uy = np.zeros((n_prep, 3 * tl, winy), np.float32)
    oys = []
    for j, (lo, hi) in enumerate(y_spans):
        r0 = min(j * tl, table_h - tl)
        oy = min(lo // 8 * 8, h - winy)
        oys.append(oy)
        for s in range(3):
            uy[j, s * tl:(s + 1) * tl, :] = \
                by3[oy:oy + winy, s * ph_s + r0:s * ph_s + r0 + tl].T
    ux = np.zeros((nb, srcw, 3 * 128), np.float32)
    oxs = []
    for b, (lo, hi) in enumerate(x_spans):
        ox = min(lo // 8 * 8, w - srcw)
        oxs.append(ox)
        for s, bx in enumerate((bx_g, bx_xg, bx_xxg)):
            ux[b, :, s * 128:(s + 1) * 128] = \
                bx[ox:ox + srcw, b * 128:(b + 1) * 128]
    return (uy, ux, tuple(oys), tuple(oxs), tl,
            (ig11, ig03, ig33, ig55))


def _prep_sched(n_steps, n_prep):
    """Static grid-step schedule spreading n_prep prep tiles evenly over
    the host kernel's n_steps grid steps (step s_j computes prep tile
    j; s_j >= 1 so tile j's img DMA, started at step s_{j-1} or 0, has
    a step of latency). Requires n_steps > n_prep."""
    return tuple(((j + 1) * (n_steps - 1)) // n_prep
                 for j in range(n_prep))


def _img_win_dma(img_hbm, oy, winy, scr, sem, slot):
    """Async copy of the next frame's img row window for one prep tile."""
    return pltpu.make_async_copy(
        img_hbm.at[pl.ds(oy, winy), :], scr.at[slot], sem.at[slot])


def _prep_tile_compute(iwin, uy_j, ux_ref, oxs, tl, ig, srcw, out_dtype):
    """One prep tile: y matmul (3tl, WINY)@(WINY, W) then per-col-block
    fused x3 matmuls + the coefficient combine — the exact in-kernel
    image of poly_exp_level's blocked path. Returns (5, tl, table_w)."""
    ig11, ig03, ig33, ig55 = ig
    t = jnp.dot(uy_j, iwin,
                preferred_element_type=jnp.float32).astype(iwin.dtype)
    cols = []
    for b, ox in enumerate(oxs):
        big = jnp.dot(
            jax.lax.slice(t, (0, ox), (t.shape[0], ox + srcw)),
            ux_ref[b], preferred_element_type=jnp.float32)
        tg = big[:, :128]
        b1, b3, b5 = tg[:tl], tg[tl:2 * tl], tg[2 * tl:]
        b2 = big[:tl, 128:256]
        b6 = big[tl:2 * tl, 128:256]
        b4 = big[:tl, 256:]
        cols.append(jnp.stack(
            [b2 * ig11, b3 * ig11,
             b1 * ig03 + b4 * ig33,
             b1 * ig03 + b5 * ig33,
             b6 * ig55], axis=0).astype(out_dtype))
    return jnp.concatenate(cols, axis=2) if len(cols) > 1 else cols[0]


def _prep_phase(g, n_steps, prep_next, img_hbm, uy_ref, ux_ref,
                prep_out, img_scr, stage_scr, img_sem, out_sem):
    """The in-kernel next-frame prep phase, statically unrolled per prep
    tile over the host kernel's grid (see _prep_tile_mats): at scheduled
    step s_j, wait tile j's img window DMA, prefetch tile j+1's, run the
    prep matmuls, and async-copy the staged table rows to the HBM
    output. All offsets are static."""
    oys, oxs, tl, ig, srcw, winy, sched, table_h = prep_next
    n_prep = len(oys)

    def out_cp(j):
        r0 = min(j * tl, table_h - tl)
        return pltpu.make_async_copy(
            stage_scr.at[j % 2], prep_out.at[:, pl.ds(r0, tl), :],
            out_sem.at[j % 2])

    @pl.when(g == 0)
    def _():
        _img_win_dma(img_hbm, oys[0], winy, img_scr, img_sem, 0).start()

    for j, gs in enumerate(sched):
        @pl.when(g == gs)
        def _(j=j):
            _img_win_dma(img_hbm, oys[j], winy, img_scr, img_sem,
                         j % 2).wait()
            if j + 1 < n_prep:
                _img_win_dma(img_hbm, oys[j + 1], winy, img_scr,
                             img_sem, (j + 1) % 2).start()
            if j >= 2:
                out_cp(j - 2).wait()   # free the stage slot for reuse
            stage_scr[j % 2] = _prep_tile_compute(
                img_scr[j % 2], uy_ref[j], ux_ref, oxs, tl, ig, srcw,
                stage_scr.dtype)
            out_cp(j).start()

    @pl.when(g == n_steps - 1)
    def _():
        for j in range(max(0, n_prep - 2), n_prep):
            out_cp(j).wait()


def _coarse_dma(c_hbm, tile, th, whu, scr, sem, slot):
    """Async copy of the coarse-flow row window tile i's upsample matmul
    reads (rows [oy(i), oy(i)+WHU) of the (2, SPh, SPw) padded coarse
    flow) into the double buffer. oy matches _ups_mats' formula."""
    sph = c_hbm.shape[1]
    # The offset's LAST op must be `8 * k` so Mosaic can prove sublane
    # alignment (a trailing min/max defeats the divisibility analysis);
    # (sph - whu) % 8 == 0 is gated in _ups_mats, so clamping the
    # quotient is identical to clamping the offset. Matches the
    # builder's oy formula in _ups_mats exactly.
    oy = 8 * jnp.clip((tile * (th // 2) - 8) // 8, 0, (sph - whu) // 8)
    return pltpu.make_async_copy(
        c_hbm.at[:, pl.ds(oy, whu), :], scr.at[slot], sem.at[slot])


def _ups_tile(cwin, uy_i, ux_ref, oxs, th):
    """Tile init flow from the DMA'd coarse window: per channel one
    (th, WHU) @ (WHU, SPw) y matmul then per-128-block (th, XWU) @
    (XWU, 128) x matmuls — ~0.03 ms of f32 MXU work per 1080p frame,
    hidden in the it == 0 steps."""
    xwu = ux_ref.shape[1]
    outs = []
    for c in range(2):
        t = jnp.dot(uy_i, cwin[c], preferred_element_type=jnp.float32)
        blocks = [
            jnp.dot(jax.lax.slice(t, (0, ox), (th, ox + xwu)),
                    ux_ref[b], preferred_element_type=jnp.float32)
            for b, ox in enumerate(oxs)]
        outs.append(jnp.concatenate(blocks, axis=1)
                    if len(blocks) > 1 else blocks[0])
    return outs[0], outs[1]


def _p1_win_dma(p1_hbm, tile, th, sh, scr, sem, slot):
    """Async copy of the halo'd warp-table row window for one tile
    (rows [tile*th, tile*th+SH) of the (5, Hp+2*HALO_Y, Wp+2*HALO_X)
    table) into the row-stacked double buffer."""
    return pltpu.make_async_copy(
        p1_hbm.at[:, pl.ds(tile * th, sh), :],
        scr.at[:, pl.ds(slot * sh, sh), :], sem.at[slot])


def _dxy0_dma(f0_hbm, tile, th, scr, sem, slot):
    """Async copy of the init flow's (2, th, Wp) tile out of its padded
    (2, Hp, Wp) f32 HBM array (only consumed during the it==0 steps —
    BlockSpec delivery would re-fetch it every iteration)."""
    return pltpu.make_async_copy(
        f0_hbm.at[:, pl.ds(tile * th, th), :], scr.at[slot], sem.at[slot])


def _level_kernel(bres, th, sw, wh, hp, h_true, w_true, iterations,
                  resident, shift, ups, prep_next, counts_ref, by_ref,
                  abig_ref, *rest):
    """One grid step = (iteration `it`, row tile `i`).

    it == 0:            warp from the upsampled init flow + matrix update
    0 < it < iterations: window-blur prev M + solve + warp + update
    it == iterations:   window-blur + solve -> flow out

    M lives in the row-stacked VMEM scratch (5, 2*Hp, Wp) bf16: iteration
    `it` writes half `it % 2` and blurs half `(it-1) % 2` — the normal
    equations never travel to HBM between iterations (the 3-kernel path
    round-trips ~2*|M| per iteration). p0/p1 tile windows are
    double-buffer DMA'd from HBM one grid step ahead.

    ups != None ((ox_tuple, whu) — the fused level-to-level upsample):
    f0 is the COARSE padded flow; each tile's init flow is computed at
    it == 0 by the _ups_tile matmuls from a DMA'd coarse row window
    instead of being read pre-upsampled from HBM.

    prep_next != None: this kernel ALSO computes one level of the NEXT
    frame's polynomial-expansion table during its grid steps
    (_prep_phase — the lagged-stream prep fusion)."""
    rest = list(rest)
    uy_ref = ux_ref = None
    if ups is not None:
        uy_ref, ux_ref = rest.pop(0), rest.pop(0)
        oxs, whu = ups
    f0_hbm, p0_hbm, p1_ref = rest.pop(0), rest.pop(0), rest.pop(0)
    if prep_next is not None:
        img_hbm, puy_ref, pux_ref = (rest.pop(0), rest.pop(0),
                                     rest.pop(0))
    out_ref = rest.pop(0)
    if prep_next is not None:
        prep_out = rest.pop(0)
    m_pp, dxy_scr, dxy0_scr, p0_scr = (rest.pop(0), rest.pop(0),
                                       rest.pop(0), rest.pop(0))
    dxy0_sem, p0_sem = rest.pop(0), rest.pop(0)
    p1_bufs = ()
    if not resident:
        p1_bufs = (rest.pop(0), rest.pop(0))
    if prep_next is not None:
        img_scr, stage_scr, img_sem, out_sem = (rest.pop(0), rest.pop(0),
                                                rest.pop(0), rest.pop(0))
    it = pl.program_id(0)
    i = pl.program_id(1)
    ty_n = pl.num_programs(1)
    n_steps = pl.num_programs(0) * ty_n
    wp = out_ref.shape[2]
    sh = th + 2 * HALO_Y
    g = it * ty_n + i
    slot = jax.lax.rem(g, 2)

    def init_dma(tile, bslot):
        if ups is None:
            return _dxy0_dma(f0_hbm, tile, th, dxy0_scr, dxy0_sem, bslot)
        return _coarse_dma(f0_hbm, tile, th, whu, dxy0_scr, dxy0_sem,
                           bslot)

    @pl.when(g == 0)
    def _():
        _r0_dma(p0_hbm, 0, th, wp, p0_scr, p0_sem, 0).start()
        init_dma(0, 0).start()
        if not resident:
            _p1_win_dma(p1_ref, 0, th, sh, *p1_bufs, 0).start()

    @pl.when(g + 1 < n_steps)
    def _():
        ns = jax.lax.rem(g + 1, 2)
        nxt = jax.lax.rem(i + 1, ty_n)   # wraps to tile 0 across iterations
        _r0_dma(p0_hbm, nxt, th, wp, p0_scr, p0_sem, ns).start()
        if not resident:
            _p1_win_dma(p1_ref, nxt, th, sh, *p1_bufs, ns).start()

    @pl.when((it == 0) & (i + 1 < ty_n))
    def _():
        init_dma(i + 1, jax.lax.rem(i + 1, 2)).start()

    @pl.when(it == 0)
    def _():
        init_dma(i, jax.lax.rem(i, 2)).wait()
        if ups is None:
            dxy_scr[0] = dxy0_scr[jax.lax.rem(i, 2), 0]
            dxy_scr[1] = dxy0_scr[jax.lax.rem(i, 2), 1]
        else:
            dx0, dy0 = _ups_tile(dxy0_scr[jax.lax.rem(i, 2)], uy_ref[0],
                                 ux_ref, oxs, th)
            dxy_scr[0] = dx0
            dxy_scr[1] = dy0

    @pl.when(it > 0)
    def _():
        oy = _m_window(i, th, wh, hp)
        prow = jax.lax.rem(it + 1, 2) * hp   # (it-1) % 2 half
        mwin = m_pp[:, pl.ds(prow + oy, wh), :]
        mb = _yblur_window(mwin, by_ref[0])
        mb = _xblur_rows(mb, w_true, abig_ref[:])
        dx, dy = _solve(mb)
        # Zero alignment pads so subcolumn base means stay unbiased (the
        # final-solve pads are discarded by the host-side crop).
        ys = (jax.lax.broadcasted_iota(jnp.int32, (dx.shape[0], 1), 0)
              + i * th)
        xs = jax.lax.broadcasted_iota(jnp.int32, (1, dx.shape[1]), 1)
        valid = (ys < h_true) & (xs < w_true)
        dxy_scr[0] = jnp.where(valid, dx, 0.0)
        dxy_scr[1] = jnp.where(valid, dy, 0.0)

    _r0_dma(p0_hbm, i, th, wp, p0_scr, p0_sem, slot).wait()
    if not resident:
        _p1_win_dma(p1_ref, i, th, sh, *p1_bufs, slot).wait()

    dx = dxy_scr[0]
    dy = dxy_scr[1]

    @pl.when(it < iterations)
    def _():
        if resident:
            r1s = _warp_subcols(p1_ref, i, dx, dy, counts_ref, bres,
                                sw, th, shift)
        else:
            r1s = _warp_win(p1_bufs[0], slot, i, dx, dy, counts_ref,
                            bres, sw, th, shift)
        r0 = p0_scr[slot].astype(jnp.float32)
        vals = _update_tail_vals(r0, r1s, dx, dy, i, th, h_true, w_true)
        wrow = jax.lax.rem(it, 2) * hp
        for c in range(5):
            m_pp[c, pl.ds(wrow + i * th, th), :] = vals[c].astype(M_DTYPE)

    @pl.when(it == iterations)
    def _():
        out_ref[:, pl.ds(i * th, th), :] = jnp.stack([dx, dy], axis=0)

    if prep_next is not None:
        _prep_phase(g, n_steps, prep_next, img_hbm, puy_ref, pux_ref,
                    prep_out, img_scr, stage_scr, img_sem, out_sem)


def _level_kernel_pipe(bres, th, sw, wh, hp, h_true, w_true, iterations,
                       shift, counts_ref, by_ref, abig_ref,
                       f0_hbm, p0_hbm, p1_ref, out_ref,
                       m_pp, dxy_pp, p0_scr, dxy0_sem, p0_sem):
    """Software-pipelined whole-level kernel (resident warp table only).

    The plain _level_kernel's step body is a serial dependency chain
    blur(MXU) -> solve -> warp(VPU) -> update, so the MXU idles during the
    warp taps and the VPU idles during the blur matmuls. Here each grid
    step runs the blur+solve of tile i and the warp+update of the
    PREVIOUS tile (lagged one step) — two data-independent chains the
    scheduler can interleave across units.

    Step (it, i), g = it*ty_n + i:
      solve (it >= 1):  window-blur M half (it-1)%2 rows of tile i,
        2x2-solve -> dxy_pp[g % 2] (consumed by the NEXT step's warp).
      warp:
        it == 0:  tile i from the init flow, DMA'd into dxy_pp[(g+1) % 2]
          (the solve never touches that slot during it == 0).
        g > ty_n: the lagged tile (i-1; ty_n-1 of it-1 when i == 0),
          consuming dxy_pp[(g+1) % 2] = the previous step's solve.
      out (it == iterations): tile i's solved flow (same step).
    Step g == ty_n (= (1, 0)) is the pipeline-fill bubble: solve only —
    tile ty_n-1 of it 0 was already warped unlagged during it == 0.

    Requires ty_n >= 3: the lagged update of (it-1, ty_n-1) at step
    (it, 0) writes the SAME M half the step's blur reads; its rows
    [(ty_n-1)*th, hp) must not intersect the blur window [0, th+2*MHALO_Y).
    """
    it = pl.program_id(0)
    i = pl.program_id(1)
    ty_n = pl.num_programs(1)
    n_steps = pl.num_programs(0) * ty_n
    wp = f0_hbm.shape[2]
    g = it * ty_n + i

    lag_i = jax.lax.rem(i + ty_n - 1, ty_n)
    warp_tile = jnp.where(it == 0, i, lag_i)
    warp_it = jnp.where((i == 0) & (it > 0), it - 1, it)
    do_warp = (it == 0) | ((g > ty_n) & (g <= iterations * ty_n))

    @pl.when(g == 0)
    def _():
        _r0_dma(p0_hbm, 0, th, wp, p0_scr, p0_sem, 0).start()
        _dxy0_dma(f0_hbm, 0, th, dxy_pp, dxy0_sem, 1).start()

    # Prefetch for the NEXT step g+1 (skipping the bubble and the
    # warp-less final-iteration steps): p0 tile into slot (g+1) % 2 and,
    # during it == 0, the init-flow tile into dxy_pp slot (g+2) % 2.
    nt = g + 1

    @pl.when((nt < n_steps) & (nt != ty_n) & (nt <= iterations * ty_n))
    def _():
        tile = jnp.where(nt < ty_n, nt, jax.lax.rem(nt - 1, ty_n))
        _r0_dma(p0_hbm, tile, th, wp, p0_scr, p0_sem,
                jax.lax.rem(nt, 2)).start()

    @pl.when((it == 0) & (i + 1 < ty_n))
    def _():
        _dxy0_dma(f0_hbm, i + 1, th, dxy_pp, dxy0_sem,
                  jax.lax.rem(g, 2)).start()

    @pl.when(it == 0)
    def _():
        _dxy0_dma(f0_hbm, i, th, dxy_pp, dxy0_sem,
                  jax.lax.rem(g + 1, 2)).wait()

    # ---- warp + matrix update of the lagged tile (VPU-dominated) and
    # ---- blur + solve of tile i (MXU-dominated): independent chains.
    @pl.when(do_warp)
    def _():
        _r0_dma(p0_hbm, warp_tile, th, wp, p0_scr, p0_sem,
                jax.lax.rem(g, 2)).wait()
        ws = jax.lax.rem(g + 1, 2)
        dxl = dxy_pp[ws, 0]
        dyl = dxy_pp[ws, 1]
        r1s = _warp_subcols(p1_ref, warp_tile, dxl, dyl, counts_ref,
                            bres, sw, th, shift)
        r0 = p0_scr[jax.lax.rem(g, 2)].astype(jnp.float32)
        vals = _update_tail_vals(r0, r1s, dxl, dyl, warp_tile, th,
                                 h_true, w_true)
        wrow = jax.lax.rem(warp_it, 2) * hp
        for c in range(5):
            m_pp[c, pl.ds(wrow + warp_tile * th, th), :] = \
                vals[c].astype(M_DTYPE)

    @pl.when(it > 0)
    def _():
        oy = _m_window(i, th, wh, hp)
        prow = jax.lax.rem(it + 1, 2) * hp   # (it-1) % 2 half
        mwin = m_pp[:, pl.ds(prow + oy, wh), :]
        mb = _yblur_window(mwin, by_ref[0])
        mb = _xblur_rows(mb, w_true, abig_ref[:])
        dx, dy = _solve(mb)
        ys = (jax.lax.broadcasted_iota(jnp.int32, (dx.shape[0], 1), 0)
              + i * th)
        xs = jax.lax.broadcasted_iota(jnp.int32, (1, dx.shape[1]), 1)
        valid = (ys < h_true) & (xs < w_true)
        sl = jax.lax.rem(g, 2)
        dxy_pp[sl, 0] = jnp.where(valid, dx, 0.0)
        dxy_pp[sl, 1] = jnp.where(valid, dy, 0.0)

    @pl.when(it == iterations)
    def _():
        out_ref[:, pl.ds(i * th, th), :] = dxy_pp[jax.lax.rem(g, 2)]


def _level_kernel_pipe2(bres, th, sw, wh, hp, h_true, w_true, iterations,
                        shift, ups, prep_next, counts_ref, by_ref,
                        abig_ref, *rest):
    """_level_kernel_pipe with the M ping-pong split into TWO statically
    distinct VMEM refs (m_a = even iterations' matrices, m_b = odd).

    The single-ref pipe kernel selects halves by traced row offsets;
    Mosaic cannot prove the lagged warp's writes and the blur's reads
    disjoint through dynamic slices on the SAME ref, so it may serialize
    the two chains the schedule was built to overlap. Here the parity
    choice is a predicated branch over separate refs: on every step with
    i >= 1 the warp writes buf(it % 2) while the blur reads
    buf((it-1) % 2) — provably independent. At i == 0 the lagged warp
    targets buf((it-1) % 2) (warp_it = it - 1), the same ref the blur
    reads; ty_n >= 3 keeps the row regions disjoint, but the shared ref
    may serialize that one step per iteration (pipeline re-fill).
    Numerics are identical to _level_kernel and _level_kernel_pipe
    (tests/test_fused_update.py).

    ups != None: fused level-to-level upsample — f0 is the COARSE
    padded flow; the it == 0 init flow is computed per tile by the
    _ups_tile matmuls (MXU) right before that tile's unlagged warp
    (VPU), from a double-buffer DMA'd coarse row window.

    prep_next != None: this kernel ALSO computes one level of the NEXT
    frame's polynomial-expansion table during its grid steps
    (_prep_phase — the lagged-stream prep fusion)."""
    rest = list(rest)
    uy_ref = ux_ref = c_scr = None
    if ups is not None:
        uy_ref, ux_ref = rest.pop(0), rest.pop(0)
        oxs, whu = ups
    f0_hbm, p0_hbm, p1_ref = rest.pop(0), rest.pop(0), rest.pop(0)
    if prep_next is not None:
        img_hbm, puy_ref, pux_ref = (rest.pop(0), rest.pop(0),
                                     rest.pop(0))
    out_ref = rest.pop(0)
    if prep_next is not None:
        prep_out = rest.pop(0)
    m_a, m_b, dxy_pp = rest.pop(0), rest.pop(0), rest.pop(0)
    if ups is not None:
        c_scr = rest.pop(0)
    p0_scr, dxy0_sem, p0_sem = rest.pop(0), rest.pop(0), rest.pop(0)
    if prep_next is not None:
        img_scr, stage_scr, img_sem, out_sem = (rest.pop(0), rest.pop(0),
                                                rest.pop(0), rest.pop(0))
    it = pl.program_id(0)
    i = pl.program_id(1)
    ty_n = pl.num_programs(1)
    n_steps = pl.num_programs(0) * ty_n
    wp = out_ref.shape[2]
    g = it * ty_n + i

    lag_i = jax.lax.rem(i + ty_n - 1, ty_n)
    warp_tile = jnp.where(it == 0, i, lag_i)
    warp_it = jnp.where((i == 0) & (it > 0), it - 1, it)
    do_warp = (it == 0) | ((g > ty_n) & (g <= iterations * ty_n))

    @pl.when(g == 0)
    def _():
        _r0_dma(p0_hbm, 0, th, wp, p0_scr, p0_sem, 0).start()
        if ups is None:
            _dxy0_dma(f0_hbm, 0, th, dxy_pp, dxy0_sem, 1).start()
        else:
            _coarse_dma(f0_hbm, 0, th, whu, c_scr, dxy0_sem, 0).start()

    nt = g + 1

    @pl.when((nt < n_steps) & (nt != ty_n) & (nt <= iterations * ty_n))
    def _():
        tile = jnp.where(nt < ty_n, nt, jax.lax.rem(nt - 1, ty_n))
        _r0_dma(p0_hbm, tile, th, wp, p0_scr, p0_sem,
                jax.lax.rem(nt, 2)).start()

    @pl.when((it == 0) & (i + 1 < ty_n))
    def _():
        if ups is None:
            _dxy0_dma(f0_hbm, i + 1, th, dxy_pp, dxy0_sem,
                      jax.lax.rem(g, 2)).start()
        else:
            _coarse_dma(f0_hbm, i + 1, th, whu, c_scr, dxy0_sem,
                        jax.lax.rem(i + 1, 2)).start()

    @pl.when(it == 0)
    def _():
        if ups is None:
            _dxy0_dma(f0_hbm, i, th, dxy_pp, dxy0_sem,
                      jax.lax.rem(g + 1, 2)).wait()
        else:
            _coarse_dma(f0_hbm, i, th, whu, c_scr, dxy0_sem,
                        jax.lax.rem(i, 2)).wait()
            dx0, dy0 = _ups_tile(c_scr[jax.lax.rem(i, 2)], uy_ref[0],
                                 ux_ref, oxs, th)
            ws = jax.lax.rem(g + 1, 2)
            dxy_pp[ws, 0] = dx0
            dxy_pp[ws, 1] = dy0

    @pl.when(do_warp)
    def _():
        _r0_dma(p0_hbm, warp_tile, th, wp, p0_scr, p0_sem,
                jax.lax.rem(g, 2)).wait()
        ws = jax.lax.rem(g + 1, 2)
        dxl = dxy_pp[ws, 0]
        dyl = dxy_pp[ws, 1]
        r1s = _warp_subcols(p1_ref, warp_tile, dxl, dyl, counts_ref,
                            bres, sw, th, shift)
        r0 = p0_scr[jax.lax.rem(g, 2)].astype(jnp.float32)
        vals = _update_tail_vals(r0, r1s, dxl, dyl, warp_tile, th,
                                 h_true, w_true)
        even = jax.lax.rem(warp_it, 2) == 0

        @pl.when(even)
        def _():
            for c in range(5):
                m_a[c, pl.ds(warp_tile * th, th), :] = \
                    vals[c].astype(M_DTYPE)

        @pl.when(jnp.logical_not(even))
        def _():
            for c in range(5):
                m_b[c, pl.ds(warp_tile * th, th), :] = \
                    vals[c].astype(M_DTYPE)

    @pl.when(it > 0)
    def _():
        oy = _m_window(i, th, wh, hp)

        def blur_from(buf):
            mwin = buf[:, pl.ds(oy, wh), :]
            mb = _yblur_window(mwin, by_ref[0])
            mb = _xblur_rows(mb, w_true, abig_ref[:])
            dx, dy = _solve(mb)
            ys = (jax.lax.broadcasted_iota(jnp.int32, (dx.shape[0], 1), 0)
                  + i * th)
            xs = jax.lax.broadcasted_iota(jnp.int32, (1, dx.shape[1]), 1)
            valid = (ys < h_true) & (xs < w_true)
            sl = jax.lax.rem(g, 2)
            dxy_pp[sl, 0] = jnp.where(valid, dx, 0.0)
            dxy_pp[sl, 1] = jnp.where(valid, dy, 0.0)

        prev_even = jax.lax.rem(it - 1, 2) == 0

        @pl.when(prev_even)
        def _():
            blur_from(m_a)

        @pl.when(jnp.logical_not(prev_even))
        def _():
            blur_from(m_b)

    @pl.when(it == iterations)
    def _():
        out_ref[:, pl.ds(i * th, th), :] = dxy_pp[jax.lax.rem(g, 2)]

    if prep_next is not None:
        _prep_phase(g, n_steps, prep_next, img_hbm, puy_ref, pux_ref,
                    prep_out, img_scr, stage_scr, img_sem, out_sem)


def level_vmem_bytes(hp: int, wp: int, th: int) -> int:
    """Scratch footprint of the mega-kernel (M ping-pong + DMA buffers)."""
    sh = th + 2 * HALO_Y
    wpx = wp + 2 * HALO_X
    bf16 = 2
    return (bf16 * (5 * 2 * hp * wp      # M ping-pong halves
                    + 2 * 5 * th * wp    # p0 double buffer
                    + 5 * 2 * sh * wpx)  # p1 double buffer
            + 4 * 2 * hp * wp            # resident f32 flow output
            + 4 * 2 * 2 * th * wp)       # init-flow double buffer


def level_vmem_bytes_resident(hp: int, wp: int, th: int) -> int:
    """Mega-kernel footprint with the WHOLE bf16 warp table VMEM-resident
    across grid steps (no p1 window double buffer): the table is DMA'd
    from HBM once per level instead of once per (iteration x tile) —
    ~6x less p1 traffic at 1080p lvl0 (145 MB -> 25 MB)."""
    wpx = wp + 2 * HALO_X
    bf16 = 2
    return (bf16 * (5 * 2 * hp * wp             # M ping-pong halves
                    + 2 * 5 * th * wp           # p0 double buffer
                    + 5 * (hp + 2 * HALO_Y) * wpx)  # resident warp table
            + 4 * 2 * hp * wp                   # resident f32 flow output
            + 4 * 2 * 2 * th * wp)              # init-flow double buffer


def chain_vmem_bytes(hp: int, wp: int, th: int,
                     stream_table: bool) -> int:
    """Peak resident+scratch bytes of the 3-kernel chain (the iter kernel
    dominates): the warp table (resident) or its double-buffered row
    windows (streamed), the M row-window buffers, the p0 buffers, the
    output tile and the f32 flow tiles."""
    sh = th + 2 * HALO_Y
    wpx = wp + 2 * HALO_X
    wh = min(th + 2 * MHALO_Y, hp)
    bf16 = 2
    table = (bf16 * 5 * 2 * sh * wpx if stream_table
             else bf16 * 5 * (hp + 2 * HALO_Y) * wpx)
    return (table
            + bf16 * 2 * 5 * wh * wp    # M window double buffer
            + bf16 * 2 * 5 * th * wp    # p0 double buffer
            + bf16 * 5 * th * wp        # out tile
            + 4 * 2 * th * wp)          # f32 dx/dy tiles


# Leave ~45 MB of VMEM for blur/warp temporaries, pipeline buffers and
# block inputs (measured at 1080p on v5e; warp colvars dominate).
_VMEM_HEADROOM = 46 * 1024 * 1024


def level_vmem_budget() -> int:
    """Mega-kernel scratch budget on the attached chip."""
    return max(device_vmem_bytes() - _VMEM_HEADROOM, 0)


# The resident-table mega-kernel needs less headroom than the streamed
# one (no p1 double-buffer churn); 40 MB covers the warp/blur temporaries
# at 1080p on v5e (measured: the 1080p level compiles at 87.4 MB of
# accounted scratch under the 127 MB limit).
_VMEM_HEADROOM_RESIDENT = 40 * 1024 * 1024


def level_vmem_budget_resident() -> int:
    """Resident-table mega-kernel budget on the attached chip."""
    return max(device_vmem_bytes() - _VMEM_HEADROOM_RESIDENT, 0)


# The 3-kernel chain shares the mega-kernel's headroom model; on
# small-VMEM generations (v2-v4) the budget is <= 0, so every layout is
# rejected and the engine stays on the XLA tiled warp (ADVICE r1 #5).
chain_vmem_budget = level_vmem_budget


@functools.partial(jax.jit, static_argnames=("winsize", "gaussian", "bres",
                                             "th", "hw", "hpwp",
                                             "iterations", "padded_io",
                                             "resident_table", "pipe",
                                             "sw", "shift", "ups_src",
                                             "prep_spec"))
def _fused_level(p0, p1, counts, flow, hw, hpwp, winsize, gaussian, bres,
                 th, iterations, padded_io=False, resident_table=False,
                 pipe=False, sw=None, shift="roll", ups_src=None,
                 prep_img=None, prep_spec=None):
    h, w = hw
    hp, wp = hpwp
    sw = sw or _subcol_width(wp)
    taps = _blur_taps(winsize, gaussian)
    half = winsize // 2
    assert half <= MHALO_Y, "blur reach exceeds the M window halo"
    wh = min(th + 2 * MHALO_Y, hp)
    ty_n = hp // th
    sh = th + 2 * HALO_Y
    wpx = wp + 2 * HALO_X
    if pipe:
        assert resident_table and ty_n >= 3 and iterations >= 1, \
            "pipe requires a resident table and >= 3 row tiles"
    by_all = jnp.asarray(_yblur_bands(ty_n, th, wh, hp, h, taps))
    a_big = jnp.asarray(_xblur_blocks(taps))
    ups = uy = ux = None
    if ups_src is not None:
        # Fused upsample: `flow` is the COARSE padded flow; the init
        # flow is computed in-kernel (see _ups_mats). pipe==1 keeps the
        # old path (its kernel was not extended).
        assert padded_io and pipe != 1
        src_true, src_pad, scale = ups_src
        mats = _ups_mats(hw, hpwp, th, src_true, src_pad, scale)
        assert mats is not None, "ups geometry unsupported (gate earlier)"
        uy_np, ux_np, oxs, whu = mats
        uy, ux = jnp.asarray(uy_np), jnp.asarray(ux_np)
        ups = (oxs, whu)
        f0 = flow                         # (2, SPh, SPw) coarse flow
        spw = src_pad[1]
    if ups_src is None:
        if padded_io:
            # flow arrives already in the padded (2, Hp, Wp) kernel
            # layout with ZERO alignment pads (the padded pyramid
            # upsample embeds the zeros in its resize matrices) —
            # required by the subcolumn base means, which divide by
            # real-pixel counts.
            f0 = flow
        else:
            f0 = jnp.pad(flow, ((0, 0), (0, hp - h), (0, wp - w)))
    prep_next = None
    if prep_spec is not None:
        # Next-frame prep fusion (lagged stream): this kernel also
        # emits one level of the NEXT frame's expansion table.
        assert pipe != 1 and prep_img is not None
        prep_args, n_prep = prep_spec
        pm = _prep_tile_mats(prep_args, n_prep)
        assert pm is not None, "prep geometry unsupported (gate earlier)"
        puy_np, pux_np, p_oys, p_oxs, p_tl, p_ig = pm
        n_steps_all = (iterations + 1) * ty_n
        p_sched = _prep_sched(n_steps_all, len(p_oys))
        p_winy, p_srcw = puy_np.shape[2], pux_np.shape[1]
        p_table_h, p_table_w = prep_args[8], prep_args[9]
        prep_next = (p_oys, p_oxs, p_tl, p_ig, p_srcw, p_winy, p_sched,
                     p_table_h)
        puy = jnp.asarray(puy_np).astype(p1.dtype)
        pux = jnp.asarray(pux_np).astype(p1.dtype)
        pimg = prep_img.astype(p1.dtype)
    if pipe == 2:
        kern = functools.partial(_level_kernel_pipe2, bres, th, sw, wh,
                                 hp, h, w, iterations, shift, ups,
                                 prep_next)
        scratch = [
            pltpu.VMEM((5, hp, wp), M_DTYPE),         # M, even iterations
            pltpu.VMEM((5, hp, wp), M_DTYPE),         # M, odd iterations
            pltpu.VMEM((2, 2, th, wp), jnp.float32),  # dxy solve/init pp
        ]
        if ups is not None:
            scratch.append(
                pltpu.VMEM((2, 2, ups[1], spw), jnp.float32))  # coarse win
        scratch += [
            pltpu.VMEM((2, 5, th, wp), p0.dtype),     # p0 double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    elif pipe:
        kern = functools.partial(_level_kernel_pipe, bres, th, sw, wh, hp,
                                 h, w, iterations, shift)
        scratch = [
            pltpu.VMEM((5, 2 * hp, wp), M_DTYPE),     # M ping-pong
            pltpu.VMEM((2, 2, th, wp), jnp.float32),  # dxy solve/init pp
            pltpu.VMEM((2, 5, th, wp), p0.dtype),     # p0 double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kern = functools.partial(_level_kernel, bres, th, sw, wh, hp, h, w,
                                 iterations, resident_table, shift, ups,
                                 prep_next)
        scratch = [
            pltpu.VMEM((5, 2 * hp, wp), M_DTYPE),      # M ping-pong
            pltpu.VMEM((2, th, wp), jnp.float32),      # current flow tile
            # init-flow double buffer (fine tiles, or coarse row windows
            # for the fused upsample)
            pltpu.VMEM((2, 2, ups[1], spw) if ups is not None
                       else (2, 2, th, wp), jnp.float32),
            pltpu.VMEM((2, 5, th, wp), p0.dtype),      # p0 double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if not resident_table:
            scratch += [pltpu.VMEM((5, 2 * sh, wpx), p1.dtype),  # p1 dbuf
                        pltpu.SemaphoreType.DMA((2,))]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),               # counts
        pl.BlockSpec((1, th, wh), lambda it, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),               # y bands
        pl.BlockSpec(memory_space=pltpu.VMEM),               # x blocks
    ]
    args = [counts, by_all, a_big]
    if ups is not None:
        in_specs += [
            pl.BlockSpec((1, th, ups[1]), lambda it, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # ups y bands
            pl.BlockSpec(memory_space=pltpu.VMEM),           # ups x blocks
        ]
        args += [uy, ux]
    in_specs += [
        # Init flow (fine tiles, or the coarse flow for the fused
        # upsample): DMA'd per tile during the it==0 steps only
        # (BlockSpec delivery would re-fetch it every iteration).
        pl.BlockSpec(memory_space=pl.ANY),                   # f0
        pl.BlockSpec(memory_space=pl.ANY),                   # p0
        # Warp table: whole-array VMEM-resident across grid steps
        # when it fits (DMA'd from HBM once per level), else ANY +
        # per-tile halo window double-buffer DMA.
        pl.BlockSpec(memory_space=pltpu.VMEM if resident_table
                     else pl.ANY),                           # p1
    ]
    args += [f0, p0, p1]
    # Whole-array flow output block (constant index map): stays
    # VMEM-resident across all grid steps and is copied out once — the
    # final solve writes its tile rows in place.
    out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((2, hp, wp), jnp.float32)
    if prep_next is not None:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),               # next img
            pl.BlockSpec(memory_space=pltpu.VMEM),           # prep y mats
            pl.BlockSpec(memory_space=pltpu.VMEM),           # prep x mats
        ]
        args += [pimg, puy, pux]
        # The prep table output lives in HBM (ANY): staged tile rows
        # are async-copied out (it is far too large for VMEM at the
        # hosted level).
        out_specs = [out_specs, pl.BlockSpec(memory_space=pl.ANY)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((5, p_table_h, p_table_w),
                                          p1.dtype)]
        scratch += [
            pltpu.VMEM((2, p_winy, pimg.shape[1]), p1.dtype),  # img dbuf
            pltpu.VMEM((2, 5, p_tl, p_table_w), p1.dtype),     # out stage
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    out = pl.pallas_call(
        kern,
        grid=(iterations + 1, ty_n),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024 if resident_table
            else 120 * 1024 * 1024,
        ),
    )(*args)
    if prep_next is not None:
        flow_out, table = out
        return ((flow_out, table) if padded_io
                else (flow_out[:, :h, :w], table))
    return out if padded_io else out[:, :h, :w]


@functools.lru_cache(maxsize=64)
def _level_seq(hw, hpwp, winsize, gaussian, bres, th, iterations,
               padded_io, resident_table, pipe, sw, shift, ups_src=None,
               prep_spec=None):
    if prep_spec is not None:
        @jax.custom_batching.sequential_vmap
        def f(p0, p1, counts, flow, prep_img):
            return _fused_level(p0, p1, counts, flow, hw, hpwp, winsize,
                                gaussian, bres, th, iterations, padded_io,
                                resident_table, pipe, sw, shift, ups_src,
                                prep_img, prep_spec)
        return f

    @jax.custom_batching.sequential_vmap
    def f(p0, p1, counts, flow):
        return _fused_level(p0, p1, counts, flow, hw, hpwp, winsize,
                            gaussian, bres, th, iterations, padded_io,
                            resident_table, pipe, sw, shift, ups_src)
    return f


def fused_level_prepped(prep, flow, winsize: int, gaussian: bool,
                        bres: int, iterations: int,
                        padded_io: bool = False,
                        resident_table: bool = False,
                        pipe: int = 0,
                        shift: str = "roll",
                        ups_src=None,
                        prep_img=None, prep_spec=None) -> jax.Array:
    """The WHOLE pyramid level in one kernel: first matrix update from the
    upsampled flow, `iterations - 1` fused iterations, and the final
    window-blur + solve -> (2, h, w) flow (channels-first). Use
    level_vmem_bytes/level_vmem_budget() to decide whether the level fits;
    callers fall back to the 3-kernel chain otherwise. vmap lowers to a
    sequential per-stream loop (see fused_update_prepped).

    padded_io=True: consume AND return flow in the padded (2, Hp, Wp)
    kernel layout — the pyramid driver keeps flow padded across levels
    (the padded upsample embeds pad zeros in its resize matrices) so no
    per-level jnp.pad / crop passes run. Input pads must be zero; output
    pads hold unmasked final-solve values (every consumer either ignores
    them via zero matrix columns or crops).

    resident_table=True: keep the whole bf16 warp table VMEM-resident
    across grid steps instead of double-buffering per-tile halo windows —
    gate on level_vmem_bytes_resident() <= level_vmem_budget_resident().

    pipe=1 or 2 (requires resident_table and >= 3 row tiles): software-
    pipelined kernel — each grid step runs the MXU blur+solve of tile i
    alongside the VPU warp+update of the previous tile. 1 keeps the M
    ping-pong in one scratch ref (_level_kernel_pipe); 2 splits it into
    two statically distinct refs so Mosaic can prove the chains
    independent (_level_kernel_pipe2). Bit-identical results;
    scheduling only.

    ups_src=(src_true, src_pad, scale): fused level-to-level upsample —
    `flow` is the PREVIOUS level's padded (2, SPh, SPw) flow and each
    tile's init flow is computed in-kernel (bit-identical to
    resize_bilinear_cf_padded; 2-tap exact). Gate on
    _ups_mats(...) is not None and pipe != 1.

    prep_img + prep_spec=(prep_args, n_prep): lagged-stream prep fusion
    — the kernel additionally emits the NEXT frame's expansion table
    for the level prep_args describes; the return becomes
    (flow, table). Gate on _prep_tile_mats(...) is not None and
    pipe != 1."""
    f = _level_seq(tuple(prep["hw"]), tuple(prep["hpwp"]), winsize,
                   gaussian, bres, prep["th"], iterations, padded_io,
                   resident_table, pipe, prep.get("sw"), shift,
                   ups_src, prep_spec)
    if prep_spec is not None:
        return f(prep["p0"], prep["p1"], prep["counts"], flow, prep_img)
    return f(prep["p0"], prep["p1"], prep["counts"], flow)


@functools.lru_cache(maxsize=64)
def _final_seq(hw, winsize, gaussian, th):
    @jax.custom_batching.sequential_vmap
    def f(m):
        return _fused_final(m, hw, winsize, gaussian, th)
    return f


def fused_final_solve(prep, m, winsize: int, gaussian: bool) -> jax.Array:
    """Trailing window-blur + 2x2 solve: M (5, Hp, Wp) -> flow (2, h, w)
    (channels-first — the level driver moves the axis once at the end).
    vmap lowers to a sequential per-stream loop (see
    fused_update_prepped)."""
    return _final_seq(tuple(prep["hw"]), winsize, gaussian,
                      prep["th"])(m)
