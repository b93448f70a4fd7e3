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
  bounds (offsets stay (8,128)-tile-aligned by construction), re-centers
  it with a hardware dynamic rotate (pltpu.roll), and applies cv2's
  replicate-border semantics with iota-mask selects against edge rows
  (the bottom edge row is extracted at a dynamic sublane position via a
  one-hot matmul).
- The separable window blur runs as static shifted adds on the VPU: the
  y axis over the re-centered window, the x axis over lane rolls of the
  full-width rows with replicate masks at the true image edge.
- The warp applies a per-(th x SW) subcolumn rounded mean displacement
  ("base") as dynamic rotates of the halo'd expansion table, then
  resolves the per-pixel remainder (clamped to +-bres) with the
  (2*bres+2)^2-term shift decomposition of bilinear sampling — exact
  wherever a pixel's displacement stays within bres px of its block mean
  (see flow/farneback.py _warp5_tiled for the algebra and the documented
  deviation).
- The expansion table is stored bf16 (halves halo DMA traffic; fmas
  accumulate in f32).

Mosaic constraints honored: DMA slice starts are multiples of the (8,128)
f32 tiling; all vector-slice offsets are static (dynamic re-centering goes
through pltpu.roll); lane-axis shifts are static-amount rolls.
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


def _subcol_width(wp: int) -> int:
    """Warp-base subcolumn width: multiple of 128 dividing Wp, <= 384."""
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
    """y window blur: per-channel (th, WH) @ (WH, Wp) MXU matmul."""
    outs = [jnp.dot(by_i, mwin[c], preferred_element_type=jnp.float32)
            for c in range(5)]
    return jnp.stack(outs, axis=0)


def _xblur_rows(acc, w_true, a_big):
    """x window blur of (5, th, Wp): replicate-fix the alignment padding,
    extend with one replicate block per side, then one block-banded MXU
    matmul per channel (see _xblur_blocks)."""
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
    outs = []
    for c in range(5):
        blocks = []
        for b in range(nb):
            e = jax.lax.slice(ext, (c, 0, b * 128),
                              (c + 1, th, b * 128 + 384))[0]
            blocks.append(jnp.dot(e, a_big,
                                  preferred_element_type=jnp.float32))
        outs.append(jnp.concatenate(blocks, axis=1)
                    if nb > 1 else blocks[0])
    return jnp.stack(outs, axis=0)


def _solve(mb):
    """Per-pixel 2x2 solve of blurred normal equations (5,th,Wp)->dx,dy."""
    idet = 1.0 / (mb[0] * mb[2] - mb[1] * mb[1] + 1e-3)
    dx = (mb[2] * mb[3] - mb[1] * mb[4]) * idet
    dy = (mb[0] * mb[4] - mb[1] * mb[3]) * idet
    return dx, dy


def _warp_subcols(tbl, dx, dy, counts_ref, i, bres, sw, th):
    """Tiled base + residual warp over per-(th x SW) subcolumn bases.

    tbl: (5, th+2*HALO_Y, Wp+2*HALO_X) bf16 halo block of the second
    frame's expansion; dx/dy (th, Wp) current flow. Returns r1s (5,th,Wp).
    """
    sh = tbl.shape[1]
    wp = dx.shape[1]
    nsub = wp // sw
    sww = sw + 2 * HALO_X
    cols = []
    for s in range(nsub):
        dxs = jax.lax.slice(dx, (0, s * sw), (th, (s + 1) * sw))
        dys = jax.lax.slice(dy, (0, s * sw), (th, (s + 1) * sw))
        cnt = counts_ref[i, s]
        bx = jnp.clip(jnp.round(jnp.sum(dxs) / cnt),
                      -(HALO_X - bres - 1), HALO_X - bres - 1
                      ).astype(jnp.int32)
        by = jnp.clip(jnp.round(jnp.sum(dys) / cnt),
                      -(HALO_Y - bres - 1), HALO_Y - bres - 1
                      ).astype(jnp.int32)
        blk = jax.lax.slice(tbl, (0, 0, s * sw),
                            (5, sh, s * sw + sww)).astype(jnp.float32)
        blk = pltpu.roll(blk, jnp.remainder(sh - by, sh), axis=1)
        blk = pltpu.roll(blk, jnp.remainder(sww - bx, sww), axis=2)
        # Residuals past the budget are clamped to its edge (bounded
        # sample misplacement beats zeroing — see _warp5_tiled).
        rx = jnp.clip(dxs - bx.astype(jnp.float32),
                      -float(bres), float(bres))
        ry = jnp.clip(dys - by.astype(jnp.float32),
                      -float(bres), float(bres))
        wxs = [jnp.clip(1.0 - jnp.abs(rx - sx), 0.0, 1.0)
               for sx in range(-bres, bres + 2)]
        acc = jnp.zeros((5, th, sw), jnp.float32)
        for sy in range(-bres, bres + 2):
            wy = jnp.clip(1.0 - jnp.abs(ry - sy), 0.0, 1.0)
            row = jnp.zeros((5, th, sw), jnp.float32)
            for k, sx in enumerate(range(-bres, bres + 2)):
                sub = jax.lax.slice(
                    blk, (0, HALO_Y + sy, HALO_X + sx),
                    (5, HALO_Y + sy + th, HALO_X + sx + sw))
                row = row + wxs[k][None] * sub
            acc = acc + wy[None] * row
        cols.append(acc)
    return jnp.concatenate(cols, axis=2) if len(cols) > 1 else cols[0]


def _update_tail(r0, r1s, dx, dy, scale, i, th, h_true, w_true, out_ref):
    """FarnebackUpdateMatrices tail: constraint terms, prior-flow fold-back,
    border down-weighting, the 5 normal-equation channels -> out_ref."""
    wp = dx.shape[1]
    ys = (jax.lax.broadcasted_iota(jnp.int32, (th, wp), 0)
          + i * th).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 1).astype(jnp.float32)
    x1 = jnp.floor(xs + dx)
    y1 = jnp.floor(ys + dy)
    inside = ((x1 >= 0.0) & (y1 >= 0.0) &
              (x1 < float(w_true) - 1) & (y1 < float(h_true) - 1))

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

    out_ref[0] = r4 * r4 + r6 * r6
    out_ref[1] = (r4 + r5) * r6
    out_ref[2] = r5 * r5 + r6 * r6
    out_ref[3] = r4 * r2 + r6 * r3
    out_ref[4] = r6 * r2 + r5 * r3


def _m_window(i, th, wh, hp):
    """Clamped-in-bounds start row of the M row-window. Written as 8*(x//8)
    so Mosaic can PROVE the DMA offset respects the (8, 128) tiling (all
    terms are multiples of 8 anyway, but clip() alone is not provably so).
    """
    return 8 * jnp.clip((i * th - MHALO_Y) // 8, 0, (hp - wh) // 8)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _update_kernel(bres, th, sw, h_true, w_true,
                   counts_ref, dx_ref, dy_ref, r0_ref, scale_ref, p_hbm,
                   out_ref, scratch, sem):
    i = pl.program_id(0)
    n_t = pl.num_programs(0)
    sh = th + 2 * HALO_Y

    def dma(tile, slot):
        return pltpu.make_async_copy(
            p_hbm.at[:, pl.ds(tile * th, sh), :], scratch.at[slot],
            sem.at[slot])

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n_t)
    def _():
        dma(i + 1, jax.lax.rem(i + 1, 2)).start()

    dma(i, slot).wait()
    dx = dx_ref[:]
    dy = dy_ref[:]
    r1s = _warp_subcols(scratch[slot], dx, dy, counts_ref, i, bres, sw, th)
    _update_tail(r0_ref[:], r1s, dx, dy, scale_ref[:], i, th,
                 h_true, w_true, out_ref)


def _iter_kernel(bres, th, sw, wh, hp, h_true, w_true,
                 counts_ref, by_ref, abig_ref, r0_ref, scale_ref, p_hbm,
                 m_hbm, out_ref, scratch, m_scratch, sem, m_sem):
    i = pl.program_id(0)
    n_t = pl.num_programs(0)
    sh = th + 2 * HALO_Y

    def dma_tbl(tile, slot):
        return pltpu.make_async_copy(
            p_hbm.at[:, pl.ds(tile * th, sh), :], scratch.at[slot],
            sem.at[slot])

    def dma_m(tile, slot):
        return pltpu.make_async_copy(
            m_hbm.at[:, pl.ds(_m_window(tile, th, wh, hp), wh), :],
            m_scratch.at[slot], m_sem.at[slot])

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        dma_tbl(0, 0).start()
        dma_m(0, 0).start()

    @pl.when(i + 1 < n_t)
    def _():
        ns = jax.lax.rem(i + 1, 2)
        dma_tbl(i + 1, ns).start()
        dma_m(i + 1, ns).start()

    dma_m(i, slot).wait()
    mb = _yblur_window(m_scratch[slot].astype(jnp.float32), by_ref[0])
    mb = _xblur_rows(mb, w_true, abig_ref[:])
    dx, dy = _solve(mb)

    dma_tbl(i, slot).wait()
    r1s = _warp_subcols(scratch[slot], dx, dy, counts_ref, i, bres, sw, th)
    _update_tail(r0_ref[:], r1s, dx, dy, scale_ref[:], i, th,
                 h_true, w_true, out_ref)


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
    mb = _yblur_window(m_scratch[slot].astype(jnp.float32), by_ref[0])
    mb = _xblur_rows(mb, w_true, abig_ref[:])
    dx, dy = _solve(mb)
    out_ref[0] = dx
    out_ref[1] = dy


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def prepare_expansions(r0cf: jax.Array, r1cf: jax.Array, scale: jax.Array,
                       th: int, table_dtype=jnp.bfloat16):
    """Pad the per-level constants once (the iteration loop reuses them):
    r0 tile-aligned (5, Hp, Wp), r1 halo-padded bf16 for the kernel DMAs,
    border scale tile-aligned, per-(tile, subcolumn) real-pixel counts."""
    _, h, w = r0cf.shape
    hp = -(-h // th) * th
    wp = -(-w // 128) * 128
    sw = _subcol_width(wp)
    r0p = jnp.pad(r0cf, ((0, 0), (0, hp - h), (0, wp - w)))
    p = jnp.pad(r1cf, ((0, 0), (HALO_Y, HALO_Y + hp - h),
                       (HALO_X, HALO_X + wp - w))).astype(table_dtype)
    scale_p = jnp.pad(scale, ((0, hp - h), (0, wp - w)))
    ty_n, nsub = hp // th, wp // sw
    rows = np.minimum(np.arange(ty_n) * th + th, h) - np.arange(ty_n) * th
    cols = np.clip(w - np.arange(nsub) * sw, 0, sw)
    counts = np.maximum(rows[:, None] * cols[None, :], 1).astype(np.float32)
    return {"r0p": r0p, "p": p, "scale_p": scale_p,
            "counts": jnp.asarray(counts), "hw": (h, w), "th": th}


@functools.partial(jax.jit, static_argnames=("bres", "th", "hw"))
def _fused_update(r0p, p, scale_p, counts, flow, hw, bres, th):
    h, w = hw
    _, hp, wp = r0p.shape
    sw = _subcol_width(wp)
    dx = jnp.pad(flow[..., 0], ((0, hp - h), (0, wp - w)))
    dy = jnp.pad(flow[..., 1], ((0, hp - h), (0, wp - w)))
    ty_n = hp // th
    kern = functools.partial(_update_kernel, bres, th, sw, h, w)
    out = pl.pallas_call(
        kern,
        grid=(ty_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # counts
            pl.BlockSpec((th, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),               # dx
            pl.BlockSpec((th, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),               # dy
            pl.BlockSpec((5, th, wp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),               # r0
            pl.BlockSpec((th, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),               # scale
            pl.BlockSpec(memory_space=pltpu.ANY),                # table
        ],
        out_specs=pl.BlockSpec((5, th, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 5, th + 2 * HALO_Y, wp + 2 * HALO_X), p.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(counts, dx, dy, r0p, scale_p, p)
    return out


def fused_update_prepped(prep, flow, bres: int = 2) -> jax.Array:
    """First matrix update of a level from the upsampled flow:
    -> (5, Hp, Wp) normal-equation channels (padded layout; the iteration
    and final-solve kernels consume it as-is)."""
    return _fused_update(prep["r0p"], prep["p"], prep["scale_p"],
                         prep["counts"], flow, tuple(prep["hw"]),
                         bres, prep["th"])


@functools.partial(jax.jit, static_argnames=("winsize", "gaussian", "bres",
                                             "th", "hw"))
def _fused_iter(r0p, p, scale_p, counts, m, hw, winsize, gaussian, bres, th):
    h, w = hw
    _, hp, wp = r0p.shape
    sw = _subcol_width(wp)
    taps = _blur_taps(winsize, gaussian)
    half = winsize // 2
    assert half <= MHALO_Y, "blur reach exceeds the M window halo"
    wh = min(th + 2 * MHALO_Y, hp)
    ty_n = hp // th
    by_all = jnp.asarray(_yblur_bands(ty_n, th, wh, hp, h, taps))
    a_big = jnp.asarray(_xblur_blocks(taps))
    kern = functools.partial(_iter_kernel, bres, th, sw, wh, hp, h, w)
    out = pl.pallas_call(
        kern,
        grid=(ty_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # counts
            pl.BlockSpec((1, th, wh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),               # y bands
            pl.BlockSpec(memory_space=pltpu.VMEM),               # x blocks
            pl.BlockSpec((5, th, wp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),               # r0
            pl.BlockSpec((th, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),               # scale
            pl.BlockSpec(memory_space=pltpu.ANY),                # table
            pl.BlockSpec(memory_space=pltpu.ANY),                # M
        ],
        out_specs=pl.BlockSpec((5, th, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 5, th + 2 * HALO_Y, wp + 2 * HALO_X), p.dtype),
            pltpu.VMEM((2, 5, wh, wp), m.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(counts, by_all, a_big, r0p, scale_p, p, m)
    return out


def fused_iter_prepped(prep, m, winsize: int, gaussian: bool,
                       bres: int = 2) -> jax.Array:
    """One fused Farneback iteration: M -> updated M, flow stays in VMEM
    (the caller runs fused_final_solve after the last call)."""
    return _fused_iter(prep["r0p"], prep["p"], prep["scale_p"],
                       prep["counts"], m, tuple(prep["hw"]),
                       winsize, gaussian, bres, prep["th"])


@functools.partial(jax.jit, static_argnames=("winsize", "gaussian", "th",
                                             "hw"))
def _fused_final(m, hw, winsize, gaussian, th):
    h, w = hw
    _, hp, wp = m.shape
    taps = _blur_taps(winsize, gaussian)
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
            pl.BlockSpec(memory_space=pltpu.ANY),
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
    return jnp.moveaxis(out[:, :h, :w], 0, -1)


def fused_final_solve(prep, m, winsize: int, gaussian: bool) -> jax.Array:
    """Trailing window-blur + 2x2 solve: M (5, Hp, Wp) -> flow (h, w, 2)."""
    return _fused_final(m, tuple(prep["hw"]), winsize, gaussian, prep["th"])
