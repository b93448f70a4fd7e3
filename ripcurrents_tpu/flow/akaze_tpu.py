"""TPU-native AKAZE-class features: nonlinear scale space, det-Hessian
keypoints, rotated binary descriptors.

The reference's stabilize mode detects cv::AKAZE keypoints
(RipCurrents_main/main.cpp:1598-1652). SURVEY.md section 2.2 planned a
host-side fallback ("hard to do natively"); this module implements the
AKAZE recipe itself from the published algorithm (Alcantarilla et al.,
KAZE/AKAZE papers — not OpenCV's implementation) with TPU-idiomatic
pieces only:

- **nonlinear scale space**: Perona-Malik g2 diffusion integrated with
  explicit Euler stencil steps (tau = 0.23 < 0.25 stability bound).
  Each step is a 4-neighbor stencil — elementwise VPU math over static
  shapes; the conductivity contrast k is a gradient-magnitude quantile
  computed on device. Octaves run the same program at halved
  resolution (static shapes per octave).
- **detection**: scale-normalized det(Hessian) per evolution level,
  3x3 spatial non-max AND adjacent-scale comparison, then ONE top_k
  across all levels (static keypoint count, compiler-friendly).
- **orientation**: intensity-centroid angle (Rosin moments) over an
  11x11 disc of the diffused image at the keypoint's level — the same
  rotation covariance AKAZE's sliding-window gradient vote provides,
  with a fixed-shape reduction instead of 42 windowed votes.
- **descriptor**: M-LDB style — (intensity, dx, dy) channel means over
  a rotated 4x4 cell grid scaled by the keypoint scale, binarized by a
  fixed channel-consistent comparison-pair table and stored as +-1
  float rows, so brute-force Hamming matching is ONE MXU matmul
  (max dot == min Hamming; reuses flow/feature_stab.match_descriptors).

Functional parity, not bit parity: keypoints/descriptors are
AKAZE-grade (nonlinear scale space -> edges survive diffusion, binary
rotated descriptors), validated by homography recovery under synthetic
rotation+shift and by end-to-end stabilization (tests/test_akaze_tpu.py),
not by matching cv2.AKAZE bit patterns.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ripcurrents_tpu.ops.conv import sep_filter2d


class Keypoints(NamedTuple):
    xy: jax.Array      # (N, 2) float32 (x, y) at base-image resolution
    score: jax.Array   # (N,) det-Hessian response (-inf for padding)
    size: jax.Array    # (N,) sigma at base resolution
    angle: jax.Array   # (N,) orientation, radians


def _gauss1d(sigma: float) -> jnp.ndarray:
    r = max(int(round(3 * sigma)), 1)
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    return jnp.asarray((k / k.sum()).astype(np.float32))


def _scharr_pair():
    d = jnp.asarray([-1.0, 0.0, 1.0], jnp.float32) * 0.5
    s = jnp.asarray([3.0, 10.0, 3.0], jnp.float32) / 16.0
    return d, s


def _grad(img):
    d, s = _scharr_pair()
    gx = sep_filter2d(img, s, d, border="replicate")
    gy = sep_filter2d(img, d, s, border="replicate")
    return gx, gy


def _pm_g2(gx, gy, k2):
    return 1.0 / (1.0 + (gx * gx + gy * gy) / k2)


def _diffuse(img, k2, steps: int, tau: float):
    """`steps` explicit Perona-Malik steps; conductivity refreshed each
    step from the evolving image (4-neighbor stencil, replicate border)."""

    def step(l, _):
        gx, gy = _grad(l)
        g = _pm_g2(gx, gy, k2)
        lp = jnp.pad(l, 1, mode="edge")
        gp = jnp.pad(g, 1, mode="edge")
        h, w = l.shape
        # flux with half-pixel conductivities ~ mean of endpoints
        def nb(dy, dx):
            return (lp[1 + dy:1 + dy + h, 1 + dx:1 + dx + w],
                    gp[1 + dy:1 + dy + h, 1 + dx:1 + dx + w])
        le, ge = nb(0, 1)
        lw_, gw_ = nb(0, -1)
        ls, gs = nb(1, 0)
        ln, gn = nb(-1, 0)
        div = (0.5 * (ge + g) * (le - l) + 0.5 * (gw_ + g) * (lw_ - l) +
               0.5 * (gs + g) * (ls - l) + 0.5 * (gn + g) * (ln - l))
        return l + tau * div, None

    out, _ = jax.lax.scan(step, img, None, length=steps)
    return out


def _det_hessian(img, sigma: float):
    """Scale-normalized determinant of the Hessian (sigma^4 (Lxx Lyy -
    Lxy^2)), second derivatives as chained Scharr first derivatives."""
    gx, gy = _grad(img)
    gxx, gxy = _grad(gx)
    _, gyy = _grad(gy)
    return (sigma ** 4) * (gxx * gyy - gxy * gxy)


def _downsample2(img):
    """2x2 mean pooling (the octave step)."""
    h, w = img.shape
    return img[:h - h % 2, :w - w % 2].reshape(
        h // 2, 2, w // 2, 2).mean(axis=(1, 3))


@functools.lru_cache(maxsize=8)
def _ldb_pairs(n_cells: int, n_bits: int, seed: int = 7) -> np.ndarray:
    """Fixed channel-consistent comparison-pair table: n_bits pairs
    (i, j, c) comparing channel c of cell i vs cell j (i != j)."""
    rng = np.random.default_rng(seed)
    pairs = set()
    out = []
    while len(out) < n_bits:
        i, j = rng.integers(0, n_cells, 2)
        c = int(rng.integers(0, 3))
        if i == j or (i, j, c) in pairs or (j, i, c) in pairs:
            continue
        pairs.add((i, j, c))
        out.append((i, j, c))
    return np.asarray(out, np.int32)


# Descriptor geometry: 4x4 cell grid, cell centers at +-{0.5, 1.5} *
# cell_pitch, pitch scales with keypoint size.
_GRID = np.stack(np.meshgrid((np.arange(4) - 1.5), (np.arange(4) - 1.5),
                             indexing="ij"), -1).reshape(16, 2)  # (y, x)


def _bilinear(img, y, x):
    h, w = img.shape
    y = jnp.clip(y, 0.0, h - 1.001)
    x = jnp.clip(x, 0.0, w - 1.001)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    fy = y - y0
    fx = x - x0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * (1 - fx) * v00 + (1 - fy) * fx * v01 +
            fy * (1 - fx) * v10 + fy * fx * v11)


class _Level(NamedTuple):
    img: jax.Array     # diffused image at octave resolution
    gx: jax.Array
    gy: jax.Array
    resp: jax.Array    # det-Hessian response
    sigma: float       # at base resolution
    octave: int        # 2**octave = coordinate scale factor


def _build_levels(base: jax.Array, octaves: int, sublevels: int,
                  sigma0: float, tau: float, k2):
    """The nonlinear scale space: per octave, `sublevels` diffusion stops
    at evolution times t_i = sigma_i^2 / 2, sigma_i = sigma0 * 2^(o + s/S).
    Python loops (static level count) — everything jits into one graph."""
    levels = []
    img = base
    t_prev = 0.5 * sigma0 ** 2
    for o in range(octaves):
        for s in range(sublevels):
            # continuous progression: octave o covers
            # (sigma0*2^o, sigma0*2^(o+1)]
            sigma = sigma0 * 2.0 ** (o + (s + 1) / sublevels)
            t = 0.5 * sigma ** 2
            # evolution time at octave resolution scales by 4^-o
            steps = max(int(math.ceil((t - t_prev) * (0.25 ** o) / tau)), 1)
            img = _diffuse(img, k2, steps, tau)
            t_prev = t
            gx, gy = _grad(img)
            resp = _det_hessian(img, sigma * (0.5 ** o))
            levels.append(_Level(img, gx, gy, resp, sigma, o))
        if o + 1 < octaves:
            img = _downsample2(img)
    return levels


def _oct_to_base(v, octave: int):
    """Octave-pixel coordinate -> base-image coordinate (2x2 mean pooling
    puts octave pixel i at base position 2i + 0.5 per halving)."""
    sc = 2.0 ** octave
    return v * sc + 0.5 * (sc - 1.0)


def _base_to_oct(v, octave: int):
    s = 0.5 ** octave
    return (v + 0.5) * s - 0.5


def detect(gray: jax.Array, n: int = 256, octaves: int = 2,
           sublevels: int = 3, sigma0: float = 1.6,
           threshold: float = 1e-4, border: int = 10) -> tuple:
    """AKAZE-class keypoints of a (H, W) uint8/float image.

    Returns (Keypoints, levels) — levels are reused by `describe`."""
    f = gray.astype(jnp.float32) / 255.0
    base = sep_filter2d(f, _gauss1d(sigma0), _gauss1d(sigma0),
                        border="replicate")
    gx, gy = _grad(base)
    mag = jnp.sqrt(gx * gx + gy * gy)
    # contrast factor: 70th percentile of NONZERO gradient magnitude (the
    # AKAZE recipe); including flat-region zeros would drag k toward 0 and
    # make Perona-Malik treat noise as edges (under-diffusion).
    nz = jnp.where(mag > 1e-6, mag, jnp.nan)
    k = jnp.nanpercentile(nz.reshape(-1), 70.0)
    k = jnp.where(jnp.isnan(k), 1e-3, k)   # fully flat frame
    k2 = jnp.maximum(k * k, 1e-8)
    tau = 0.23
    levels = _build_levels(base, octaves, sublevels, sigma0, tau, k2)

    cand_scores = []
    cand_xy = []
    cand_size = []
    cand_lvl = []
    for li, lv in enumerate(levels):
        r = lv.resp
        h, w = r.shape
        pad = jnp.pad(r, 1, constant_values=jnp.inf * -1)
        neigh = jnp.stack([pad[dy:dy + h, dx:dx + w]
                           for dy in range(3) for dx in range(3)
                           if not (dy == 1 and dx == 1)])
        is_max = r > neigh.max(axis=0)
        # adjacent-scale check within the same octave resolution
        same_oct = [m for m in (levels[li - 1] if li > 0 else None,
                                levels[li + 1] if li + 1 < len(levels)
                                else None)
                    if m is not None and m.octave == lv.octave]
        for m in same_oct:
            is_max = is_max & (r >= m.resp)
        ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        b = max(border >> lv.octave, 3)
        interior = ((xs >= b) & (xs < w - b) & (ys >= b) & (ys < h - b))
        masked = jnp.where(is_max & interior & (r > threshold), r,
                           -jnp.inf)
        cand_scores.append(masked.reshape(-1))
        cand_xy.append(jnp.stack(
            [_oct_to_base(xs.reshape(-1).astype(jnp.float32), lv.octave),
             _oct_to_base(ys.reshape(-1).astype(jnp.float32), lv.octave)],
            axis=-1))
        cand_size.append(jnp.full((h * w,), lv.sigma))
        cand_lvl.append(jnp.full((h * w,), li, jnp.int32))

    scores = jnp.concatenate(cand_scores)
    xy = jnp.concatenate(cand_xy, axis=0)
    size = jnp.concatenate(cand_size)
    lvl = jnp.concatenate(cand_lvl)
    top, idx = jax.lax.top_k(scores, n)
    kp_xy = xy[idx].astype(jnp.float32)
    kp_size = size[idx].astype(jnp.float32)
    kp_lvl = lvl[idx]

    # Sub-pixel refinement: 2-D quadratic fit of the response 3x3
    # neighborhood on the keypoint's own level; offset clamped to
    # +-0.6 px (octave pixels), guarded on the Hessian determinant.
    def refine_on(resp, octave):
        def one(p):
            y = jnp.clip(jnp.round(_base_to_oct(p[1], octave))
                         .astype(jnp.int32), 1, resp.shape[0] - 2)
            x = jnp.clip(jnp.round(_base_to_oct(p[0], octave))
                         .astype(jnp.int32), 1, resp.shape[1] - 2)
            r = jax.lax.dynamic_slice(resp, (y - 1, x - 1), (3, 3))
            gx_ = 0.5 * (r[1, 2] - r[1, 0])
            gy_ = 0.5 * (r[2, 1] - r[0, 1])
            hxx = r[1, 2] - 2.0 * r[1, 1] + r[1, 0]
            hyy = r[2, 1] - 2.0 * r[1, 1] + r[0, 1]
            hxy = 0.25 * (r[2, 2] - r[2, 0] - r[0, 2] + r[0, 0])
            det = hxx * hyy - hxy * hxy
            ox_ = jnp.where(jnp.abs(det) > 1e-18,
                            -(hyy * gx_ - hxy * gy_) / det, 0.0)
            oy_ = jnp.where(jnp.abs(det) > 1e-18,
                            -(hxx * gy_ - hxy * gx_) / det, 0.0)
            ox_ = jnp.clip(ox_, -0.6, 0.6)
            oy_ = jnp.clip(oy_, -0.6, 0.6)
            return jnp.stack([ox_, oy_]) * (2.0 ** octave)
        return one

    offs = []
    for li, lv in enumerate(levels):
        offs.append(jax.vmap(refine_on(lv.resp, lv.octave))(kp_xy))
    off = jnp.select([(kp_lvl == li)[:, None]
                      for li in range(len(levels))], offs)
    kp_xy = kp_xy + off

    # Orientation: intensity-centroid (Rosin) over an 11x11 disc of the
    # level's diffused image, computed per keypoint on its own level.
    r = 5
    oy, ox = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1),
                         indexing="ij")
    disc = (oy * oy + ox * ox <= r * r).astype(np.float32)
    oyj = jnp.asarray(oy.reshape(-1), jnp.float32)
    oxj = jnp.asarray(ox.reshape(-1), jnp.float32)
    dj = jnp.asarray(disc.reshape(-1))

    def orient_on(img, octave):
        def one(p):
            y = _base_to_oct(p[1], octave) + oyj
            x = _base_to_oct(p[0], octave) + oxj
            v = _bilinear(img, y, x) * dj
            m01 = jnp.sum(v * oyj)
            m10 = jnp.sum(v * oxj)
            return jnp.arctan2(m01, m10)
        return one

    angs = []
    for li, lv in enumerate(levels):
        a = jax.vmap(orient_on(lv.img, lv.octave))(kp_xy)
        angs.append(a)
    angle = jnp.select([kp_lvl == li for li in range(len(levels))], angs)

    kps = Keypoints(kp_xy, top, kp_size, angle)
    return kps, (levels, kp_lvl)


def describe(kps: Keypoints, ctx, n_bits: int = 256) -> jax.Array:
    """M-LDB-style binary descriptors as (N, n_bits) +-1 float rows.

    Channel means (intensity, rotated dx, rotated dy) are point-sampled
    at the 16 rotated cell centers of each keypoint's diffused level
    image (the diffusion at the keypoint scale IS the cell smoothing),
    then binarized by the fixed comparison-pair table."""
    levels, kp_lvl = ctx
    pairs = jnp.asarray(_ldb_pairs(16, n_bits))
    grid = jnp.asarray(_GRID, jnp.float32)  # (16, 2) (y, x) units

    def feats_on(lv: _Level):
        def one(p, size, ang):
            s = 0.5 ** lv.octave
            pitch = jnp.maximum(size * s, 1.0) * 1.5
            ca, sa = jnp.cos(ang), jnp.sin(ang)
            gy_u = grid[:, 0] * pitch
            gx_u = grid[:, 1] * pitch
            y = _base_to_oct(p[1], lv.octave) + (sa * gx_u + ca * gy_u)
            x = _base_to_oct(p[0], lv.octave) + (ca * gx_u - sa * gy_u)
            vi = _bilinear(lv.img, y, x)
            vx = _bilinear(lv.gx, y, x)
            vy = _bilinear(lv.gy, y, x)
            # rotate gradients into the keypoint frame
            rx = ca * vx + sa * vy
            ry = -sa * vx + ca * vy
            return jnp.stack([vi, rx, ry], axis=0)  # (3, 16)
        return one

    allf = []
    for lv in levels:
        f = jax.vmap(feats_on(lv), in_axes=(0, 0, 0))(
            kps.xy, kps.size, kps.angle)
        allf.append(f)
    feats = jnp.select([(kp_lvl == li)[:, None, None]
                        for li in range(len(levels))], allf)  # (N, 3, 16)

    a = feats[:, pairs[:, 2], pairs[:, 0]]
    b = feats[:, pairs[:, 2], pairs[:, 1]]
    bits = jnp.where(a > b, 1.0, -1.0)
    return bits / np.sqrt(n_bits)


@functools.partial(jax.jit, static_argnames=("n", "octaves", "sublevels"))
def detect_and_describe(gray: jax.Array, n: int = 256, octaves: int = 2,
                        sublevels: int = 3):
    """One jitted graph: nonlinear scale space -> keypoints -> binary
    descriptors. Returns (Keypoints, (N, 256) +-1/sqrt(256) rows)."""
    kps, ctx = detect(gray, n=n, octaves=octaves, sublevels=sublevels)
    return kps, describe(kps, ctx)
