"""TPU-native feature-based stabilization.

The reference stabilizes with AKAZE keypoints + brute-force cross-matching
+ RANSAC homography + inverse warpPerspective (main.cpp:1556-1682). AKAZE's
nonlinear scale space is host-bound; this module provides the same
capability with TPU-friendly pieces:

- Harris corners: structure-tensor responses are separable box sums
  (convs), non-max suppression a 3x3 max stencil, selection one top_k;
- descriptors: mean/std-normalized 8x8 patches, matched by one (N, 64) x
  (64, N) MXU matmul + mutual-nearest + ratio test (the analog of the
  reference's cross-check match at main.cpp:1605-1621);
- homography: fixed-trip RANSAC (batched 4-point DLT solves via SVD,
  inlier voting), refined on all inliers — compiler-friendly control flow
  only;
- correction: instead of a per-pixel projective gather (no TPU path), the
  near-identity stabilizing homography is applied as a displacement field
  through the tiled base+residual warp (flow/farneback._warp5_tiled), the
  same machinery the flow engines use.

`--mode stabilize` keeps the host-OpenCV AKAZE path for reference parity;
`--mode stabilizeTPU` runs this module end to end on device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ripcurrents_tpu.flow.farneback import _warp5_tiled
from ripcurrents_tpu.ops.conv import sep_filter2d


class Corners(NamedTuple):
    xy: jax.Array       # (N, 2) float32 corner coordinates (x, y)
    score: jax.Array    # (N,) response (<= 0 for padded entries)


def harris_corners(img: jax.Array, n: int = 256, k: float = 0.04,
                   border: int = 12) -> Corners:
    """Top-n Harris corners with 3x3 non-max suppression."""
    f = img.astype(jnp.float32)
    d = jnp.asarray([-0.5, 0.0, 0.5], jnp.float32)
    s = jnp.asarray([0.25, 0.5, 0.25], jnp.float32)
    ix = sep_filter2d(f, s, d, border="replicate")
    iy = sep_filter2d(f, d, s, border="replicate")
    box = jnp.ones(5, jnp.float32) / 5.0
    sxx = sep_filter2d(ix * ix, box, box, border="replicate")
    syy = sep_filter2d(iy * iy, box, box, border="replicate")
    sxy = sep_filter2d(ix * iy, box, box, border="replicate")
    resp = (sxx * syy - sxy * sxy) - k * (sxx + syy) ** 2

    # 3x3 NMS: keep strict local maxima only.
    h, w = resp.shape
    pad = jnp.pad(resp, 1, constant_values=-jnp.inf)
    neigh = jnp.stack([pad[dy:dy + h, dx:dx + w]
                       for dy in range(3) for dx in range(3)
                       if not (dy == 1 and dx == 1)])
    is_max = resp > neigh.max(axis=0)
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    interior = ((xs >= border) & (xs < w - border) &
                (ys >= border) & (ys < h - border))
    masked = jnp.where(is_max & interior, resp, -jnp.inf)
    score, idx = jax.lax.top_k(masked.reshape(-1), n)
    xy = jnp.stack([(idx % w).astype(jnp.float32),
                    (idx // w).astype(jnp.float32)], axis=-1)
    return Corners(xy, score)


def patch_descriptors(img: jax.Array, xy: jax.Array,
                      patch: int = 8) -> jax.Array:
    """Mean/std-normalized patch descriptors, (N, patch*patch)."""
    f = img.astype(jnp.float32)
    half = patch // 2
    oy, ox = jnp.meshgrid(jnp.arange(patch, dtype=jnp.int32),
                          jnp.arange(patch, dtype=jnp.int32), indexing="ij")

    def one(p):
        y0 = jnp.clip(p[1].astype(jnp.int32) - half, 0, f.shape[0] - patch)
        x0 = jnp.clip(p[0].astype(jnp.int32) - half, 0, f.shape[1] - patch)
        d = jax.lax.dynamic_slice(f, (y0, x0), (patch, patch))
        d = d - d.mean()
        return (d / jnp.maximum(jnp.sqrt((d * d).mean()), 1e-3)).reshape(-1)

    return jax.vmap(one)(xy)


def match_descriptors(da: jax.Array, db: jax.Array,
                      valid_a: jax.Array, valid_b: jax.Array,
                      max_ratio: float = 0.9):
    """Mutual-nearest matches by correlation (one MXU matmul).

    Returns (idx_b_for_a (N,), good (N,) bool)."""
    sim = da @ db.T   # (N, N) correlation; higher is better
    sim = jnp.where(valid_b[None, :], sim, -jnp.inf)
    sim = jnp.where(valid_a[:, None], sim, -jnp.inf)
    best_ab = jnp.argmax(sim, axis=1)
    best_ba = jnp.argmax(sim, axis=0)
    mutual = best_ba[best_ab] == jnp.arange(sim.shape[0])
    top2 = jax.lax.top_k(sim, 2)[0]
    # correlation ratio test: second-best must be clearly worse
    distinct = top2[:, 1] < top2[:, 0] * max_ratio
    good = mutual & distinct & valid_a & (top2[:, 0] > 0.2)
    return best_ab, good


def _hartley(pts: jax.Array, w: jax.Array):
    """Weighted Hartley normalization: translate the (weighted) centroid
    to the origin and scale the mean radius to sqrt(2). Returns
    (normalized pts, T) with T @ [x, y, 1]^T = [xn, yn, 1]^T."""
    wsum = jnp.maximum(w.sum(), 1e-9)
    c = (pts * w[:, None]).sum(0) / wsum
    d = (jnp.linalg.norm(pts - c, axis=1) * w).sum() / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-9)
    t = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    t = t.at[0, 0].set(s).at[1, 1].set(s)
    t = t.at[0, 2].set(-s * c[0]).at[1, 2].set(-s * c[1])
    return (pts - c) * s, t


def _dlt_homography(src: jax.Array, dst: jax.Array, w: jax.Array):
    """Weighted DLT: homography mapping src -> dst from >=4 weighted
    correspondences. src/dst (M, 2), w (M,). Returns (3, 3).

    Hartley-normalized: raw pixel coordinates (~3e2) make the 9-column
    system span ~5 orders of magnitude and the f32 SVD's smallest
    singular vector is then noise-dominated (a 20-degree rotation fit
    from exact points came back ~2 px wrong); normalizing both sides to
    centroid 0 / mean radius sqrt(2) conditions it, and the result is
    denormalized as T_dst^-1 Hn T_src."""
    src_n, t_s = _hartley(src, w)
    dst_n, t_d = _hartley(dst, w)
    x, y = src_n[:, 0], src_n[:, 1]
    u, v = dst_n[:, 0], dst_n[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    rows1 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], axis=-1)
    rows2 = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], axis=-1)
    a = jnp.concatenate([rows1 * w[:, None], rows2 * w[:, None]], axis=0)
    # Smallest right singular vector of A. full_matrices=True is REQUIRED:
    # the 4-point system is (8, 9) and the economy SVD returns only 8
    # right singular vectors — vt[-1] would then be the smallest
    # *range-space* vector, not the null-space solution (every 4-point
    # RANSAC fit silently produced a junk homography).
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    hn = vt[-1].reshape(3, 3)
    # T_d^-1 analytically: [[1/s, 0, cx], [0, 1/s, cy], [0, 0, 1]]
    s_d = t_d[0, 0]
    td_inv = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    td_inv = td_inv.at[0, 0].set(1.0 / s_d).at[1, 1].set(1.0 / s_d)
    td_inv = td_inv.at[0, 2].set(-t_d[0, 2] / s_d)
    td_inv = td_inv.at[1, 2].set(-t_d[1, 2] / s_d)
    return td_inv @ hn @ t_s


def _apply_h(h: jax.Array, pts: jax.Array) -> jax.Array:
    p = jnp.concatenate([pts, jnp.ones((pts.shape[0], 1), pts.dtype)], -1)
    q = p @ h.T
    return q[:, :2] / jnp.maximum(jnp.abs(q[:, 2:]), 1e-9) * jnp.sign(q[:, 2:])


def ransac_homography(src: jax.Array, dst: jax.Array, good: jax.Array,
                      key: jax.Array, trials: int = 64,
                      thresh: float = 2.0):
    """Fixed-trip RANSAC + weighted-inlier refinement.

    Returns (H (3,3), inlier_count ())."""
    n = src.shape[0]
    gw = good.astype(jnp.float32)

    def trial(k):
        # 4 random correspondences, biased to good ones via gumbel trick
        g = jax.random.gumbel(k, (n,)) + jnp.where(good, 0.0, -1e9)
        sel = jax.lax.top_k(g, 4)[1]
        h = _dlt_homography(src[sel], dst[sel], jnp.ones(4))
        err = jnp.sum((_apply_h(h, src) - dst) ** 2, axis=-1)
        inl = (err < thresh * thresh) & good
        return h, inl.sum(), inl

    keys = jax.random.split(key, trials)
    hs, counts, inls = jax.vmap(trial)(keys)
    best = jnp.argmax(counts)
    inlier = inls[best]
    # refine on all inliers (weighted DLT)
    w = inlier.astype(jnp.float32) + 1e-6 * gw
    h_ref = _dlt_homography(src, dst, w)
    h_ref = h_ref / jnp.where(jnp.abs(h_ref[2, 2]) > 1e-9, h_ref[2, 2], 1.0)
    return h_ref, counts[best]


def homography_displacement(h_mat: jax.Array, height: int,
                            width: int) -> jax.Array:
    """Sampling displacement d(x) = H @ x - x, (H, W, 2): a warp that
    reads frame(x + d(x)) produces out(x) = frame(H x)."""
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32),
                          indexing="ij")
    denom = h_mat[2, 0] * xs + h_mat[2, 1] * ys + h_mat[2, 2]
    denom = jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
    u = (h_mat[0, 0] * xs + h_mat[0, 1] * ys + h_mat[0, 2]) / denom
    v = (h_mat[1, 0] * xs + h_mat[1, 1] * ys + h_mat[1, 2]) / denom
    return jnp.stack([u - xs, v - ys], axis=-1)


def warp_by_homography(frame: jax.Array, h_mat: jax.Array) -> jax.Array:
    """out(x) = frame(H x) — cv2.warpPerspective(frame, inv(H)) — for
    near-identity H: the projective map becomes a smooth displacement
    field applied with the tiled base+residual warp (exact within +-6 px
    of each tile's mean shift). With H mapping prev->cur, this resamples
    the current frame back onto the previous frame's geometry."""
    hh, ww = frame.shape[0], frame.shape[1]
    disp = homography_displacement(h_mat, hh, ww)
    f = frame.astype(jnp.float32)
    if f.ndim == 2:
        f = f[..., None]
    out, inside = _warp5_tiled(f, disp, bres=6)
    out = jnp.where(inside[..., None], out, 0.0)
    out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out[..., 0] if frame.ndim == 2 else out


@functools.partial(jax.jit, static_argnames=("n_corners", "features"))
def stabilize_pair(prev_gray: jax.Array, cur_gray: jax.Array,
                   cur_frame: jax.Array, key: jax.Array,
                   n_corners: int = 256, features: str = "harris"):
    """One stabilization step: detect/match/RANSAC prev->cur, then warp the
    current frame back onto prev's geometry (main.cpp:1652-1659).

    features 'harris': Harris corners + normalized-patch descriptors.
    features 'akaze': the TPU-native AKAZE-class engine — nonlinear
    scale space, det-Hessian keypoints, rotated binary descriptors
    (flow/akaze_tpu.py; the reference's detector family,
    main.cpp:1598)."""
    if features == "akaze":
        from ripcurrents_tpu.flow.akaze_tpu import detect_and_describe
        ca, da = detect_and_describe(prev_gray, n=n_corners)
        cb, db = detect_and_describe(cur_gray, n=n_corners)
    else:
        ca = harris_corners(prev_gray, n_corners)
        cb = harris_corners(cur_gray, n_corners)
        da = patch_descriptors(prev_gray, ca.xy)
        db = patch_descriptors(cur_gray, cb.xy)
    idx, good = match_descriptors(da, db, ca.score > 0, cb.score > 0)
    src = ca.xy
    dst = cb.xy[idx]
    h_mat, n_inl = ransac_homography(src, dst, good, key)
    # guard: too few inliers -> identity (reference keeps the raw frame)
    h_mat = jnp.where(n_inl >= 8, h_mat, jnp.eye(3))
    return warp_by_homography(cur_frame, h_mat), h_mat, n_inl
