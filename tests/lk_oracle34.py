"""Classic (OpenCV 3.4-era) pyramidal LK oracle, transcribed in numpy.

The reference app links OpenCV 3.4.1 (RipCurrents_main CMake), whose
LKTrackerInvoker is the documented fixed-point algorithm: reflect-101
padded image pyramid, Scharr derivatives zero-padded outside the image,
14-bit fixed-point bilinear weights, 30-iteration refinement with the
epsilon and oscillation-damping stopping rules. The cv2 build installed in
this image is 5.x, which changed the *border-window* behavior; interior
tracks agree to ~0.01 px, but windows straddling the frame edge diverge by
up to ~1-19 px between 3.4 and 5.x semantics. This oracle pins our
implementation to the 3.4 reference semantics for ALL points (the golden
test uses cv2 5.x only where both versions agree).

Transcribed from the documented algorithm (video/src/lkpyramid.cpp of the
3.4 era), not copied: numpy-vectorized over the window, scalar over points
and iterations.
"""

from __future__ import annotations

import cv2
import numpy as np

W_BITS = 14
FLT_SCALE = 1.0 / (1 << 20)


def _scharr(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """cv2 calcSharrDeriv: int16 output, replicate border, [3 10 3]x[-1 0 1]."""
    i = img.astype(np.int32)
    ip = np.pad(i, 1, mode="edge")
    smooth_v = (ip[:-2] + ip[2:]) * 3 + ip[1:-1] * 10
    diff_v = ip[2:] - ip[:-2]
    dx = smooth_v[:, 2:] - smooth_v[:, :-2]
    dy = (diff_v[:, 2:] + diff_v[:, :-2]) * 3 + diff_v[:, 1:-1] * 10
    return dx, dy


def _descale(x: np.ndarray, bits: int) -> np.ndarray:
    return (x + (1 << (bits - 1))) >> bits


def build_pyramid(img: np.ndarray, win: tuple[int, int], max_level: int):
    """buildOpticalFlowPyramid: pyrDown levels each stored with a winSize
    reflect-101 border; stops early when the next level fits the window.
    Returns (n_levels, [padded level images])."""
    levels = [img]
    sz = (img.shape[1], img.shape[0])
    nlev = max_level
    for lv in range(max_level):
        sz = ((sz[0] + 1) // 2, (sz[1] + 1) // 2)
        if sz[0] <= win[0] or sz[1] <= win[1]:
            nlev = lv
            break
        levels.append(cv2.pyrDown(levels[-1]))
    pad = [cv2.copyMakeBorder(l, win[1], win[1], win[0], win[0],
                              cv2.BORDER_REFLECT_101) for l in levels]
    return nlev, pad


def lk34(f0: np.ndarray, f1: np.ndarray, pts: np.ndarray,
         win: tuple[int, int] = (50, 50), max_level: int = 3,
         iters: int = 30, eps: float = 0.1,
         min_eig_threshold: float = 1e-4):
    """Track pts (N, 2) float (x, y) from f0 to f1 with classic-3.4 LK.

    Returns (new_pts (N, 2) float64, status (N,) bool)."""
    wwin, hwin = win
    half = np.array([(wwin - 1) * 0.5, (hwin - 1) * 0.5])
    eps2 = min(max(eps, 0.0), 10.0) ** 2
    nlev, p0 = build_pyramid(f0, win, max_level)
    _, p1 = build_pyramid(f1, win, max_level)

    # Per-level Scharr derivatives of the unpadded region, zero outside.
    derivs = []
    for I in p0:
        lh, lw = I.shape[0] - 2 * hwin, I.shape[1] - 2 * wwin
        dx, dy = _scharr(I[hwin:hwin + lh, wwin:wwin + lw])
        dxp = np.zeros(I.shape, np.int32)
        dyp = np.zeros(I.shape, np.int32)
        dxp[hwin:hwin + lh, wwin:wwin + lw] = dx
        dyp[hwin:hwin + lh, wwin:wwin + lw] = dy
        derivs.append((dxp, dyp))

    out_pts = np.zeros((len(pts), 2))
    out_st = np.zeros(len(pts), bool)
    for ptidx, pt in enumerate(np.asarray(pts, np.float64)):
        next_pt = pt / (2.0 ** nlev)
        status = True
        for level in range(nlev, -1, -1):
            I, J = p0[level], p1[level]
            dxp, dyp = derivs[level]
            lh, lw = I.shape[0] - 2 * hwin, I.shape[1] - 2 * wwin
            prev_pt = pt / (2.0 ** level) - half
            nxt = (next_pt if level == nlev else next_pt * 2.0) - half

            ipx, ipy = int(np.floor(prev_pt[0])), int(np.floor(prev_pt[1]))
            if ipx < -wwin or ipx >= lw or ipy < -hwin or ipy >= lh:
                if level == 0:
                    status = False
                next_pt = nxt + half
                continue
            a, b = prev_pt[0] - ipx, prev_pt[1] - ipy
            iw00 = int(round((1 - a) * (1 - b) * (1 << W_BITS)))
            iw01 = int(round(a * (1 - b) * (1 << W_BITS)))
            iw10 = int(round((1 - a) * b * (1 << W_BITS)))
            iw11 = (1 << W_BITS) - iw00 - iw01 - iw10

            Ii = I.astype(np.int32)
            ys = hwin + ipy + np.arange(hwin)[:, None]
            xs = wwin + ipx + np.arange(wwin)[None, :]
            iwin = _descale(Ii[ys, xs] * iw00 + Ii[ys, xs + 1] * iw01 +
                            Ii[ys + 1, xs] * iw10 + Ii[ys + 1, xs + 1] * iw11,
                            W_BITS - 5)
            dwinx = _descale(dxp[ys, xs] * iw00 + dxp[ys, xs + 1] * iw01 +
                             dxp[ys + 1, xs] * iw10 +
                             dxp[ys + 1, xs + 1] * iw11, W_BITS)
            dwiny = _descale(dyp[ys, xs] * iw00 + dyp[ys, xs + 1] * iw01 +
                             dyp[ys + 1, xs] * iw10 +
                             dyp[ys + 1, xs + 1] * iw11, W_BITS)
            a11 = float((dwinx.astype(np.float64) ** 2).sum()) * FLT_SCALE
            a12 = float((dwinx.astype(np.float64) * dwiny).sum()) * FLT_SCALE
            a22 = float((dwiny.astype(np.float64) ** 2).sum()) * FLT_SCALE
            det = a11 * a22 - a12 * a12
            min_eig = (a22 + a11 - np.sqrt((a11 - a22) ** 2 + 4 * a12 ** 2)
                       ) / (2 * wwin * hwin)
            if min_eig < min_eig_threshold or det < 1e-7:
                if level == 0:
                    status = False
                next_pt = nxt + half
                continue
            inv_det = 1.0 / det

            Ji = J.astype(np.int32)
            prev_delta = np.array([0.0, 0.0])
            for j in range(iters):
                inx, iny = int(np.floor(nxt[0])), int(np.floor(nxt[1]))
                if inx < -wwin or inx >= lw or iny < -hwin or iny >= lh:
                    if level == 0:
                        status = False
                    break
                ja, jb = nxt[0] - inx, nxt[1] - iny
                jw00 = int(round((1 - ja) * (1 - jb) * (1 << W_BITS)))
                jw01 = int(round(ja * (1 - jb) * (1 << W_BITS)))
                jw10 = int(round((1 - ja) * jb * (1 << W_BITS)))
                jw11 = (1 << W_BITS) - jw00 - jw01 - jw10
                ys2 = hwin + iny + np.arange(hwin)[:, None]
                xs2 = wwin + inx + np.arange(wwin)[None, :]
                jwin = _descale(Ji[ys2, xs2] * jw00 +
                                Ji[ys2, xs2 + 1] * jw01 +
                                Ji[ys2 + 1, xs2] * jw10 +
                                Ji[ys2 + 1, xs2 + 1] * jw11, W_BITS - 5)
                diff = (jwin - iwin).astype(np.float64)
                b1 = float((diff * dwinx).sum()) * FLT_SCALE
                b2 = float((diff * dwiny).sum()) * FLT_SCALE
                delta = np.array([a12 * b2 - a22 * b1,
                                  a12 * b1 - a11 * b2]) * inv_det
                nxt = nxt + delta
                if (delta ** 2).sum() <= eps2:
                    break
                if j > 0 and abs(delta[0] + prev_delta[0]) < 0.01 and \
                   abs(delta[1] + prev_delta[1]) < 0.01:
                    nxt = nxt - delta * 0.5
                    break
                prev_delta = delta
            next_pt = nxt + half
        out_pts[ptidx] = next_pt
        out_st[ptidx] = status
    return out_pts, out_st
