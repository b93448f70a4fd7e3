"""Flow-magnitude histograms and threshold derivation.

TPU-native rewrite of create_histogram (ripcurrents_module.cpp:89-144) and
the android variant (jni/ripcurrents.cpp:195-213). The reference walks
pixels sequentially on the host; here binning is a vectorized scatter-add
and the "walk bins from the top until 5% of mass is covered" threshold
search becomes a reversed cumulative sum + argmax, all inside jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ripcurrents_tpu.config import HistogramParams


class FlowHistogram(NamedTuple):
    hist: jax.Array        # (bins,) int32 — 1-D magnitude histogram
    histsum: jax.Array     # () int32
    hist2d: jax.Array      # (directions, bins) int32
    histsum2d: jax.Array   # (directions,) int32


class FlowThresholds(NamedTuple):
    upper: jax.Array             # () f32 — global top-5% magnitude threshold
    upper2d: jax.Array           # (directions,) f32 — per-direction threshold
    prop_above_upper: jax.Array  # (directions,) f32


def bin_flow(mag: jax.Array, ang: jax.Array, p: HistogramParams) -> FlowHistogram:
    """Bin polar flow into 1-D and direction x magnitude histograms.

    mag/ang are any-shape arrays (angle in degrees [0, 360)).
    Only pixels whose magnitude bin falls in [0, bins) are counted
    (ripcurrents_module.cpp:101).
    """
    bins = (mag * p.resolution).astype(jnp.int32)
    # C float->int conversion truncates toward zero.
    dirs = (ang * p.directions / 360.0).astype(jnp.int32)
    dirs = jnp.clip(dirs, 0, p.directions - 1)
    valid = (bins >= 0) & (bins < p.bins)
    flat = jnp.where(valid, dirs * p.bins + jnp.clip(bins, 0, p.bins - 1),
                     p.directions * p.bins)  # overflow slot for invalid
    counts = jnp.zeros(p.directions * p.bins + 1, jnp.int32).at[flat.reshape(-1)].add(1)
    hist2d = counts[:-1].reshape(p.directions, p.bins)
    hist = hist2d.sum(axis=0)
    return FlowHistogram(hist, hist.sum(), hist2d, hist2d.sum(axis=1))


def accumulate(a: FlowHistogram, b: FlowHistogram) -> FlowHistogram:
    """Histograms accumulate across frames in the legacy pipeline
    (ripcurrents.cpp:319-325 never resets them)."""
    return FlowHistogram(a.hist + b.hist, a.histsum + b.histsum,
                         a.hist2d + b.hist2d, a.histsum2d + b.histsum2d)


def _top_frac_bin(hist: jax.Array, total: jax.Array, frac: float) -> jax.Array:
    """Index `bin` after the reference loop
        while (threshsum < total*frac) { threshsum += hist[bin]; bin--; }
    i.e. (bins-1) - (number of top bins needed to cover frac of total).
    """
    bins = hist.shape[0]
    rc = jnp.cumsum(hist[::-1])
    target = total.astype(jnp.float32) * frac
    # number of additions performed = first k (1-based) with rc[k-1] >= target
    reached = rc.astype(jnp.float32) >= target
    k = jnp.where(jnp.any(reached), jnp.argmax(reached) + 1, bins)
    # an empty histogram (target == 0) runs the reference's strict-<
    # while loop ZERO times: bin stays bins-1 (routine for directions
    # no pixel moved toward — e.g. uniform flow fills 1 of 36)
    k = jnp.where(target > 0, k, 0)
    return bins - 1 - k


def thresholds(h: FlowHistogram, p: HistogramParams) -> FlowThresholds:
    """Derive UPPER, UPPER2d and prop_above_upper exactly as
    create_histogram does (ripcurrents_module.cpp:109-143)."""
    target_bin = _top_frac_bin(h.hist, h.histsum, p.top_frac)
    upper = target_bin.astype(jnp.float32) / p.resolution

    # threshsum: mass of bins strictly above target_bin in the 1-D hist
    bins = p.bins
    bin_ids = jnp.arange(bins)
    threshsum = jnp.sum(jnp.where(bin_ids > target_bin, h.hist, 0))

    per_dir_bin = jax.vmap(lambda hd, sd: _top_frac_bin(hd, sd, p.top_frac))(
        h.hist2d, h.histsum2d)
    upper2d = jnp.maximum(per_dir_bin.astype(jnp.float32) / p.resolution,
                          p.upper2d_floor)

    above = jnp.sum(jnp.where(bin_ids[None, :] > target_bin, h.hist2d, 0), axis=1)
    prop = above.astype(jnp.float32) / jnp.maximum(threshsum.astype(jnp.float32), 1.0)
    return FlowThresholds(upper, upper2d, prop)


def bin_1d(mag: jax.Array, p: HistogramParams):
    """One frame's 1-D magnitude histogram (jni/ripcurrents.cpp:195-203).
    Returns (hist (bins,) int32, histsum () int32)."""
    bins = (mag * p.resolution).astype(jnp.int32)
    valid = (bins >= 0) & (bins < p.bins)
    flat = jnp.where(valid, jnp.clip(bins, 0, p.bins - 1), p.bins)
    hist = jnp.zeros(p.bins + 1, jnp.int32).at[flat.reshape(-1)].add(1)[:-1]
    return hist, hist.sum()


def upper_from_1d(hist: jax.Array, histsum: jax.Array,
                  p: HistogramParams) -> jax.Array:
    """Top-frac threshold walk on a (possibly cumulative) 1-D histogram
    (jni/ripcurrents.cpp:206-213)."""
    b = _top_frac_bin(hist, histsum, p.top_frac)
    return b.astype(jnp.float32) / p.resolution


def upper_1d(mag: jax.Array, p: HistogramParams) -> jax.Array:
    """Single-frame histogram threshold (bin_1d + upper_from_1d)."""
    hist, histsum = bin_1d(mag, p)
    return upper_from_1d(hist, histsum, p)
