"""Mean-flow subtraction, jitter stabilization, and temporal flow averaging.

Rewrites of subtructAverage (ripcurrents_module.cpp:810-898),
subtructMeanMagnitude (:900-1015), stabilizer (:279-308), averageVector
(:365-484) and averageHSV (:365-376), plus the sliding-window mean used by
compute_subtructAverageVectorWithWindow (main.cpp:1143-1153).

Ring buffers become fixed-size arrays in scan carries; the incremental
"average -= old/N; average += new/N" update is kept so numerics track the
reference (including its float drift characteristics).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ripcurrents_tpu.config import BUFFER_FRAME, GRID_COUNT
from ripcurrents_tpu.dynamics.advect import delta_field


def subtract_average(flow: jax.Array) -> jax.Array:
    """Remove the global mean flow vector (subtructAverage)."""
    return flow - flow.reshape(-1, 2).mean(axis=0)


def subtract_mean_magnitude(flow: jax.Array) -> jax.Array:
    """Shrink each vector along its direction by the mean magnitude
    (subtructMeanMagnitude)."""
    mag = jnp.sqrt(jnp.sum(flow * flow, axis=-1, keepdims=True))
    mean_mag = mag.mean()
    unit = jnp.where(mag > 0, flow / jnp.maximum(mag, 1e-20), 0.0)
    return unit * (mag - mean_mag)


def stabilize_flow(flow: jax.Array, strength: float = 0.2) -> jax.Array:
    """stabilizer (ripcurrents_module.cpp:279-308): estimate camera jitter
    from the flow of the bottom-right 10% block (assumed static beach)
    and subtract `strength` x that estimate from every nonzero component.

    Faithful quirk: the reference divides the BLOCK-WIDE component sums
    by a single dimension only (sum_x / n_cols, sum_y / n_rows,
    ripcurrents_module.cpp:295-296), not by the pixel count — its
    'mean' is the true mean scaled by the other dimension. Replicated
    as-is (the function is dead code in the reference — declared at
    ripcurrents.hpp:42, never called — so the quirk has no behavioral
    consumers there either)."""
    h, w = flow.shape[0], flow.shape[1]
    block = flow[int(h * 0.9):, int(w * 0.9):]
    n_rows, n_cols = block.shape[0], block.shape[1]
    s = block.reshape(-1, 2).sum(axis=0)
    mean = jnp.stack([s[0] / n_cols, s[1] / n_rows])
    adj = flow - mean * strength
    return jnp.where(flow != 0, adj, flow)


class RingMean(NamedTuple):
    """Sliding-window mean over the last `capacity` frames."""
    buffer: jax.Array   # (capacity, ...) past entries
    mean: jax.Array     # (...) running mean
    index: jax.Array    # () int32 next slot


def ring_init(capacity: int, shape, dtype=jnp.float32) -> RingMean:
    return RingMean(jnp.zeros((capacity,) + tuple(shape), dtype),
                    jnp.zeros(shape, dtype), jnp.array(0, jnp.int32))


def ring_update(state: RingMean, value: jax.Array) -> RingMean:
    """mean -= buf[i]/N; buf[i] = value; mean += value/N; i = (i+1)%N."""
    n = state.buffer.shape[0]
    old = state.buffer[state.index]
    mean = state.mean - old / n + value / n
    buf = state.buffer.at[state.index].set(value)
    return RingMean(buf, mean, (state.index + 1) % n)


class AverageVectorState(NamedTuple):
    ring: RingMean          # of per-pixel advection deltas
    max_displacement: jax.Array  # () running max magnitude (prev frame)


def average_vector_init(h: int, w: int,
                        capacity: int = BUFFER_FRAME) -> AverageVectorState:
    return AverageVectorState(ring_init(capacity, (h, w, 2)),
                              jnp.array(1e-6, jnp.float32))


class AverageVectorOut(NamedTuple):
    state: AverageVectorState
    hsv_u8: jax.Array        # (H, W, 3) uint8 HSV of the averaged field
    global_angle_rad: jax.Array
    grid_angle_deg: jax.Array   # (GRID_COUNT, GRID_COUNT) mean angle per cell
    counter_mask: jax.Array     # (GRID_COUNT, GRID_COUNT) bool — rip arrows


def average_vector(state: AverageVectorState, flow: jax.Array, upper,
                   dt: float = 2.0,
                   grid_count: int = GRID_COUNT) -> AverageVectorOut:
    """averageVector (ripcurrents_module.cpp:386-484): ring-mean of advection
    deltas -> HSV field + per-grid-cell mean angle; cells whose angle
    deviates more than 0.7*pi from the global mean get counter-flow (rip)
    arrows."""
    delta = delta_field(flow, dt, upper)
    ring = ring_update(state.ring, delta)
    avg = ring.mean

    theta = jnp.arctan2(avg[..., 1], avg[..., 0]) * (180.0 / jnp.pi)
    theta = jnp.where(theta < 0, theta + 360.0, theta)
    mag = jnp.sqrt(jnp.sum(avg * avg, axis=-1))
    hue = theta / 2.0
    val = mag * 255.0 / state.max_displacement
    hsv = jnp.stack([jnp.clip(hue, 0, 255),
                     jnp.full_like(hue, 255.0),
                     jnp.clip(val, 0, 255)], axis=-1).astype(jnp.uint8)

    new_max = jnp.maximum(jnp.max(mag), 1e-6)
    gtheta = jnp.sum(hue * val)
    gmag = jnp.sum(val)
    global_angle = gtheta * 2.0 / jnp.maximum(gmag, 1e-6) * jnp.pi / 180.0

    h, w = flow.shape[0], flow.shape[1]
    ch, cw = h // grid_count, w // grid_count
    cells = theta[:ch * grid_count, :cw * grid_count].reshape(
        grid_count, ch, grid_count, cw)
    grid_angle = cells.sum(axis=(1, 3)) / (ch * cw)

    grid_rad = grid_angle * jnp.pi / 180.0
    diff = jnp.abs(grid_rad - global_angle)
    between = jnp.minimum(diff, 2 * jnp.pi - diff)
    counter = between > jnp.pi * 0.7

    return AverageVectorOut(
        AverageVectorState(ring, new_max), hsv, global_angle,
        grid_angle, counter)


def average_hsv_update(state: RingMean, frame_hsv: jax.Array) -> RingMean:
    """averageHSV (ripcurrents_module.cpp:365-376): ring mean of HSV frames
    over BUFFER_FRAME entries; the buffer stores frame/N."""
    return ring_update(state, frame_hsv.astype(jnp.float32))


def timex_update(sum_rgb: jax.Array, frame_bgr_u8: jax.Array):
    """compute_timex (main.cpp:1195-1263): running mean of raw RGB."""
    s = sum_rgb + frame_bgr_u8.astype(jnp.float32)
    return s


def bright_color_reduce(buffer_hsv_u8: jax.Array, option: int) -> jax.Array:
    """compute_brightColor (main.cpp:1265-1382) over a (T, H, W, 3) HSV
    buffer: option 0 = mean, 1 = pixel of max V, 2 = pixel of min V.

    Option 0 replicates the reference's u8 Mat arithmetic exactly
    (main.cpp:1313,1326): each buffer[i]/windowSize saturate-ROUNDS to
    uint8 (cvRound, half-to-even) BEFORE the += accumulation, so the
    'average' is a sum of per-frame rounded quotients, not a rounded
    float mean. For nonnegative addends the per-step u8 saturation
    equals one final clip."""
    if option == 0:
        n = buffer_hsv_u8.shape[0]
        q = jnp.clip(jnp.round(buffer_hsv_u8.astype(jnp.float32) / n),
                     0, 255)
        return jnp.clip(jnp.sum(q, axis=0), 0, 255).astype(jnp.uint8)
    v = buffer_hsv_u8[..., 2].astype(jnp.int32)
    idx = jnp.argmax(v, axis=0) if option == 1 else jnp.argmin(v, axis=0)
    return jnp.take_along_axis(
        buffer_hsv_u8, idx[None, ..., None], axis=0)[0]
