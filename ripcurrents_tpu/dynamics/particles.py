"""LK-tracked particle systems: Streakline, Timeline, PopulationMap.

Functional state pytrees replacing the reference classes
(Streakline.hpp/Streakline.cpp, Timeline: ripcurrents_module.cpp:751-807,
PopulationMap: :1140-1196). Each `step` takes the previous/current gray
frames, tracks vertices with pyramidal LK, and returns the new state.
Capacities are static so states scan/vmap cleanly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ripcurrents_tpu.config import LKParams, XDIM, YDIM
from ripcurrents_tpu.flow.lucas_kanade import pyr_lk


class StreaklineState(NamedTuple):
    """A growing chain of vertices; one new vertex is emitted at the
    generation point every frame (Streakline.cpp:45-48)."""
    gen_point: jax.Array   # (2,)
    vertices: jax.Array    # (capacity, 2); slot 0 is newest
    count: jax.Array       # () int32 — live vertices


def streakline_init(gen_point, capacity: int) -> StreaklineState:
    gp = jnp.asarray(gen_point, jnp.float32)
    verts = jnp.tile(gp[None], (capacity, 1))
    return StreaklineState(gp, verts, jnp.array(1, jnp.int32))


def streakline_advance(state: StreaklineState, tracked: jax.Array,
                       xdim: int = XDIM, ydim: int = YDIM) -> StreaklineState:
    """Apply pre-tracked vertex positions (lets the pipeline run one shared
    pyr_lk call over the vertices of many particle systems)."""
    # Large jumps (>10% of frame dims) are rejected (Streakline.cpp:34-40).
    jump = jnp.abs(tracked - state.vertices)
    bad = (jump[:, 0] > xdim * 0.1) | (jump[:, 1] > ydim * 0.1)
    tracked = jnp.where(bad[:, None], state.vertices, tracked)
    verts = jnp.concatenate([state.gen_point[None], tracked[:-1]], axis=0)
    count = jnp.minimum(state.count + 1, state.vertices.shape[0])
    return StreaklineState(state.gen_point, verts, count)


def streakline_step(state: StreaklineState, prev_gray, cur_gray,
                    p: LKParams = LKParams.particles(),
                    xdim: int = XDIM, ydim: int = YDIM) -> StreaklineState:
    """Standalone Streakline::runLK for ONE system (tracks + advances);
    pipelines tracking many systems batch one shared pyr_lk call and use
    streakline_advance directly."""
    res = pyr_lk(prev_gray, cur_gray, state.vertices, p)
    return streakline_advance(state, res.points, xdim, ydim)


class TimelineState(NamedTuple):
    vertices: jax.Array  # (n+1, 2)


def timeline_init(line_start, line_end, num_vertices: int) -> TimelineState:
    """Interpolates num_vertices+1 points along the segment
    (ripcurrents_module.cpp:751-763)."""
    s = jnp.asarray(line_start, jnp.float32)
    e = jnp.asarray(line_end, jnp.float32)
    t = jnp.arange(num_vertices + 1, dtype=jnp.float32)[:, None]
    return TimelineState(s + (e - s) / num_vertices * t)


def timeline_step(state: TimelineState, prev_gray, cur_gray,
                  p: LKParams = LKParams.particles()) -> TimelineState:
    res = pyr_lk(prev_gray, cur_gray, state.vertices, p)
    return TimelineState(res.points)


class PopulationState(NamedTuple):
    vertices: jax.Array  # (n, 2)


def population_init(rect_start, rect_end, num_vertices: int, key,
                    faithful_bias: bool = True) -> PopulationState:
    """Random points for the dispersal map (ripcurrents_module.cpp:1140-1151).

    faithful_bias=True replicates the reference's off-by-one quirk
    (rand()/RAND_MAX + 1), which lands points in
    [rect_end, 2*rect_end - rect_start] instead of inside the rectangle.
    """
    s = jnp.asarray(rect_start, jnp.float32)
    e = jnp.asarray(rect_end, jnp.float32)
    u = jax.random.uniform(key, (num_vertices, 2))
    if faithful_bias:
        u = u + 1.0
    return PopulationState(s + (e - s) * u)


def population_step(state: PopulationState, prev_gray, cur_gray,
                    p: LKParams = LKParams.particles()) -> PopulationState:
    res = pyr_lk(prev_gray, cur_gray, state.vertices, p)
    return PopulationState(res.points)
