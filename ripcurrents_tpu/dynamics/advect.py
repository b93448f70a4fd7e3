"""Particle advection through flow fields.

Functional rewrites of the reference advection family
(ripcurrents_module.cpp): streamline (:486-528), streamline_2 (:531-569),
streamline_3 (:572-606), streamline_field (:608-648), get_delta (:650-679)
and the synthetic-field validator (main.cpp:303-443).

The reference advances one particle at a time on the host with early
returns; here a particle is a lane of a vmap/scan program with a sticky
`active` flag — the whole seed population advances in one fused XLA
program, and the dense per-pixel variant advances every pixel of the frame
at once.

Conventions: points are (x, y) float32; flow is (H, W, 2). The reference's
bounds rule is kept exactly: a sample at floor(x) outside [1, W-2] (or
floor(y) outside [1, H-2]) stops the particle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def sample_flow(flow: jax.Array, x: jax.Array, y: jax.Array):
    """Bilinear flow lookup with the reference's bounds rule.

    Returns (delta, valid) where delta is 0 when invalid. Shapes follow x/y.
    """
    h, w = flow.shape[0], flow.shape[1]
    xi = jnp.floor(x)
    yi = jnp.floor(y)
    valid = (xi >= 1) & (yi >= 1) & (xi + 2 <= w) & (yi + 2 <= h)
    xr = (x - xi)[..., None]
    yr = (y - yi)[..., None]
    xc = jnp.clip(xi.astype(jnp.int32), 0, w - 2)
    yc = jnp.clip(yi.astype(jnp.int32), 0, h - 2)
    d = (flow[yc, xc] * (1 - xr) * (1 - yr) +
         flow[yc, xc + 1] * xr * (1 - yr) +
         flow[yc + 1, xc] * (1 - xr) * yr +
         flow[yc + 1, xc + 1] * xr * yr)
    return jnp.where(valid[..., None], d, 0.0), valid


class StreamlineResult(NamedTuple):
    points: jax.Array     # (iters+1, 2) visited positions (frozen when stopped)
    final: jax.Array      # (2,) final position
    seg_valid: jax.Array  # (iters,) bool — segment i..i+1 was actually stepped


def streamline(pt0: jax.Array, flow: jax.Array, dt: float, iterations: int,
               upper: jax.Array | float = jnp.inf,
               speed_cap: float | None = None) -> StreamlineResult:
    """Euler-advect one seed; stops out-of-bounds or when |delta| > upper.

    speed_cap models streamline_2's fixed `r > 5` stop; `upper` the
    UPPER-threshold stop of streamline/streamline_field.
    """
    cap = jnp.inf if speed_cap is None else speed_cap

    def step(carry, _):
        pt, active = carry
        d, valid = sample_flow(flow, pt[0], pt[1])
        r = jnp.sqrt(jnp.sum(d * d))
        ok = active & valid & (r <= upper) & (r <= cap)
        new_pt = jnp.where(ok, pt + d * dt, pt)
        return (new_pt, ok), (new_pt, ok)

    (final, _), (pts, ok) = jax.lax.scan(
        step, (pt0.astype(jnp.float32), jnp.array(True)), None,
        length=iterations)
    return StreamlineResult(jnp.concatenate([pt0[None], pts], axis=0),
                            final, ok)


def streamlines(pts0: jax.Array, flow: jax.Array, dt: float, iterations: int,
                upper=jnp.inf, speed_cap=None):
    """vmap of :func:`streamline` over (N, 2) seeds."""
    return jax.vmap(lambda p: streamline(p, flow, dt, iterations, upper,
                                         speed_cap))(pts0)


class FieldState(NamedTuple):
    disp: jax.Array   # (H, W, 2) displacement of each pixel's particle
    dist: jax.Array   # (H, W) accumulated path length


def init_field(h: int, w: int) -> FieldState:
    return FieldState(jnp.zeros((h, w, 2), jnp.float32),
                      jnp.zeros((h, w), jnp.float32))


def streamline_field(state: FieldState, flow: jax.Array, dt: float,
                     iterations: int, upper) -> FieldState:
    """Advance every pixel's particle through `flow`
    (ripcurrents_module.cpp:608-648; invoked per frame with dt=2,
    iterations=1 from ripcurrents.cpp:229-231).

    disp stores displacement relative to the pixel's origin; the absolute
    position is disp + (x, y).
    """
    h, w = flow.shape[0], flow.shape[1]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    disp, dist = state

    for _ in range(iterations):
        d, valid = sample_flow(flow, disp[..., 0] + xs, disp[..., 1] + ys)
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        ok = valid & (r <= upper)
        disp = jnp.where(ok[..., None], disp + d * (dt / iterations), disp)
        dist = jnp.where(ok, dist + r, dist)
    return FieldState(disp, dist)


def get_delta(pts: jax.Array, flow: jax.Array, dt: float, upper) -> jax.Array:
    """One advection step for arbitrary points, frozen when |delta| > upper
    (ripcurrents_module.cpp:650-679)."""
    d, valid = sample_flow(flow, pts[..., 0], pts[..., 1])
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))
    ok = valid & (r <= upper)
    return jnp.where(ok[..., None], pts + d * dt, pts)


def delta_field(flow: jax.Array, dt: float, upper) -> jax.Array:
    """averageVector's per-pixel displacement buffer: advect every pixel
    origin one step (ripcurrents_module.cpp:393-397). Returns (H, W, 2)
    displacement."""
    h, w = flow.shape[0], flow.shape[1]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    d, valid = sample_flow(flow, xs, ys)
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))
    ok = valid & (r <= upper)
    return jnp.where(ok[..., None], d * dt, 0.0)


def circular_field(h: int, w: int) -> jax.Array:
    """The synthetic validation field of validate_streamlines
    (main.cpp:374-380): flow.x = -(row - H/2)/H * 100, flow.y = (col - W/2)/W * 100."""
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    fx = -(ys - h / 2.0) / h * 100.0
    fy = (xs - w / 2.0) / w * 100.0
    return jnp.stack([fx, fy], axis=-1)
