"""Pallas warp kernel correctness in interpret mode (no TPU required)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ripcurrents_tpu.flow.farneback import _warp5_gather


def test_pallas_warp_matches_gather_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu
    from ripcurrents_tpu.flow import warp_pallas

    r1 = jnp.asarray(rng.uniform(-1, 1, (64, 256, 5)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-6, 6, (64, 256, 2)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = warp_pallas.warp5_shift_pallas(r1, flow, 8, th=32, tw=128)
    want, inside = _warp5_gather(r1, flow)
    m = np.asarray(inside)
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(want)[m],
                               atol=5e-5)
