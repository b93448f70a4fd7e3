"""Advection tests, including the synthetic circular-field validator that is
the reference's only correctness check (validate_streamlines,
main.cpp:303-443), promoted to an automated test with analytic bounds."""

import jax.numpy as jnp
import numpy as np

from ripcurrents_tpu.dynamics import advect


def test_circular_field_orbit():
    """A particle in the analytic field orbits the frame center. The field
    (main.cpp:374-380) is anisotropic (dx ~ -v/H, dy ~ u/W), so the orbit is
    elliptical with conserved E = H*u^2 + W*v^2; Euler drift of sqrt(E) must
    stay within a few percent over the full integration."""
    h, w = 480, 640
    flow = advect.circular_field(h, w)
    res = advect.streamline(jnp.array([200.0, 200.0]), flow,
                            dt=0.03, iterations=3500)
    pts = np.asarray(res.points)
    u = pts[:, 0] - w / 2.0
    v = pts[:, 1] - h / 2.0
    e = np.sqrt(h * u * u + w * v * v)
    assert res.seg_valid.all()
    assert abs(e.max() - e[0]) / e[0] < 0.07
    assert abs(e.min() - e[0]) / e[0] < 0.07
    # and the particle must actually sweep a large angle
    ang = np.unwrap(np.arctan2(v, u))
    assert abs(ang[-1] - ang[0]) > np.pi


def test_streamline_stops_out_of_bounds():
    flow = jnp.ones((40, 60, 2), jnp.float32) * 5.0
    res = advect.streamline(jnp.array([50.0, 30.0]), flow, dt=1.0,
                            iterations=20)
    pts = np.asarray(res.points)
    assert not np.asarray(res.seg_valid).all()
    stopped = np.asarray(res.final)
    # once out of the valid sample region the particle freezes
    assert (pts[-1] == stopped).all()
    assert stopped[0] <= 60 + 5 and stopped[1] <= 40 + 5


def test_streamline_upper_threshold_stop():
    flow = jnp.ones((40, 60, 2), jnp.float32) * 3.0  # |delta| = 4.24
    res = advect.streamline(jnp.array([10.0, 10.0]), flow, dt=1.0,
                            iterations=5, upper=4.0)
    assert not np.asarray(res.seg_valid).any()
    np.testing.assert_array_equal(np.asarray(res.final), [10.0, 10.0])


def test_streamline_field_matches_pointwise():
    """Dense field advection agrees with per-point advection."""
    rng = np.random.default_rng(0)
    flow = jnp.asarray(rng.normal(size=(30, 40, 2)).astype(np.float32))
    state = advect.init_field(30, 40)
    state = advect.streamline_field(state, flow, dt=2.0, iterations=1,
                                    upper=100.0)
    # check one interior pixel against sample_flow
    y, x = 15, 20
    d, valid = advect.sample_flow(flow, jnp.array(float(x)),
                                  jnp.array(float(y)))
    np.testing.assert_allclose(np.asarray(state.disp)[y, x],
                               np.asarray(d) * 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state.dist)[y, x],
                               np.linalg.norm(np.asarray(d)), rtol=1e-5)


def test_bilinear_sample_matches_reference_rule():
    flow = jnp.zeros((20, 20, 2), jnp.float32)
    # reference bounds: floor(x) must be in [1, W-2]
    for x, ok in [(0.5, False), (1.0, True), (17.9, True), (18.0, True),
                  (18.5, True), (19.0, False)]:
        _, valid = advect.sample_flow(flow, jnp.array(x), jnp.array(10.0))
        assert bool(valid) == ok, x
