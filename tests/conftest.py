"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (the standard
xla_force_host_platform_device_count trick; SURVEY.md section 4). Golden
tests compare against opencv-python.

Note: this image's sitecustomize imports jax at interpreter startup (axon
TPU plugin), so env vars alone are too late — we also flip the platform via
jax.config before any backend is initialized.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    """Fresh deterministic generator per test: results cannot depend on
    which tests ran before (the round-1 session-scoped fixture made the
    suite order-dependent)."""
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def _session_rng():
    return np.random.default_rng(20260816)


@pytest.fixture(scope="session")
def beach_frames(_session_rng):
    rng = _session_rng
    """Synthetic 'beach cam' clip: textured background + moving wave bands.

    Returns uint8 (T, H, W, 3) BGR frames with real apparent motion so
    optical-flow goldens are meaningful.
    """
    t_, h, w = 8, 120, 160
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = rng.uniform(0, 255, (h, w)).astype(np.float32)
    # Smooth the noise so gradients are informative.
    k = np.ones(5) / 5
    for axis in (0, 1):
        base = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), axis, base)
    frames = []
    for t in range(t_):
        phase = 2 * np.pi * (yy / 24.0 - t * 0.11)
        wave = 60.0 * np.sin(phase) * (yy / h)
        drift = np.roll(base, shift=int(t * 1.0), axis=1)
        g = np.clip(drift * 0.7 + wave + 60, 0, 255)
        frame = np.stack([g * 0.9, g, np.clip(g * 1.1, 0, 255)], axis=-1)
        frames.append(frame.astype(np.uint8))
    return np.stack(frames)
