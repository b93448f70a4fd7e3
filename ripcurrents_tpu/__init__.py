"""ripcurrents_tpu — a TPU-native (JAX/XLA/Pallas) video optical-flow engine.

A ground-up rebuild of the capabilities of the reference rip-current detector
(borgor/ripcurrents, C++/OpenCV) as an idiomatic JAX framework:

- dense Farneback optical flow and pyramidal Lucas-Kanade sparse flow as
  jit-compiled XLA/Pallas programs (reference: OpenCV built-ins invoked from
  RipCurrents_main/main.cpp and ripcurrents_module.cpp),
- the flow-analysis library (histogram thresholds, classification, temporal
  accumulation, morphology, mean-flow subtraction, shear rate; reference:
  RipCurrents_main/ripcurrents_module.cpp) as pure-functional jnp ops,
- particle advection (streamlines / streaklines / timelines / population maps)
  as batched integrators under vmap/scan,
- every reference mode (RipCurrents_main/main.cpp:92-1775) as a `lax.scan`
  pipeline with an explicit state pytree,
- multi-stream scale-out via jax.sharding meshes.

Layout:
    ops/        low-level image + array ops (resize, color, polar, hist, morph)
    flow/       optical-flow engines (farneback, lucas_kanade, phasecorr)
    dynamics/   particle advection and particle-system states
    analysis/   rip-current analysis library
    viz/        colorization, overlays, drawing
    pipelines/  per-mode scan pipelines + stream runner
    parallel/   device-mesh sharding helpers
    io/         host video decode/encode rim
"""

__version__ = "0.1.0"

from ripcurrents_tpu.config import (  # noqa: F401
    XDIM,
    YDIM,
    FarnebackParams,
    LKParams,
    HistogramParams,
    Thresholds,
)
