from ripcurrents_tpu.flow.farneback import farneback  # noqa: F401
