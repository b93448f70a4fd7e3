"""ctypes bindings for the native frame pump (native/framepump.cpp).

The pump runs OpenCV-compatible fixed-point resize + grayscale on N host
threads with ordered delivery, replacing the reference's serial per-frame
prep (main.cpp:142-144) on the decode path. Falls back to the JAX prep ops
when the shared library has not been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libframepump.so"),
    os.path.join(os.path.dirname(__file__), "..", "assets",
                 "libframepump.so"),
]

_lib = None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        if os.path.exists(p):
            lib = ctypes.CDLL(os.path.abspath(p))
            lib.fp_create.restype = ctypes.c_void_p
            lib.fp_create.argtypes = [ctypes.c_int] * 6
            lib.fp_push.restype = ctypes.c_int
            lib.fp_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.fp_pop_batch.restype = ctypes.c_int
            lib.fp_pop_batch.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_void_p, ctypes.c_int]
            lib.fp_close.argtypes = [ctypes.c_void_p]
            lib.fp_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return load_library() is not None


class FramePump:
    """Ordered multithreaded resize+gray prep. push() raw frames, then
    pop_batch() prepared (resized BGR, gray) stacks."""

    def __init__(self, src_hw: tuple[int, int], dst_hw: tuple[int, int],
                 threads: int = 4, capacity: int = 32):
        lib = load_library()
        if lib is None:
            raise RuntimeError(
                "libframepump.so not built; run `make -C native`")
        self._lib = lib
        self.src_hw = src_hw
        self.dst_hw = dst_hw
        self._h = lib.fp_create(threads, src_hw[0], src_hw[1],
                                dst_hw[0], dst_hw[1], capacity)
        if not self._h:
            # a NULL handle passed back into fp_push would segfault the
            # whole process instead of raising
            raise RuntimeError("fp_create failed (threads/allocation)")

    def push(self, frame_bgr_u8: np.ndarray):
        f = np.ascontiguousarray(frame_bgr_u8, dtype=np.uint8)
        assert f.shape == (*self.src_hw, 3), f.shape
        ok = self._lib.fp_push(self._h, f.ctypes.data_as(ctypes.c_char_p))
        if not ok:
            raise RuntimeError("frame pump closed")

    def pop_batch(self, batch: int):
        dh, dw = self.dst_hw
        resized = np.empty((batch, dh, dw, 3), np.uint8)
        gray = np.empty((batch, dh, dw), np.uint8)
        n = self._lib.fp_pop_batch(
            self._h, resized.ctypes.data_as(ctypes.c_void_p),
            gray.ctypes.data_as(ctypes.c_void_p), batch)
        return resized[:n], gray[:n]

    def close(self):
        if self._h:
            self._lib.fp_close(self._h)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.fp_destroy(self._h)
            self._h = None
