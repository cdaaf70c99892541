"""ctypes bindings for the native host runtime (``native/fluidhost.cpp``).

Builds the shared library on first use (g++ is in the image; pybind11 is
not, hence the plain C ABI + ctypes).  See fluidhost.cpp for the mapping to
the reference's FreeRTOS primitives.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfluidhost.so"))
_build_lock = threading.Lock()
_lib = None


class _Drag(ctypes.Structure):
    _fields_ = [("i", ctypes.c_int32), ("j", ctypes.c_int32),
                ("vi", ctypes.c_float), ("vj", ctypes.c_float)]


def _build():
    subprocess.run(["make", "-s", "libfluidhost.so"],
                   cwd=os.path.abspath(_NATIVE_DIR), check=True)


def load_library() -> ctypes.CDLL:
    """Build (if needed) and load libfluidhost.so."""
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "fluidhost.cpp")
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)

        lib.fh_queue_create.restype = ctypes.c_void_p
        lib.fh_queue_create.argtypes = [ctypes.c_uint32]
        lib.fh_queue_destroy.argtypes = [ctypes.c_void_p]
        lib.fh_queue_try_push.restype = ctypes.c_int
        lib.fh_queue_try_push.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float]
        lib.fh_queue_drain.restype = ctypes.c_int
        lib.fh_queue_drain.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(_Drag), ctypes.c_int]
        lib.fh_queue_dropped.restype = ctypes.c_uint64
        lib.fh_queue_dropped.argtypes = [ctypes.c_void_p]

        lib.fh_handshake_create.restype = ctypes.c_void_p
        lib.fh_handshake_destroy.argtypes = [ctypes.c_void_p]
        for name in ("fh_producer_acquire", "fh_consumer_acquire"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.fh_producer_publish.argtypes = [ctypes.c_void_p]
        lib.fh_consumer_release.argtypes = [ctypes.c_void_p]

        lib.fh_pacer_create.restype = ctypes.c_void_p
        lib.fh_pacer_create.argtypes = [ctypes.c_double]
        lib.fh_pacer_destroy.argtypes = [ctypes.c_void_p]
        lib.fh_pacer_wait.restype = ctypes.c_int
        lib.fh_pacer_wait.argtypes = [ctypes.c_void_p]

        lib.fh_rgb565_to_rgb888.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int]
        _lib = lib
    return _lib


class DragQueue:
    """Bounded lossy SPSC drag queue (``xQueueCreate(10, ...)``, .ino:49)."""

    def __init__(self, capacity: int = 10):
        self._lib = load_library()
        self._q = self._lib.fh_queue_create(capacity)

    def try_push(self, i: int, j: int, vi: float, vj: float) -> bool:
        return bool(self._lib.fh_queue_try_push(self._q, i, j, vi, vj))

    def drain(self, max_n: int = 64):
        buf = (_Drag * max_n)()
        n = self._lib.fh_queue_drain(self._q, buf, max_n)
        return [(buf[k].i, buf[k].j, buf[k].vi, buf[k].vj) for k in range(n)]

    @property
    def dropped(self) -> int:
        return int(self._lib.fh_queue_dropped(self._q))

    def __del__(self):
        try:
            self._lib.fh_queue_destroy(self._q)
        except Exception:
            pass


class FrameHandshake:
    """1-slot producer/consumer rendezvous (color semaphores, .ino:58-59)."""

    def __init__(self):
        self._lib = load_library()
        self._h = self._lib.fh_handshake_create()

    def producer_acquire(self, timeout_ms: int = -1) -> bool:
        return bool(self._lib.fh_producer_acquire(self._h, timeout_ms))

    def producer_publish(self):
        self._lib.fh_producer_publish(self._h)

    def consumer_acquire(self, timeout_ms: int = -1) -> bool:
        return bool(self._lib.fh_consumer_acquire(self._h, timeout_ms))

    def consumer_release(self):
        self._lib.fh_consumer_release(self._h)

    def __del__(self):
        try:
            self._lib.fh_handshake_destroy(self._h)
        except Exception:
            pass


class FramePacer:
    """Absolute-deadline frame pacing (.ino:16,94)."""

    def __init__(self, fps: float):
        self._lib = load_library()
        self._p = self._lib.fh_pacer_create(fps)

    def wait(self) -> int:
        """Sleep to the next deadline; returns missed periods."""
        return self._lib.fh_pacer_wait(self._p)

    def __del__(self):
        try:
            self._lib.fh_pacer_destroy(self._p)
        except Exception:
            pass


def rgb565_to_rgb888(frame: np.ndarray, swapped: bool = True) -> np.ndarray:
    """Native RGB565 -> RGB888 (the display path of .ino:164-176, inverted)."""
    lib = load_library()
    frame = np.ascontiguousarray(frame, dtype=np.uint16)
    out = np.empty(frame.shape + (3,), np.uint8)
    lib.fh_rgb565_to_rgb888(
        frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        frame.size, 1 if swapped else 0)
    return out
