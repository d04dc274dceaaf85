"""Native (C++) runtime components, built on demand with the system g++.

Currently: ``FrameSink`` — an asynchronous frame-streaming pipeline (ring
buffer + writer thread) that persists rasterized frames off the simulation
loop's critical path.  See framesink.cpp for the design rationale vs the
reference's blocking readback FSM.

No pip/pybind dependency: a single g++ -shared build, cached by source hash,
loaded via ctypes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "framesink.cpp")


def _build(force: bool = False) -> str:
    """Compile (or reuse) the hash-named shared object.  Binaries are never
    committed (gitignored): the first use on any host compiles for THAT
    host."""
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_HERE, f"_framesink_{tag}.so")
    if force or not os.path.exists(out):
        tmp = out + ".tmp"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
             _SRC, "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, out)
    return out


_lib = None


def _dlopen():
    try:
        return ctypes.CDLL(_build())
    except OSError:
        # a stale/foreign-arch binary slipped in: rebuild from source
        return ctypes.CDLL(_build(force=True))


def _load():
    global _lib
    if _lib is None:
        lib = _dlopen()
        lib.fs_create.restype = ctypes.c_void_p
        lib.fs_create.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int]
        lib.fs_push.restype = ctypes.c_int
        lib.fs_push.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_uint8),
                                ctypes.c_long]
        for name in ("fs_pending", "fs_dropped", "fs_written"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_long
            fn.argtypes = [ctypes.c_void_p]
        lib.fs_flush.argtypes = [ctypes.c_void_p]
        lib.fs_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class FrameSink:
    """Asynchronous PPM frame writer.

    >>> sink = FrameSink("/tmp/frames", width=512, height=256)
    >>> sink.push(rgb8_numpy_array)     # returns immediately
    >>> sink.close()                    # drains the queue
    """

    def __init__(self, out_dir: str, width: int, height: int,
                 slots: int = 8):
        os.makedirs(out_dir, exist_ok=True)
        self._lib = _load()
        self._h = self._lib.fs_create(out_dir.encode(), width, height, slots)
        self.width, self.height = width, height
        self._frame = 0
        self._final = None  # (written, dropped) after close

    def push(self, rgb8) -> bool:
        """Queue one [H, W, 3] uint8 frame; False if the ring was full and
        the frame was dropped (the sim loop is never blocked)."""
        arr = np.ascontiguousarray(np.asarray(rgb8), dtype=np.uint8)
        assert arr.shape == (self.height, self.width, 3), arr.shape
        ok = self._lib.fs_push(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._frame)
        self._frame += 1
        return ok == 0

    @property
    def pending(self) -> int:
        return self._lib.fs_pending(self._h) if self._h else 0

    @property
    def dropped(self) -> int:
        return self._final[1] if self._final else self._lib.fs_dropped(self._h)

    @property
    def written(self) -> int:
        return self._final[0] if self._final else self._lib.fs_written(self._h)

    def flush(self) -> None:
        if self._h:
            self._lib.fs_flush(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.fs_flush(self._h)
            self._final = (self._lib.fs_written(self._h),
                           self._lib.fs_dropped(self._h))
            self._lib.fs_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
