"""ctypes binding to the native (C++) async chunk writer.

Builds ``_writer.so`` from ``_writer.cpp`` on first use (g++, cached next to
the source); callers fall back to a Python thread pool when compilation is
unavailable.  The native path releases the GIL for compression + disk IO,
mirroring the role of the reference's tokio writer pool.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

_HERE = Path(__file__).parent
_SRC = _HERE / "_writer.cpp"
_SO = _HERE / "_writer.so"
_BUILD_LOCK = threading.Lock()
_LIB = None


def _load_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    with _BUILD_LOCK:
        if _LIB is not None:
            return _LIB
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                [
                    "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                    "-o", str(_SO), str(_SRC), "-lz", "-lpthread",
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.writer_create.restype = ctypes.c_void_p
        lib.writer_create.argtypes = [ctypes.c_int]
        lib.writer_submit.restype = ctypes.c_int
        lib.writer_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p,
            ctypes.c_longlong, ctypes.c_int,
        ]
        lib.writer_flush.argtypes = [ctypes.c_void_p]
        lib.writer_errors.restype = ctypes.c_longlong
        lib.writer_errors.argtypes = [ctypes.c_void_p]
        lib.writer_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


class NativeWriter:
    """Async compressing file writer backed by the C++ thread pool."""

    def __init__(self, n_threads: int = 4):
        self._lib = _load_library()
        self._handle = self._lib.writer_create(n_threads)
        if not self._handle:
            raise RuntimeError("failed to create native writer")

    def submit(self, path: str, data: bytes, level: int = 1) -> None:
        rc = self._lib.writer_submit(
            self._handle, path.encode(), data, len(data), level
        )
        if rc != 0:
            raise RuntimeError("native writer rejected job (shut down?)")

    def flush(self) -> None:
        self._lib.writer_flush(self._handle)

    @property
    def errors(self) -> int:
        return int(self._lib.writer_errors(self._handle))

    def close(self) -> None:
        if self._handle:
            self._lib.writer_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
