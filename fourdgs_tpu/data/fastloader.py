"""ctypes bindings for the native threaded PNG decoder (fastloader.cpp).

Replaces the reference's torch DataLoader worker pool (train.py:91-94:
num_workers=16) for batch prefetching: GT frames for the next training batch
decode on C++ threads while the current step runs on the TPU. Falls back to
PIL transparently for non-PNG files, resized images, or when the native
library can't be built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "fastloader.cpp")
_SO = os.path.join(_NATIVE_DIR, "libfastloader.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _SO,
             "-lz", "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building on first use) the native library, or None."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _lib = False
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _lib = False
            return None
        lib.fl_pool_create.restype = ctypes.c_void_p
        lib.fl_pool_create.argtypes = [ctypes.c_int]
        lib.fl_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.fl_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_void_p,
        ]
        lib.fl_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32
        ]
        lib.fl_decode.restype = ctypes.c_int
        _lib = lib
        return lib


def decode_png(path: str, width: int, height: int) -> np.ndarray | None:
    """Synchronous native decode → uint8 [H,W,3], or None on fallback."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((height, width, 3), np.uint8)
    rc = lib.fl_decode(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p), width, height
    )
    return out if rc == 0 else None


class PrefetchPool:
    """Async batch prefetcher over the native thread pool.

    Usage: ``pool.submit_batch(refs)`` starts decoding the next batch; a
    later ``pool.wait_batch()`` returns the stacked uint8 array, with PIL
    fallback for any image the native decoder rejected.
    """

    def __init__(self, n_threads: int = 8):
        self._lib = get_lib()
        self._pool = (
            self._lib.fl_pool_create(n_threads) if self._lib else None
        )
        self._pending = None

    def submit_batch(self, refs: list) -> None:
        """refs: list of data.dynerf.ImageRef (or any callable with .path/.size)."""
        if self._pool is None:
            self._pending = ("sync", refs)
            return
        outs, statuses = [], []
        for ref in refs:
            w, h = ref.size
            out = np.empty((h, w, 3), np.uint8)
            status = np.zeros(1, np.int32)
            self._lib.fl_submit(
                self._pool, ref.path.encode(),
                out.ctypes.data_as(ctypes.c_void_p), w, h,
                status.ctypes.data_as(ctypes.c_void_p),
            )
            outs.append(out)
            statuses.append(status)
        self._pending = ("async", refs, outs, statuses)

    def wait_batch(self) -> np.ndarray:
        import time

        pending = self._pending
        self._pending = None
        if pending is None:
            raise RuntimeError("no batch submitted")
        if pending[0] == "sync":
            return np.stack([ref() for ref in pending[1]])
        _, refs, outs, statuses = pending
        result = []
        for ref, out, status in zip(refs, outs, statuses):
            while status[0] == 0:
                time.sleep(0.0005)
            if status[0] == 1:
                result.append(out)
            else:  # native decoder rejected → PIL fallback
                result.append(ref())
        return np.stack(result)

    def close(self):
        if self._pool is not None and self._lib is not None:
            self._lib.fl_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
