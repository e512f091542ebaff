"""ctypes bindings to the native runtime (native/libsnowsim.so).

Components:
- `native_dart_throw`: C++ spatial-hash dart-throwing sampler (bank
  generation; ~1000x the reference's Python rejection loop)
- `ScanIOPool`: threaded .bin scan loader/writer that overlaps datagen IO
  with device compute

Everything degrades gracefully: if the shared library is missing (`make -C
native`), callers fall back to the NumPy implementations.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libsnowsim.so"
_lib = None


def _load(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.snow_dart_throw.restype = ctypes.c_int64
    lib.snow_dart_throw.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_uint64,
        ctypes.c_double, ctypes.c_int64,
        np.ctypeslib.ndpointer(dtype=np.float64, ndim=2, flags="C"),
    ]
    lib.scan_pool_create.restype = ctypes.c_void_p
    lib.scan_pool_create.argtypes = [ctypes.c_int]
    lib.scan_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.scan_pool_load.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        np.ctypeslib.ndpointer(dtype=np.float32, ndim=2, flags="C,WRITEABLE"),
        np.ctypeslib.ndpointer(dtype=np.int64, ndim=1, flags="C,WRITEABLE"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
    ]
    lib.scan_pool_write_compact.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        np.ctypeslib.ndpointer(dtype=np.float32, ndim=2, flags="C"),
        np.ctypeslib.ndpointer(dtype=np.uint8, ndim=1, flags="C"),
        ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(dtype=np.int64, ndim=1, flags="C,WRITEABLE"),
    ]
    lib.scan_pool_wait.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def native_dart_throw(
    occupancy_ratio: float,
    rate_param_per_cm: float,
    r0: float,
    seed: int,
    max_diameter_mm: float = 20.0,
    cap: int = 1 << 23,
) -> np.ndarray | None:
    """C++ sampler; returns (N, 3) [x, y, r] or None if the lib is missing."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((cap, 3), dtype=np.float64)
    n = lib.snow_dart_throw(
        occupancy_ratio, rate_param_per_cm, r0, seed, max_diameter_mm, cap, out
    )
    if n < 0:
        raise RuntimeError(f"native sampler exceeded cap {cap}")
    return out[:n].copy()


class ScanIOPool:
    """Threaded native .bin loader/writer with pad-to-capacity."""

    def __init__(self, n_threads: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable; run make -C native")
        self._lib = lib
        self._pool = lib.scan_pool_create(n_threads)
        self._refs: list = []  # keep buffers alive until wait()

    def load_async(self, path, capacity: int, cols: int = 5, pad_x: float = 1e6):
        """Start an async load; returns (buffer (capacity, cols), n_out (1,))
        valid after wait()."""
        buf = np.empty((capacity, cols), dtype=np.float32)
        n_out = np.empty(1, dtype=np.int64)
        self._refs.append((buf, n_out))
        self._lib.scan_pool_load(
            self._pool, str(path).encode(), buf, n_out, capacity, cols,
            np.float32(pad_x),
        )
        return buf, n_out

    def write_compact_async(self, path, data: np.ndarray, keep: np.ndarray):
        data = np.ascontiguousarray(data, dtype=np.float32)
        keep = np.ascontiguousarray(keep, dtype=np.uint8)
        n_out = np.empty(1, dtype=np.int64)
        self._refs.append((data, keep, n_out))
        self._lib.scan_pool_write_compact(
            self._pool, str(path).encode(), data, keep,
            data.shape[0], data.shape[1], n_out,
        )
        return n_out

    def wait(self):
        self._lib.scan_pool_wait(self._pool)
        self._refs.clear()

    def close(self):
        if self._pool:
            self._lib.scan_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
