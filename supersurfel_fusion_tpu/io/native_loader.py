"""ctypes bridge to the native TUM frame loader (native/tum_loader.cpp).

Builds the shared library on first use (g++ + zlib only) and exposes:
* `decode_pair`: synchronous PNG pair decode (drop-in for the PIL path)
* `PrefetchingLoader`: background thread pool decoding frames ahead of the
  SLAM loop so host PNG decode fully overlaps device compute.

Falls back gracefully (raises ImportError) when no toolchain is available;
`io/tum.py` keeps the pure-PIL path as default.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtum_loader.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "tum_loader.cpp")
        if not os.path.exists(src):
            raise ImportError("native loader source missing")
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.tum_decode_pair.restype = ctypes.c_int
    lib.tum_decode_pair.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.tum_prefetcher_create.restype = ctypes.c_void_p
    lib.tum_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.tum_prefetcher_get.restype = ctypes.c_int
    lib.tum_prefetcher_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.tum_prefetcher_destroy.restype = None
    lib.tum_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def decode_pair(rgb_path: str, depth_path: str, width: int = 640,
                height: int = 480) -> Tuple[np.ndarray, np.ndarray]:
    """Decode one (rgb, depth16) PNG pair natively."""
    lib = _load()
    rgb = np.empty((height, width, 3), np.uint8)
    depth = np.empty((height, width), np.uint16)
    ok = lib.tum_decode_pair(
        rgb_path.encode(), depth_path.encode(),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        width, height,
    )
    if not ok:
        raise IOError(f"native decode failed: {rgb_path} / {depth_path}")
    return rgb, depth


class PrefetchingLoader:
    """Decode-ahead loader over associated (rgb, depth) file pairs."""

    def __init__(self, pairs: List[Tuple[str, str]], width: int = 640,
                 height: int = 480, n_threads: int = 3, lookahead: int = 8):
        self._lib = _load()
        self.width, self.height = width, height
        self.n = len(pairs)
        self._rgb_paths = [p[0].encode() for p in pairs]
        self._depth_paths = [p[1].encode() for p in pairs]
        rgb_arr = (ctypes.c_char_p * self.n)(*self._rgb_paths)
        dep_arr = (ctypes.c_char_p * self.n)(*self._depth_paths)
        self._handle = self._lib.tum_prefetcher_create(
            rgb_arr, dep_arr, self.n, n_threads, lookahead
        )

    def get(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        rgb = np.empty((self.height, self.width, 3), np.uint8)
        depth = np.empty((self.height, self.width), np.uint16)
        ok = self._lib.tum_prefetcher_get(
            self._handle, idx,
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            self.width, self.height,
        )
        if not ok:
            raise IOError(f"native prefetch failed at frame {idx}")
        return rgb, depth

    def close(self):
        if self._handle:
            self._lib.tum_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
