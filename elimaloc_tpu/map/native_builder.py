"""ctypes bridge to the C++ map-builder fast path (native/src/voxel_builder.cpp).

The voxel insertion with min-spacing is an inherently sequential, hash-heavy
host job (the reference does it in C++ at node startup, pcm_matching.cpp:86-89)
— the one part of this framework that stays native. Built via native/Makefile
into ``libelimaloc_native.so``; when absent, builder.py silently falls back to
the NumPy implementation with identical semantics.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_SO_NAMES = ("libelimaloc_native.so",)
_lib = None
_checked = False


def _candidate_paths():
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(os.path.dirname(here))
    for name in _SO_NAMES:
        yield os.path.join(root, "native", "build", name)
        yield os.path.join(root, name)


def maybe_load():
    """Return the native module wrapper or None if the .so isn't built."""
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    for path in _candidate_paths():
        if os.path.exists(path):
            try:
                _lib = _NativeBuilder(path)
                break
            except OSError:
                _lib = None
    return _lib


class _NativeBuilder:
    def __init__(self, path):
        self._c = ctypes.CDLL(path)
        self._c.elm_insert_points.restype = ctypes.c_int64
        self._c.elm_insert_points.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # points [N*3]
            ctypes.c_int64,                   # N
            ctypes.c_double,                  # voxel_size
            ctypes.c_int64,                   # max_points_per_voxel
            ctypes.POINTER(ctypes.c_int64),   # out vox_coords [cap*3]
            ctypes.POINTER(ctypes.c_double),  # out block [cap*M*3]
            ctypes.POINTER(ctypes.c_int64),   # out counts [cap]
            ctypes.c_int64,                   # cap (max voxels)
        ]
        try:
            self._c.elm_lzf_decompress.restype = ctypes.c_int64
            self._c.elm_lzf_decompress.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int64,
            ]
            self._has_lzf = True
        except AttributeError:
            self._has_lzf = False

    def insert_points(self, points: np.ndarray, voxel_size: float, max_pts: int):
        n = points.shape[0]
        cap = n + 1  # every point in its own voxel, worst case
        pts = np.ascontiguousarray(points, dtype=np.float64)
        vox_coords = np.zeros((cap, 3), dtype=np.int64)
        block = np.zeros((cap, max_pts, 3), dtype=np.float64)
        counts = np.zeros(cap, dtype=np.int64)
        v = self._c.elm_insert_points(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
            voxel_size,
            max_pts,
            vox_coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            block.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cap,
        )
        if v < 0:
            raise RuntimeError("native elm_insert_points failed")
        return vox_coords[:v], block[:v], counts[:v]

    def lzf_decompress(self, src: bytes, expected: int):
        """LZF decompression; returns bytes or None when unavailable/failed."""
        if not self._has_lzf:
            return None
        out = (ctypes.c_ubyte * expected)()
        src_buf = (ctypes.c_ubyte * len(src)).from_buffer_copy(src)
        n = self._c.elm_lzf_decompress(src_buf, len(src), out, expected)
        if n != expected:
            return None
        return bytes(out)
