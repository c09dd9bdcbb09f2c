"""ctypes bindings for the native lattice oracle (C++).

Mirrors the role of the reference's khash+CFFI native layer (reference
lib/khash_int2int.h, lib/build_khash_cffi.py): a hash-table-backed lattice
index build on the CPU, used as the parity oracle for the on-device
sort-based build and as a host-side fallback.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from efgh_tpu.native.build import build

_lib = None


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        path = build()
        lib = ctypes.CDLL(path)
        lib.efgh_hash_create.restype = ctypes.c_void_p
        lib.efgh_hash_create.argtypes = [ctypes.c_int64]
        lib.efgh_hash_destroy.argtypes = [ctypes.c_void_p]
        lib.efgh_hash_get.restype = ctypes.c_int64
        lib.efgh_hash_get.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_int64]
        lib.efgh_hash_set.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_int64]
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.efgh_build_lattice.restype = ctypes.c_int64
        lib.efgh_build_lattice.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, i64p, i64p,
            i64p, i64p, i64p, ctypes.c_int64, i64p, ctypes.c_int64,
        ]
        _lib = lib
    return _lib


class HashInt2Int:
    """Python wrapper over the native int64->int64 hash (the khash-equivalent
    4-function API: init/get/set/destroy)."""

    def __init__(self, hint: int = 16):
        self._lib = load()
        self._h = self._lib.efgh_hash_create(hint)

    def get(self, key: int, default: int = -1) -> int:
        return self._lib.efgh_hash_get(self._h, key, default)

    def set(self, key: int, value: int) -> None:
        self._lib.efgh_hash_set(self._h, key, value)

    def close(self):
        if self._h:
            self._lib.efgh_hash_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def build_lattice_native(
    keys: np.ndarray, filter_offsets: np.ndarray, h_max: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Native lattice index build.

    Args:
      keys: (d1, N, d1) int lattice coordinates.
      filter_offsets: (F, d1) neighbor offsets.
      h_max: cell capacity.
    Returns:
      (lattice_offset (d1, N), blur_neighbors (F, h_max),
       cell_coords (h_max, d1), num_cells).
    """
    lib = load()
    keys = np.ascontiguousarray(keys, np.int64)
    d1, n, _ = keys.shape
    key_maxs = np.ascontiguousarray(keys.max(axis=(1, 2)), np.int64)
    key_mins = np.ascontiguousarray(keys.min(axis=(1, 2)), np.int64)
    filter_offsets = np.ascontiguousarray(filter_offsets, np.int64)
    f = filter_offsets.shape[0]
    lattice_offset = np.empty((d1, n), np.int64)
    cell_coords = np.zeros((h_max, d1), np.int64)
    blur_neighbors = np.full((f, h_max), -1, np.int64)
    cnt = lib.efgh_build_lattice(
        keys, n, d1, key_maxs, key_mins, lattice_offset, cell_coords,
        filter_offsets, f, blur_neighbors, h_max,
    )
    if cnt < 0:
        raise RuntimeError(f"lattice capacity overflow (h_max={h_max})")
    return lattice_offset, blur_neighbors, cell_coords, int(cnt)
