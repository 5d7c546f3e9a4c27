"""ctypes bindings for the native kernel-map builder (native/kernel_maps.cpp).

Auto-builds the shared library on first use when a compiler is present;
falls back to the numpy implementation otherwise. Toggle with env
XMASK3D_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("XMASK3D_NATIVE", "1") == "0":
        return None
    so = os.path.join(_repo_root(), "native", "libkernel_maps.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(so)], check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.xm_build_kmap.argtypes = [
        i32p, ctypes.c_int64, i32p, ctypes.c_int64, i32p, ctypes.c_int32,
        ctypes.c_int64, i32p,
    ]
    lib.xm_unique_parents.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64, i32p,
    ]
    lib.xm_unique_parents.restype = ctypes.c_int64
    lib.xm_parent_octant.argtypes = [
        i32p, ctypes.c_int64, i32p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int64, i32p, i32p,
    ]
    lib.xm_sparse_quantize.argtypes = [i32p, ctypes.c_int64, i32p, i32p]
    lib.xm_sparse_quantize.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def build_kmap(coords: np.ndarray, out_coords: np.ndarray, offsets: np.ndarray,
               capacity: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    coords = np.ascontiguousarray(coords, np.int32)
    out_coords = np.ascontiguousarray(out_coords, np.int32)
    offsets = np.ascontiguousarray(offsets, np.int32)
    k = len(offsets)
    kmap = np.empty((k, capacity), np.int32)
    lib.xm_build_kmap(
        coords, len(coords), out_coords, len(out_coords), offsets, k,
        capacity, kmap,
    )
    return kmap


def unique_parents(coords: np.ndarray, stride: int, capacity: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    coords = np.ascontiguousarray(coords, np.int32)
    out = np.empty((capacity, 3), np.int32)
    m = lib.xm_unique_parents(coords, len(coords), stride, capacity, out)
    return out[:m].copy()


def parent_octant(coords: np.ndarray, parent_coords: np.ndarray, stride: int,
                  capacity: int):
    lib = get_lib()
    assert lib is not None
    coords = np.ascontiguousarray(coords, np.int32)
    parent_coords = np.ascontiguousarray(parent_coords, np.int32)
    pidx = np.empty((capacity,), np.int32)
    octant = np.empty((capacity,), np.int32)
    lib.xm_parent_octant(
        coords, len(coords), parent_coords, len(parent_coords), stride,
        capacity, pidx, octant,
    )
    return pidx, octant


def sparse_quantize_native(coords: np.ndarray):
    """Exact dedup: returns (inds, inverse) like
    data/voxelizer.py:sparse_quantize (note: first-occurrence order, not
    key-sorted order)."""
    lib = get_lib()
    assert lib is not None
    coords = np.ascontiguousarray(coords, np.int32)
    n = len(coords)
    inds = np.empty((n,), np.int32)
    inverse = np.empty((n,), np.int32)
    m = lib.xm_sparse_quantize(coords, n, inds, inverse)
    return inds[:m].copy(), inverse
