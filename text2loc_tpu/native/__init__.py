"""ctypes bindings for the native host-side kernels (libtext2loc_native.so).

Build with `make -C text2loc_tpu/native` (or `build()` below). Every binding
has a pure-numpy fallback elsewhere in the package; `available()` gates use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtext2loc_native.so")
_lib: Optional[ctypes.CDLL] = None


def build(quiet: bool = True) -> bool:
    """Compile the shared library in-place; returns success."""
    try:
        subprocess.run(
            ["make", "-C", _DIR],
            check=True,
            capture_output=quiet,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64 = ctypes.c_int64
    f64 = ctypes.c_double
    p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.voxel_downsample.restype = i64
    lib.voxel_downsample.argtypes = [p_f64, i64, f64, p_i64]
    lib.fine_object_order.restype = None
    lib.fine_object_order.argtypes = [p_i32, i64, i64, i64, i64, p_i32]
    lib.pmc_rematch.restype = ctypes.c_int32
    lib.pmc_rematch.argtypes = [
        p_f64, p_i64, p_i32, i64, p_i32, p_f64, i64, p_f64, f64, p_i32,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def voxel_downsample_indices(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Native voxel-grid representative indices (ascending)."""
    lib = _load()
    assert lib is not None
    pts = np.ascontiguousarray(points, np.float64)
    out = np.empty(len(pts), np.int64)
    m = lib.voxel_downsample(pts, len(pts), float(voxel_size), out)
    return out[:m].copy()


def fine_object_order(hint_obj_idx: np.ndarray, num_slots: int, pad_size: int) -> np.ndarray:
    """Native matched-first ordering: [B, S] -> [B, pad_size]."""
    lib = _load()
    assert lib is not None
    h = np.ascontiguousarray(hint_obj_idx, np.int32)
    b, s = h.shape
    out = np.empty((b, pad_size), np.int32)
    lib.fine_object_order(h, b, s, num_slots, pad_size, out)
    return out


def pmc_rematch(obj_pts: np.ndarray, obj_start: np.ndarray, obj_label: np.ndarray,
                descr_label: np.ndarray, descr_offset: np.ndarray,
                pose: np.ndarray, atol: float = 1e-7):
    """Native PMC rematch for one (pose, cell). Returns (match [S], unmatched)."""
    lib = _load()
    assert lib is not None
    obj_pts = np.ascontiguousarray(obj_pts, np.float64)
    obj_start = np.ascontiguousarray(obj_start, np.int64)
    obj_label = np.ascontiguousarray(obj_label, np.int32)
    descr_label = np.ascontiguousarray(descr_label, np.int32)
    descr_offset = np.ascontiguousarray(descr_offset, np.float64)
    pose = np.ascontiguousarray(pose, np.float64)
    out = np.empty(len(descr_label), np.int32)
    unmatched = lib.pmc_rematch(
        obj_pts, obj_start, obj_label, len(obj_label),
        descr_label, descr_offset, len(descr_label), pose, atol, out,
    )
    return out, int(unmatched)
