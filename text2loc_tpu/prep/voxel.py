"""Voxel-grid downsampling (open3d replacement).

The reference calls open3d's `voxel_down_sample_and_trace` and keeps the FIRST
traced index per voxel ("first-index color sampling, not averaging" —
/root/reference/datapreparation/kitti360pose/prepare.py:70-83). Here the voxel
hash is pure vectorized numpy: quantize against the min bound, lexsort voxel
keys, take each voxel's lowest original index. A native C++ implementation of
the same contract lives in text2loc_tpu/native (used automatically when the
shared library is built) — this is the portable path and the test oracle.
"""

from __future__ import annotations

import numpy as np


def voxel_downsample_indices(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Indices of one representative point per occupied voxel.

    The representative is the point with the smallest original index in its
    voxel (open3d's trace order gives the first inserted — identical here
    because insertion order is original order).
    """
    assert voxel_size > 0
    from text2loc_tpu import native

    if native.available():
        return native.voxel_downsample_indices(points, voxel_size)
    pts = np.asarray(points, np.float64)
    keys = np.floor((pts - pts.min(axis=0)) / voxel_size).astype(np.int64)
    # Single scalar key per voxel for a fast unique.
    spans = keys.max(axis=0) + 1
    flat = (keys[:, 0] * spans[1] + keys[:, 1]) * spans[2] + keys[:, 2]
    order = np.argsort(flat, kind="stable")
    sorted_keys = flat[order]
    first_of_voxel = np.ones(len(flat), dtype=bool)
    first_of_voxel[1:] = sorted_keys[1:] != sorted_keys[:-1]
    reps = order[first_of_voxel]
    return np.sort(reps)


def voxel_downsample(points: np.ndarray, voxel_size: float):
    idx = voxel_downsample_indices(points, voxel_size)
    return points[idx], idx
