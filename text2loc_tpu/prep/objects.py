"""Scene-object gathering: instance extraction, merge, downsample, threshold.

Rebuild of /root/reference/datapreparation/kitti360pose/prepare.py:86-152.
The reference iterates classes then instances per file; here extraction is
vectorized per file with one lexsort over (semantic, instance), and objects
merge across the scene's tiled PLY files keyed by instance id. Downsampling
and min-point thresholds follow the per-class tables
(constants.CLASS_TO_VOXELSIZE / CLASS_TO_MINPOINTS).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from text2loc_tpu import constants as C
from text2loc_tpu.data.structs import Object3d
from text2loc_tpu.prep.ply import load_points
from text2loc_tpu.prep.voxel import voxel_downsample_indices


def extract_objects(xyz, rgb, semantic, instance) -> List[Object3d]:
    """Per-(class, instance) objects of one point-cloud file.

    rgb is scaled to [0, 1] here (reference prepare.py:97).
    """
    objects: List[Object3d] = []
    known = np.asarray(sorted(C.SEMANTIC_ID_TO_CLASS))
    keep = np.isin(semantic, known)
    xyz, rgb = xyz[keep], rgb[keep]
    semantic, instance = semantic[keep], instance[keep]

    order = np.lexsort((instance, semantic))
    sem_s, iid_s = semantic[order], instance[order]
    boundary = np.ones(len(order), bool)
    if len(order) > 1:
        boundary[1:] = (sem_s[1:] != sem_s[:-1]) | (iid_s[1:] != iid_s[:-1])
    starts = np.nonzero(boundary)[0]
    ends = np.append(starts[1:], len(order))
    for s, e in zip(starts, ends):
        sel = order[s:e]
        label = C.SEMANTIC_ID_TO_CLASS[int(sem_s[s])]
        iid = int(iid_s[s])
        objects.append(
            Object3d(
                iid, iid,
                np.asarray(xyz[sel], np.float64),
                np.asarray(rgb[sel], np.float32) / 255.0,
                label,
            )
        )
    return objects


def gather_objects(path_input: str, scene_name: str) -> List[Object3d]:
    """All objects of a scene: load each static PLY tile, merge instances
    across tiles, voxel-downsample per class, threshold by min points
    (reference prepare.py:107-152)."""
    path = os.path.join(path_input, "data_3d_semantics", scene_name, "static")
    assert os.path.isdir(path), path
    file_names = sorted(f for f in os.listdir(path) if not f.startswith("._"))

    scene_objects: Dict[int, Object3d] = {}
    for fname in file_names:
        xyz, rgb, sem, iid = load_points(os.path.join(path, fname))
        for obj in extract_objects(xyz, rgb, sem, iid):
            if obj.id in scene_objects:
                scene_objects[obj.id] = Object3d.merge(scene_objects[obj.id], obj)
            else:
                scene_objects[obj.id] = obj
            voxel = C.CLASS_TO_VOXELSIZE.get(obj.label)
            if voxel is not None:
                merged = scene_objects[obj.id]
                keep = voxel_downsample_indices(merged.xyz, voxel)
                merged.xyz = merged.xyz[keep]
                merged.rgb = merged.rgb[keep]

    out = []
    for obj in scene_objects.values():
        if len(obj.xyz) >= C.CLASS_TO_MINPOINTS.get(obj.label, 25):
            out.append(obj)
    return out
