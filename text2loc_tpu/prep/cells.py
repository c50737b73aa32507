"""Cell construction and location sampling.

Rebuild of /root/reference/datapreparation/kitti360pose/prepare.py:155-307 and
descriptions.py:26-149:

* `create_locations` — subsample the drive trajectory with a minimum spacing;
* `get_close_locations` — keep locations within cell_size/2 of any instance
  object (vectorized over objects here; the reference loops and breaks);
* `create_cell` — crop objects to a 30 m bbox: stuff classes are DBSCAN-
  clustered into pseudo-instances with >= stuff_min points (eps 0.75),
  instance classes kept when >= inside_fraction of their points fall inside;
  coordinates are normalized by the longest cell edge; ids are re-set to the
  list position;
* `create_cells` — default / shifted / grid cell layouts.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from text2loc_tpu import constants as C
from text2loc_tpu.data.structs import Cell, Object3d


def create_locations(path_input: str, scene_name: str, location_distance: float,
                     poses_txt: Optional[np.ndarray] = None) -> np.ndarray:
    """Greedy trajectory subsampling at >= location_distance spacing
    (reference prepare.py:189-213)."""
    if poses_txt is None:
        import os

        path = os.path.join(path_input, "data_poses", scene_name, "poses.txt")
        poses_txt = np.loadtxt(path)
    mats = poses_txt[:, 1:].reshape((-1, 3, 4))
    locations = mats[:, :, -1]

    kept = [locations[0]]
    for loc in locations:
        if np.min(np.linalg.norm(loc - np.asarray(kept), axis=1)) >= location_distance:
            kept.append(loc)
    return np.asarray(kept)


def get_close_locations(locations: Sequence[np.ndarray],
                        scene_objects: Sequence[Object3d],
                        cell_size: float) -> List[np.ndarray]:
    """Locations within cell_size/2 of any instance-class object
    (reference prepare.py:155-186)."""
    instance_objects = [o for o in scene_objects if o.label not in C.STUFF_CLASSES]
    close = []
    for loc in locations:
        for obj in instance_objects:
            cp = obj.get_closest_point(loc)
            if np.linalg.norm(np.asarray(loc) - cp) < cell_size / 2:
                close.append(loc)
                break
    return close


def _bbox_mask(points: np.ndarray, bbox: np.ndarray) -> np.ndarray:
    return np.all((points >= bbox[0:3]) & (points <= bbox[3:6]), axis=1)


def _cluster_stuff(obj: Object3d, stuff_min: int, eps: float = 0.75) -> List[Object3d]:
    """DBSCAN pseudo-instances of a cropped stuff object
    (reference descriptions.py:40-54)."""
    from sklearn.cluster import DBSCAN

    labels = DBSCAN(eps=eps, n_jobs=-1).fit(obj.xyz).labels_
    out = []
    for value in range(0, labels.max() + 1):
        mask = labels == value
        if mask.sum() < stuff_min:
            continue
        out.append(Object3d(obj.id, obj.instance_id, obj.xyz[mask], obj.rgb[mask], obj.label))
    return out


def create_cell(
    cell_idx: int,
    scene_name: str,
    bbox_w: np.ndarray,
    scene_objects: Sequence[Object3d],
    num_mentioned: int = 6,
    inside_fraction: float = 1 / 3,
    stuff_min: int = 250,
    all_cells: bool = False,
) -> Optional[Cell]:
    """One cell from a world bbox (reference descriptions.py:85-149)."""
    bbox_w = np.asarray(bbox_w, np.float64)
    cell_objects: List[Object3d] = []
    for obj in scene_objects:
        mask = _bbox_mask(obj.xyz, bbox_w)
        n_in = int(mask.sum())
        if obj.label in C.STUFF_CLASSES:
            if n_in < stuff_min:
                continue
            cropped = Object3d(obj.id, obj.instance_id, obj.xyz[mask], obj.rgb[mask], obj.label)
            cell_objects.extend(_cluster_stuff(cropped, stuff_min))
        else:
            if n_in / max(len(mask), 1) < inside_fraction:
                continue
            cell_objects.append(
                Object3d(obj.id, obj.instance_id, obj.xyz.copy(), obj.rgb.copy(), obj.label)
            )

    cell_size = float(np.max(bbox_w[3:6] - bbox_w[0:3]))
    for obj in cell_objects:
        obj.xyz = (obj.xyz - bbox_w[0:3]) / cell_size

    if len(cell_objects) < 1:
        return None
    if len(cell_objects) < num_mentioned and not all_cells:
        return None
    for oid, obj in enumerate(cell_objects):
        obj.id = oid
    return Cell(cell_idx, scene_name, cell_objects, cell_size, bbox_w)


def create_cells(
    objects: Sequence[Object3d],
    locations: np.ndarray,
    scene_name: str,
    cell_size: float,
    cell_dist: float,
    num_mentioned: int = 6,
    shift_cells: bool = False,
    grid_cells: bool = False,
    all_cells: bool = False,
) -> List[Cell]:
    """All cells of a scene (reference prepare.py:216-307). The published
    dataset uses the default layout; shifted/grid layouts are kept for config
    parity. Cell ids use the short scene number (prepare.py:223-224)."""
    locations = np.asarray(locations, np.float64)
    scene_short = scene_name.split("_")[-2] if len(scene_name.split("_")) == 6 else scene_name

    if shift_cells:
        shifts = np.array(
            [[0, 0], [-cell_dist * 1.05, 0], [cell_dist * 1.05, 0],
             [0, -cell_dist * 1.05], [0, cell_dist * 1.05]]
        )
        locations = np.repeat(locations, 5, axis=0)
        locations[:, 0:2] += np.tile(shifts.T, len(locations) // 5).T
        taken = np.full_like(locations, np.inf)
    elif grid_cells:
        from scipy.spatial.distance import cdist

        lo = np.floor(locations[:, :2].min(axis=0)).astype(int)
        hi = np.ceil(locations[:, :2].max(axis=0)).astype(int)
        gx, gy = np.mgrid[lo[0]:hi[0]:int(cell_dist), lo[1]:hi[1]:int(cell_dist)]
        centers = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float64)
        d = cdist(centers, locations[:, :2])
        keep = d.min(axis=1) <= cell_size
        closest = d.argmin(axis=1)[keep]
        centers = centers[keep]
        locations = np.hstack([centers, locations[closest, 2:3]])

    cells: List[Cell] = []
    for i, loc in enumerate(locations):
        if shift_cells and np.min(np.linalg.norm(taken - loc, axis=1)) < cell_dist:
            continue
        bbox = np.hstack([loc - cell_size / 2, loc + cell_size / 2])
        cell = create_cell(
            i, scene_short, bbox, objects,
            num_mentioned=num_mentioned, all_cells=all_cells,
        )
        if cell is not None:
            cells.append(cell)
            if shift_cells:
                taken[i] = loc
    return cells
