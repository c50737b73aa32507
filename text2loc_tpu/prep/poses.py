"""Pose creation: sample, describe, ground, dedup.

Rebuild of /root/reference/datapreparation/kitti360pose/prepare.py:310-431.
Per sampled location: random sub-cell shift (de-correlates queries from the
cell grid), nearest database cell = best cell (discard if farther than
cell_size/2), a decoupled pose-cell centered on the pose for describing,
description strategies (closest/class/direction or one of them), grounding
into the best cell, and dedup of identical matched-mention sets.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from text2loc_tpu.data.structs import Cell, Object3d, Pose
from text2loc_tpu.prep.cells import create_cell
from text2loc_tpu.prep.describe import (
    describe_pose_in_pose_cell,
    ground_pose_to_best_cell,
)


def create_poses(
    objects: Sequence[Object3d],
    locations: Sequence[np.ndarray],
    cells: Sequence[Cell],
    cell_size: float,
    num_mentioned: int = 6,
    describe_by: str = "all",
    pose_count: int = 1,
    shift_poses: bool = True,
    describe_best_cell: bool = False,
    no_ontop: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> List[Pose]:
    rng = rng if rng is not None else np.random.default_rng()
    locations = np.asarray(locations, np.float64)
    if pose_count > 1:
        assert shift_poses, "pose_count > 1 requires shift_poses"
        locations = np.repeat(locations, pose_count, axis=0)

    centers = np.array([0.5 * (c.bbox_w[0:3] + c.bbox_w[3:6]) for c in cells])
    methods = ("closest", "class", "direction") if describe_by == "all" else (describe_by,)

    poses: List[Pose] = []
    for loc in locations:
        loc = loc.copy()
        if shift_poses:
            # Integer shift < cell_size/2 keeps a retrievable best cell
            # (reference prepare.py:340-343).
            loc[0:2] += np.floor(rng.random(2) * cell_size / 2.1)

        dists = np.linalg.norm(loc - centers, axis=1)
        best_cell = cells[int(np.argmin(dists))]
        if dists.min() > cell_size / 2:
            continue

        pose_cell_bbox = np.hstack([loc - cell_size / 2, loc + cell_size / 2])
        pose_cell = create_cell(
            -1, "pose", pose_cell_bbox, objects, num_mentioned=num_mentioned
        )
        if pose_cell is None:
            continue

        mentioned_sets = []
        for method in methods:
            describe_cell = best_cell if describe_best_cell else pose_cell
            descrs = describe_pose_in_pose_cell(
                loc, describe_cell, method, num_mentioned, no_ontop=no_ontop
            )
            if descrs is None or len(descrs) < num_mentioned:
                break  # don't try other strategies (reference :386-389)
            grounded, pose_in_cell, _ = ground_pose_to_best_cell(
                loc, descrs, best_cell
            )
            mentioned = sorted(d.object_id for d in grounded if d.is_matched)
            if mentioned in mentioned_sets:
                continue  # duplicate mention-set (reference :408-411)
            mentioned_sets.append(mentioned)
            poses.append(
                Pose(pose_in_cell, loc, best_cell.id, best_cell.scene_name,
                     grounded, described_by=method)
            )
    return poses
