"""Pose description: object selection strategies, direction words, grounding.

Rebuild of /root/reference/datapreparation/kitti360pose/select.py and
descriptions.py:152-298. Semantics preserved:

* direction word from the pose-minus-closest-point offset; "on-top" within
  0.05 normalized; the reference's if-chain lets later conditions overwrite
  earlier ones, so south/north win axis ties (select.py:13-27);
* candidate objects within 0.5 normalized distance of the pose;
* selection strategies closest / direction / class / random (round-robin over
  direction/class buckets in first-seen order, select.py:43-95);
* grounding into the best cell matches by instance id + closest-offset
  agreement <= sqrt(2)/2, greedily without reuse (descriptions.py:250-296).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from text2loc_tpu.data.structs import (
    Cell,
    DescriptionBestCell,
    DescriptionPoseCell,
    Object3d,
)


def direction_word(offset_xy: np.ndarray, on_top_threshold: float = 0.05) -> str:
    ox, oy = float(offset_xy[0]), float(offset_xy[1])
    if np.hypot(ox, oy) < on_top_threshold:
        return "on-top"
    word = None
    if abs(ox) >= abs(oy) and ox >= 0:
        word = "east"
    if abs(ox) >= abs(oy) and ox <= 0:
        word = "west"
    if abs(ox) <= abs(oy) and oy >= 0:
        word = "north"
    if abs(ox) <= abs(oy) and oy <= 0:
        word = "south"
    return word


def get_direction(obj: Object3d, pose: np.ndarray) -> str:
    cp = obj.get_closest_point(pose)
    return direction_word((np.asarray(pose) - cp)[:2])


def get_direction_no_ontop(obj: Object3d, pose: np.ndarray) -> str:
    """Center-based direction word with no "on-top" class — the reference's
    `get_direction_noOntop` (select.py:30-40): offset is pose minus object
    CENTER (not closest point) and the on-top branch is absent."""
    offset = np.asarray(pose)[:2] - obj.get_center()[:2]
    return direction_word(offset, on_top_threshold=0.0)


def select_objects(objects: Sequence[Object3d], pose: np.ndarray,
                   num_mentioned: int, select_by: str,
                   rng: Optional[np.random.Generator] = None) -> List[Object3d]:
    """The four selection strategies (select.py:43-95)."""
    if select_by == "closest":
        dists = np.array(
            [np.linalg.norm(o.get_closest_point(pose) - np.asarray(pose)) for o in objects]
        )
        return [objects[i] for i in np.argsort(dists)[:num_mentioned]]
    if select_by == "random":
        r = rng if rng is not None else np.random.default_rng()
        idx = r.choice(len(objects), size=num_mentioned, replace=False)
        return [objects[i] for i in idx]
    if select_by in ("direction", "class"):
        key_of = (
            (lambda i: get_direction(objects[i], pose))
            if select_by == "direction"
            else (lambda i: objects[i].label)
        )
        buckets = {}
        for i in range(len(objects)):
            buckets.setdefault(key_of(i), []).append(i)
        picked: List[int] = []
        offset = 0
        while len(picked) < num_mentioned:
            for key in buckets:
                if len(buckets[key]) > offset:
                    picked.append(buckets[key][offset])
            offset += 1
        return [objects[i] for i in picked[:num_mentioned]]
    raise ValueError(select_by)


def describe_pose_in_pose_cell(
    pose_w: np.ndarray,
    cell: Cell,
    select_by: str,
    num_mentioned: int,
    max_dist: float = 0.5,
    no_ontop: bool = False,
) -> Optional[List[DescriptionPoseCell]]:
    """Hints for a pose in its pose-cell (descriptions.py:152-210).

    Returns None when fewer than num_mentioned candidates are in range.
    `no_ontop` swaps the direction word for the center-based no-"on-top"
    variant (descriptions.py:197-198); offsets stay closest-point-based.
    """
    pose = (np.asarray(pose_w) - cell.bbox_w[0:3]) / cell.cell_size
    dists = np.array(
        [np.linalg.norm(o.get_closest_point(pose) - pose) for o in cell.objects]
    )
    candidates = [cell.objects[i] for i in np.nonzero(dists <= max_dist)[0]]
    if len(candidates) < num_mentioned:
        return None
    selected = select_objects(candidates, pose, num_mentioned, select_by)

    out = []
    for obj in selected:
        cp = obj.get_closest_point(pose)
        d = DescriptionPoseCell()
        d.object_id = obj.id
        d.object_instance_id = obj.instance_id
        d.object_label = obj.label
        d.object_color_rgb = obj.get_color_rgb()
        d.object_color_text = obj.get_color_text()
        d.direction = (
            get_direction_no_ontop(obj, pose)
            if no_ontop
            else direction_word((pose - cp)[:2])
        )
        d.offset_center = (pose - obj.get_center())[:2]
        d.offset_closest = (pose - cp)[:2]
        d.closest_point = cp[:2]
        out.append(d)
    return out


def ground_pose_to_best_cell(
    pose_w: np.ndarray,
    descriptions: Sequence[DescriptionPoseCell],
    cell: Cell,
    offset_tolerance: float = np.sqrt(2) / 2,
) -> Tuple[List[DescriptionBestCell], np.ndarray, int]:
    """Re-match pose-cell descriptions into the best cell
    (descriptions.py:213-298). Returns (grounded, normalized pose, unmatched)."""
    assert np.all(pose_w >= cell.bbox_w[0:3]) and np.all(pose_w <= cell.bbox_w[3:6])
    pose = (np.asarray(pose_w) - cell.bbox_w[0:3]) / cell.cell_size

    grounded: List[DescriptionBestCell] = []
    used = set()
    unmatched = 0
    for d in descriptions:
        cands = [
            o for o in cell.objects
            if o.instance_id == d.object_instance_id and o.id not in used
        ]
        if not cands:
            grounded.append(DescriptionBestCell.unmatched(d))
            unmatched += 1
            continue
        offs = np.array([(pose - c.get_closest_point(pose))[:2] for c in cands])
        best = int(np.argmin(np.linalg.norm(offs - d.offset_closest, axis=1)))
        if np.linalg.norm(d.offset_closest - offs[best]) > offset_tolerance:
            grounded.append(DescriptionBestCell.unmatched(d))
            unmatched += 1
            continue
        obj = cands[best]
        used.add(obj.id)
        cp = obj.get_closest_point(pose)
        grounded.append(
            DescriptionBestCell.matched(
                d, obj.id, cp, pose - obj.get_center(), pose - cp
            )
        )
    return grounded, pose, unmatched
