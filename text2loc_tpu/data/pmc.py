"""Prototype-based Map Cloning (PMC) — precomputed tables + train-time sampling.

The reference re-derives PMC inside every Dataset __getitem__
(/root/reference/dataloading/kitti360pose/poses.py:403-516): with probability
`pmc_prob` it swaps the pose's best cell for one of its 8 compass neighbors
(cells overlap at 10 m stride), provided (a) the pose sits within
`pmc_threshold` (normalized, per-axis max) of the neighbor center (:416-417)
and (b) at most `count_threshold` of the described objects fail to re-match in
the neighbor by (label, exact closest-point offset agreement < 1e-7)
(:418-437); the clone is sampled with inverse-square-distance weights
(:445-447) and the hints are re-matched against the clone's objects (:458-479).

The rematch is a pure function of static geometry, so here it is computed
ONCE per (pose, neighbor) — at ingest, against the full point clouds — into
three arrays (pmc_valid / pmc_weight / pmc_match on SceneArrays). Train-time
PMC is then a trivially cheap categorical draw + integer gather; the regression
target in the cloned cell falls out of gather_fine's bbox math
(= the reference's new_pose, :419,463).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from text2loc_tpu.constants import NEIGHBOR_KEYS
from text2loc_tpu.data.structs import Cell, Pose


def _cell_geometry(cell: Cell):
    """(obj_pts, obj_start, obj_label) for the native rematch — a pure
    function of the cell, cached per cell by build_pmc_tables (it is called
    for up to 8 neighbors x every pose; rebuilding the concatenated cloud
    per (pose, neighbor) pair dominated ingest time)."""
    from text2loc_tpu import constants as C

    counts = [len(o.xyz) for o in cell.objects]
    obj_start = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=obj_start[1:])
    obj_pts = np.concatenate([o.xyz for o in cell.objects], axis=0)
    obj_label = np.array(
        [C.CLASS_TO_INDEX.get(o.label, -1) for o in cell.objects], np.int32
    )
    return obj_pts, obj_start, obj_label


def _rematch(pose_w: np.ndarray, cell: Cell, descriptions,
             atol: float = 1e-7, geometry=None) -> List[int]:
    """Greedy hint->object rematch in a candidate cell (poses.py:458-479).

    Returns a slot index per description, -1 where nothing matched. Greedy in
    description order; first label-equal object (in storage order) whose
    closest-point offset agrees exactly wins; objects are not reused.
    """
    width = float(cell.bbox_w[3] - cell.bbox_w[0])
    new_pose = (np.asarray(pose_w) - np.asarray(cell.bbox_w[:3])) / width

    from text2loc_tpu import constants as C
    from text2loc_tpu import native

    if native.available():
        obj_pts, obj_start, obj_label = (
            geometry if geometry is not None else _cell_geometry(cell)
        )
        descr_label = np.array(
            [C.CLASS_TO_INDEX.get(d.object_label, -2) for d in descriptions],
            np.int32,
        )
        descr_offset = np.array(
            [np.asarray(d.offset_closest, np.float64)[:2] for d in descriptions]
        )
        match, _ = native.pmc_rematch(
            obj_pts, obj_start, obj_label, descr_label, descr_offset,
            new_pose.astype(np.float64), atol,
        )
        return [int(m) for m in match]

    out: List[int] = []
    used = set()
    for d in descriptions:
        target = np.asarray(d.offset_closest, np.float64)[:2]
        hit = -1
        for oi, obj in enumerate(cell.objects):
            if obj.label != d.object_label or oi in used:
                continue
            cp = obj.get_closest_point(new_pose)
            off = (new_pose - cp)[:2]
            if np.linalg.norm(target - off) < atol:
                hit = oi
                used.add(oi)
                break
        out.append(hit)
    return out


def build_pmc_tables(
    cells: Sequence[Cell],
    poses: Sequence[Pose],
    neighbors_json: Dict,
    num_mentioned: int = 6,
    pmc_threshold: float = 0.4,
    count_threshold: int = 1,
    object_slots: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Precompute (valid [N,8], weight [N,8], match [N,8,S]) for every pose.

    Semantics preserved from poses.py:403-449:
    * candidate gate: per-axis max normalized distance < pmc_threshold AND
      unmatched count <= count_threshold;
    * weight: 1 / (euclidean normalized distance)^2 (normalization over the
      valid set happens at sampling time).

    `object_slots` (0 = unbounded): matches landing beyond the dataset's
    per-cell slot cap are unusable downstream (gather_fine indexes [C, O]
    arrays), so they are dropped to -1 BEFORE the count_threshold gate —
    validity must not be granted on matches that can never be gathered.
    """
    n, s = len(poses), num_mentioned
    cell_index = {c.id: i for i, c in enumerate(cells)}
    valid = np.zeros((n, 8), bool)
    weight = np.zeros((n, 8), np.float32)
    match = np.full((n, 8, s), -1, np.int32)

    from text2loc_tpu import native

    geom_cache: Dict = {}
    use_native = native.available()
    for pi, pose in enumerate(poses):
        mapping = neighbors_json.get(pose.cell_id)
        if mapping is None:
            continue
        descrs = pose.descriptions[:s]
        for ki, key in enumerate(NEIGHBOR_KEYS):
            nid = mapping.get(key)
            if nid is None or nid not in cell_index:
                continue
            cell = cells[cell_index[nid]]
            width = float(cell.bbox_w[3] - cell.bbox_w[0])
            center = cell.get_center()[:2]
            delta = (np.asarray(pose.pose_w[:2]) - center) / width
            if np.max(np.abs(delta)) >= pmc_threshold:
                continue
            geometry = None
            if use_native:
                geometry = geom_cache.get(nid)
                if geometry is None:
                    geometry = geom_cache[nid] = _cell_geometry(cell)
            slots = _rematch(pose.pose_w, cell, descrs, geometry=geometry)
            if object_slots:
                slots = [x if 0 <= x < object_slots else -1 for x in slots]
            if sum(1 for x in slots if x < 0) > count_threshold:
                continue
            valid[pi, ki] = True
            weight[pi, ki] = 1.0 / max(float(np.linalg.norm(delta)) ** 2, 1e-12)
            # Short hint lists leave trailing slots at -1 (ingest pads AND
            # masks those sentences; a full-row assign would crash on a
            # length-(len(descrs)) list).
            match[pi, ki, : len(slots)] = slots
    return valid, weight, match


def sample_pmc(
    data,
    pose_indices: np.ndarray,
    rng: np.random.Generator,
    pmc_prob: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Train-time PMC draw for a batch of poses.

    Returns (cell_indices [B] global, hint_obj_idx [B, S]): the candidate cell
    each pose trains against this step and the matching to use for
    matched-first object ordering. Poses that don't clone (prob, no valid
    candidate, or no tables) keep their best cell + original matching.
    """
    pi = np.asarray(pose_indices)
    b = len(pi)
    cell_idx = data.pose_cell_idx[pi].copy()
    hint_obj = data.hint_obj_idx[pi].copy()
    if pmc_prob <= 0.0 or data.pmc_valid is None or data.cell_neighbors is None:
        return cell_idx, hint_obj

    clone = rng.random(b) < pmc_prob
    valid = data.pmc_valid[pi]                      # [B, 8]
    weight = np.where(valid, data.pmc_weight[pi], 0.0)
    wsum = weight.sum(axis=1)
    ok = clone & (wsum > 0)
    for i in np.nonzero(ok)[0]:
        p = weight[i] / wsum[i]
        ki = int(rng.choice(8, p=p))
        nb = data.cell_neighbors[data.pose_cell_idx[pi[i]], ki]
        if nb < 0:
            continue
        cell_idx[i] = nb
        hint_obj[i] = data.pmc_match[pi[i], ki]
    return cell_idx, hint_obj
