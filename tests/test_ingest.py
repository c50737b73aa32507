"""Pickle ingest: published-schema pickles -> SceneArrays.

Builds a tiny scene in the published on-disk schema (cells/poses pickled under
the reference's module path "datapreparation.kitti360pose.imports", which the
CompatUnpickler must map back), converts it, and checks the array invariants.
"""

import json
import os
import pickle

import numpy as np
import pytest

from text2loc_tpu import constants as C
from text2loc_tpu.data import structs
from text2loc_tpu.data.ingest import convert_base_path, convert_scene
from text2loc_tpu.data.structs import (
    Cell,
    DescriptionBestCell,
    DescriptionPoseCell,
    Object3d,
    Pose,
)

SCENE = "2013_05_28_drive_0000_sync"


def _make_objects(rng, n):
    objs = []
    labels = ["building", "pole", "vegetation", "road", "traffic sign"]
    for i in range(n):
        npts = int(rng.integers(9, 40))
        xyz = rng.random((npts, 3)).astype(np.float32)
        rgb = rng.random((npts, 3)).astype(np.float32)
        objs.append(Object3d(i, 100 + i, xyz, rgb, labels[i % len(labels)]))
    return objs


def _make_descr(obj: Object3d, pose3, matched=True):
    d = DescriptionPoseCell()
    d.object_id = obj.id
    d.object_instance_id = obj.instance_id
    d.object_label = obj.label
    d.object_color_rgb = obj.get_color_rgb()
    d.object_color_text = obj.get_color_text()
    closest = obj.get_closest_point(pose3)
    off_closest = (np.asarray(pose3) - closest)[:2]
    off_center = (np.asarray(pose3) - obj.get_center())[:2]
    d.direction = "north-east"
    d.offset_center = off_center
    d.offset_closest = off_closest
    d.closest_point = closest[:2]
    if matched:
        return DescriptionBestCell.matched(
            d, obj.id, closest, off_center, off_closest
        )
    return DescriptionBestCell.unmatched(d)


def _dump_reference_pickles(tmp_path, cells, poses):
    """Pickle under the reference's module path (pickle writes
    cls.__module__/__qualname__; fake them so CompatUnpickler is exercised).
    Pickle verifies importability at dump time, so register stub modules too."""
    import sys
    import types

    classes = (Object3d, DescriptionPoseCell, DescriptionBestCell, Pose, Cell)
    ref_mod = "datapreparation.kitti360pose.imports"
    orig = [c.__module__ for c in classes]
    stubs = {}
    for name in ("datapreparation", "datapreparation.kitti360pose", ref_mod):
        stubs[name] = types.ModuleType(name)
    for c in classes:
        c.__module__ = ref_mod
        setattr(stubs[ref_mod], c.__name__, c)
    sys.modules.update(stubs)
    try:
        os.makedirs(tmp_path / "cells", exist_ok=True)
        os.makedirs(tmp_path / "poses", exist_ok=True)
        os.makedirs(tmp_path / "direction", exist_ok=True)
        with open(tmp_path / "cells" / f"{SCENE}.pkl", "wb") as f:
            pickle.dump(cells, f)
        with open(tmp_path / "poses" / f"{SCENE}.pkl", "wb") as f:
            pickle.dump(poses, f)
    finally:
        for c, m in zip(classes, orig):
            c.__module__ = m
        for name in stubs:
            sys.modules.pop(name, None)


@pytest.fixture
def tiny_dataset(tmp_path):
    rng = np.random.default_rng(3)
    cells = []
    for i in range(3):
        objs = _make_objects(rng, 4 + i)
        cell = Cell(i, SCENE, objs, 30.0,
                    np.array([i * 30.0, 0, 0, i * 30.0 + 30, 30, 30]))
        cells.append(cell)

    poses = []
    for pi in range(4):
        ci = pi % 3
        pose_in_cell = rng.uniform(0.2, 0.8, 2).astype(np.float32)
        pose3 = np.array([pose_in_cell[0], pose_in_cell[1], 0.0])
        pose_w = cells[ci].bbox_w[:3] + np.r_[pose_in_cell * 30.0, 0.0]
        descrs = [
            _make_descr(cells[ci].objects[j % len(cells[ci].objects)], pose3,
                        matched=(j % 3 != 2))
            for j in range(6)
        ]
        poses.append(Pose(pose_in_cell, pose_w, cells[ci].id, SCENE, descrs))

    _dump_reference_pickles(tmp_path, cells, poses)

    neighbors = {
        cells[0].id: {"east": cells[1].id, "west": None},
        cells[1].id: {"east": cells[2].id, "west": cells[0].id},
        cells[2].id: {"west": cells[1].id},
    }
    with open(tmp_path / "direction" / f"{SCENE}.json", "w") as f:
        json.dump(neighbors, f)
    return tmp_path, cells, poses


def test_convert_scene_invariants(tiny_dataset):
    base, cells, poses = tiny_dataset
    scenes = convert_base_path(str(base), [SCENE], store_points=16)
    s = scenes[0]

    assert s.num_cells == 3 and s.num_poses == 4
    assert s.obj_xyz.shape == (3, 28, 16, 3)  # auto slots >= 28
    # Real-object masks match the source object counts.
    assert list(s.obj_mask.sum(axis=1)) == [4, 5, 6]
    # Storage order preserved: class of slot 0 == first object's class.
    assert s.obj_class[0, 0] == C.CLASS_TO_INDEX[cells[0].objects[0].label]
    # Padding slots carry pad class.
    assert (s.obj_class[~s.obj_mask] == C.PAD_CLASS_INDEX).all()
    # Hints: direction vocabulary index round-trips.
    assert (s.hint_dir == C.DIRECTION_TO_INDEX["north-east"]).all()
    # Matching: 2 of 3 descriptions matched per pose (pattern j%3!=2).
    assert s.hint_matched.sum() == 4 * 4
    assert (s.hint_obj_idx[s.hint_matched] >= 0).all()
    assert (s.hint_obj_idx[~s.hint_matched] == -1).all()
    # Neighbor table: east of cell0 is cell1, symmetric west.
    assert s.cell_neighbors[0, 0] == 1
    assert s.cell_neighbors[1, 1] == 0
    assert s.cell_neighbors[2, 0] == -1

    # Best-cell index points at the right cell.
    for pi, pose in enumerate(poses):
        assert s.cell_ids[s.pose_cell_idx[pi]] == pose.cell_id


def test_npz_round_trip(tiny_dataset, tmp_path):
    base, _, _ = tiny_dataset
    out = tmp_path / "arrays"
    scenes = convert_base_path(str(base), [SCENE], out_dir=str(out), store_points=16)
    cached = convert_base_path(str(base), [SCENE], out_dir=str(out), store_points=16)
    a, b = scenes[0], cached[0]
    np.testing.assert_array_equal(a.obj_xyz, b.obj_xyz)
    np.testing.assert_array_equal(a.hint_dir, b.hint_dir)
    np.testing.assert_array_equal(a.cell_neighbors, b.cell_neighbors)
    assert a.cell_ids == b.cell_ids


def test_npz_cache_keyed_by_conversion_params(tiny_dataset, tmp_path):
    """A cache produced at one store_points must not be reused for another:
    cache filenames are parameter-keyed, so the second request converts
    fresh (different P) instead of loading stale shape-incompatible
    arrays."""
    base, _, _ = tiny_dataset
    out = tmp_path / "arrays"
    a = convert_base_path(str(base), [SCENE], out_dir=str(out),
                          store_points=16)[0]
    b = convert_base_path(str(base), [SCENE], out_dir=str(out),
                          store_points=8)[0]
    assert a.obj_xyz.shape[2] == 16 and b.obj_xyz.shape[2] == 8
    import os

    names = sorted(os.listdir(out))
    assert any("_p16_" in n for n in names) and any("_p8_" in n for n in names)


def test_sample_close_cell_option(tiny_dataset):
    """gather_coarse with sample_close_rng picks in-range, same-scene cells."""
    base, cells, poses = tiny_dataset
    from text2loc_tpu.data.arrays import MultiSceneArrays

    scenes = convert_base_path(str(base), [SCENE], store_points=16)
    data = MultiSceneArrays(scenes)
    rng = np.random.default_rng(0)
    pi = np.arange(data.num_poses)
    batch = data.gather_coarse(pi, 8, sample_close_rng=rng)
    centers = 0.5 * (data.cell_bbox[:, :2] + data.cell_bbox[:, 3:5])
    for i, p in enumerate(pi):
        ci = batch["cell_index"][i]
        d = np.linalg.norm(centers[ci] - data.pose_w[p, :2])
        assert d <= data.cell_size[ci] / 2 + 1e-6


def test_short_hint_sets_pad_and_mask(tmp_path):
    """Adversarial fixture: poses with FEWER than num_mentioned hints convert
    (the reference would assert, training/coarse.py:229-233); missing slots are
    masked out of the batch end to end."""
    rng = np.random.default_rng(5)
    objs = _make_objects(rng, 5)
    cell = Cell(0, SCENE, objs, 30.0, np.array([0.0, 0, 0, 30, 30, 30]))
    poses = []
    for n_hints in (6, 3, 1, 0):
        pose_in_cell = np.array([0.4, 0.6], np.float32)
        pose3 = np.array([0.4, 0.6, 0.0])
        descrs = [_make_descr(objs[j % 5], pose3) for j in range(n_hints)]
        poses.append(Pose(pose_in_cell, np.array([12.0, 18.0, 0.0]),
                          cell.id, SCENE, descrs))
    _dump_reference_pickles(tmp_path, [cell], poses)

    from text2loc_tpu.data.arrays import MultiSceneArrays

    data = MultiSceneArrays(convert_base_path(str(tmp_path), [SCENE], store_points=16))
    # The hint-LESS pose is dropped (it cannot be localized — its masked text
    # embedding is zero); short hint sets are padded + masked.
    assert data.num_poses == 3
    np.testing.assert_array_equal(data.hint_mask.sum(axis=1), [6, 3, 1])
    # Padded hint slots carry the pad class and are unmatched.
    pad = ~data.hint_mask
    assert (data.hint_label[pad] == C.PAD_CLASS_INDEX).all()
    assert (data.hint_obj_idx[pad] == -1).all()
    # The mask reaches the gathered batches as sentence_mask.
    batch = data.gather_coarse(np.arange(3), 8)
    np.testing.assert_array_equal(batch["sentence_mask"], data.hint_mask)
    fine = data.gather_fine(np.arange(3), 5)
    np.testing.assert_array_equal(fine["sentence_mask"], data.hint_mask)


def test_object_overflow_cap_warns_and_truncates(tmp_path, capsys):
    """>64-object cells trip the slot cap: a warning is printed and overflow
    objects drop exactly like the reference's coarse truncation."""
    rng = np.random.default_rng(6)
    objs = _make_objects(rng, 70)
    cell = Cell(0, SCENE, objs, 30.0, np.array([0.0, 0, 0, 30, 30, 30]))
    pose3 = np.array([0.5, 0.5, 0.0])
    descrs = [_make_descr(objs[j], pose3) for j in range(6)]
    pose = Pose(np.array([0.5, 0.5], np.float32),
                np.array([15.0, 15.0, 0.0]), cell.id, SCENE, [descrs[0]] * 6)
    _dump_reference_pickles(tmp_path, [cell], [pose])

    scenes = convert_base_path(str(tmp_path), [SCENE], store_points=16)
    out = capsys.readouterr().out
    assert "exceed the 64-object slot cap" in out
    s = scenes[0]
    assert s.obj_xyz.shape[1] == 64
    assert s.obj_mask.sum() == 64
    # Explicit override keeps everything.
    scenes2 = convert_base_path(str(tmp_path), [SCENE], store_points=16,
                                object_slots=70)
    assert scenes2[0].obj_mask.sum() == 70


def test_fine_offset_target_variants(tiny_dataset):
    """Legacy regressor_cell/learn targets (poses.py:55-72 semantics)."""
    base, _, _ = tiny_dataset
    from text2loc_tpu.data.arrays import MultiSceneArrays

    data = MultiSceneArrays(convert_base_path(str(base), [SCENE], store_points=16))
    pi = np.arange(data.num_poses)
    pc = data.fine_offset_targets(pi, "pose", "center")
    np.testing.assert_array_equal(pc, data.offset_center[pi])
    bc = data.fine_offset_targets(pi, "best", "closest")
    m = data.hint_matched[pi]
    np.testing.assert_array_equal(bc[m], data.best_offset_closest[pi][m])
    np.testing.assert_array_equal(bc[~m], data.offset_closest[pi][~m])
