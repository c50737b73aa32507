"""Prototype-based Map Cloning: precomputed tables + sampling.

Builds two overlapping cells (10 m east stride, as in the published dataset)
sharing the same physical object, so the closest-point offset agreement that
gates the reference's rematch (poses.py:431, < 1e-7) genuinely holds.
"""

import numpy as np

from text2loc_tpu import constants as C
from text2loc_tpu.data.pmc import build_pmc_tables, sample_pmc
from text2loc_tpu.data.structs import (
    Cell,
    DescriptionBestCell,
    DescriptionPoseCell,
    Object3d,
    Pose,
)

SCENE = "2013_05_28_drive_0000_sync"
SIZE = 30.0


def _world_object(oid, world_pts, rgb, label, bbox):
    local = (world_pts - np.asarray(bbox[:3])) / SIZE
    return Object3d(oid, 500 + oid, local.astype(np.float64), rgb, label)


def _setup():
    rng = np.random.default_rng(11)
    bbox_a = np.array([0.0, 0.0, 0.0, 30.0, 30.0, 30.0])
    bbox_b = np.array([10.0, 0.0, 0.0, 40.0, 30.0, 30.0])  # east @ +10 m

    # One shared physical object visible in both cells, plus distractors.
    shared_w = rng.uniform(12.0, 25.0, size=(20, 3))
    shared_rgb = rng.random((20, 3))
    objs_a = [
        _world_object(0, shared_w, shared_rgb, "building", bbox_a),
        _world_object(1, rng.uniform(0, 9, (15, 3)), rng.random((15, 3)), "pole", bbox_a),
    ]
    objs_b = [
        _world_object(0, rng.uniform(31, 39, (15, 3)), rng.random((15, 3)), "pole", bbox_b),
        _world_object(1, shared_w, shared_rgb, "building", bbox_b),
    ]
    cell_a = Cell(0, SCENE, objs_a, SIZE, bbox_a)
    cell_b = Cell(1, SCENE, objs_b, SIZE, bbox_b)

    pose_w = np.array([20.0, 15.0, 0.0])  # inside both cells, near B's center
    pose_in_a = (pose_w - bbox_a[:3]) / SIZE

    # Description of the shared object, in pose-cell (= cell A) coords.
    d = DescriptionPoseCell()
    obj = objs_a[0]
    d.object_id = 0
    d.object_instance_id = obj.instance_id
    d.object_label = obj.label
    d.object_color_rgb = obj.get_color_rgb()
    d.object_color_text = obj.get_color_text()
    d.direction = "east"
    cp = obj.get_closest_point(pose_in_a)
    d.offset_closest = (pose_in_a - cp)[:2]
    d.offset_center = (pose_in_a - obj.get_center())[:2]
    d.closest_point = cp[:2]
    descr = DescriptionBestCell.matched(d, 0, cp, d.offset_center, d.offset_closest)

    pose = Pose(pose_in_a[:2], pose_w, cell_a.id, SCENE, [descr])
    neighbors = {cell_a.id: {"east": cell_b.id}, cell_b.id: {"west": cell_a.id}}
    return [cell_a, cell_b], [pose], neighbors


def test_build_tables_matches_shared_object():
    cells, poses, neighbors = _setup()
    valid, weight, match = build_pmc_tables(
        cells, poses, neighbors, num_mentioned=1, pmc_threshold=0.4,
        count_threshold=0,
    )
    assert valid.shape == (1, 8)
    assert valid[0, 0]  # east slot
    assert not valid[0, 1:].any()
    # Shared object sits at slot 1 in cell B.
    assert match[0, 0, 0] == 1
    assert weight[0, 0] > 0


def test_threshold_gates_candidate():
    cells, poses, neighbors = _setup()
    # Pose is 5 m east / 0 m north of B's center -> norm dist 5/30; a tiny
    # threshold must reject it.
    valid, _, _ = build_pmc_tables(
        cells, poses, neighbors, num_mentioned=1, pmc_threshold=0.05,
        count_threshold=0,
    )
    assert not valid.any()


def test_sample_pmc_swaps_cell():
    cells, poses, neighbors = _setup()

    class Data:
        pass

    d = Data()
    valid, weight, match = build_pmc_tables(
        cells, poses, neighbors, num_mentioned=1, count_threshold=0
    )
    d.pmc_valid, d.pmc_weight, d.pmc_match = valid, weight, match
    d.pose_cell_idx = np.array([0], np.int32)
    d.hint_obj_idx = np.array([[0]], np.int32)
    d.cell_neighbors = np.full((2, 8), -1, np.int32)
    d.cell_neighbors[0, 0] = 1

    rng = np.random.default_rng(0)
    cell_idx, hint_obj = sample_pmc(d, np.array([0]), rng, pmc_prob=1.0)
    assert cell_idx[0] == 1
    assert hint_obj[0, 0] == 1

    cell_idx, hint_obj = sample_pmc(d, np.array([0]), rng, pmc_prob=0.0)
    assert cell_idx[0] == 0
    assert hint_obj[0, 0] == 0


def test_build_tables_short_hint_row():
    """A pose with fewer descriptions than num_mentioned must not crash the
    table build (match rows are partially filled, trailing slots -1)."""
    cells, poses, neighbors = _setup()
    valid, _, match = build_pmc_tables(
        cells, poses, neighbors, num_mentioned=3, pmc_threshold=0.4,
        count_threshold=0,
    )
    assert valid[0, 0]
    assert match[0, 0, 0] == 1
    assert (match[0, 0, 1:] == -1).all()


def test_build_tables_object_slots_cap_gates_validity():
    """A match landing beyond the dataset's per-cell slot cap is unusable
    (gather_fine indexes [C, O] arrays): it must be dropped to -1 BEFORE
    the count_threshold gate, so validity is not granted on it."""
    cells, poses, neighbors = _setup()
    # The shared object sits at slot 1 in cell B; capping slots at 1 makes
    # the match unusable -> with count_threshold=0 the candidate is invalid.
    valid, _, match = build_pmc_tables(
        cells, poses, neighbors, num_mentioned=1, count_threshold=0,
        object_slots=1,
    )
    assert not valid.any()
    # Permitting one unmatched hint keeps it valid, with the slot dropped.
    valid, _, match = build_pmc_tables(
        cells, poses, neighbors, num_mentioned=1, count_threshold=1,
        object_slots=1,
    )
    assert valid[0, 0]
    assert match[0, 0, 0] == -1


def test_fine_object_order_fallback_matches_native_semantics():
    """The numpy fallback must bound-check and dedup matched slots exactly
    like the native kernel (duplicate matches and beyond-cap slots)."""
    from unittest import mock

    from text2loc_tpu import native
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene

    data = MultiSceneArrays([make_scene(
        "0000", num_cells=2, num_poses=2, object_slots=6, num_points=16,
        num_mentioned=4, seed=0,
    )])
    # Duplicates + out-of-range slots in one matched row.
    matched = np.array([[2, 2, 9, 0], [-1, 5, 5, 99]], np.int32)
    args = (np.array([0, 1]), np.array([0, 1]), 4)
    kw = dict(hint_obj_idx=matched)
    want = data.fine_object_order(*args, **kw)
    with mock.patch.object(native, "available", return_value=False):
        got = data.fine_object_order(*args, **kw)
    np.testing.assert_array_equal(got, want)
    # Dedup/bounds explicitly: row 0 = [2, 0, distractors...], no repeat.
    assert list(want[0][:2]) == [2, 0]
    assert len(set(want[0].tolist())) == len(want[0])
