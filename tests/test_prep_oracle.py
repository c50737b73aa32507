"""Reference-oracle A/B for the L0 prep ETL (VERDICT r4 item #4).

The reference's data-preparation layer is pure numpy + sklearn — no torch, no
PyG, no open3d in these paths (/root/reference/datapreparation/kitti360pose/
descriptions.py:85-298, select.py:13-95, imports.py:8-247) — so it runs
in-container as a direct test oracle. Both implementations receive IDENTICAL
synthetic scenes and must produce equal cells, descriptions, and groundings
object-by-object; a silent semantic drift here would poison every downstream
parity claim.

Oracle use only: the reference modules are imported and *executed*, never
copied. `sys.path` gets /root/reference APPENDED (not prepended) so its
generic top-level module names (models, training, evaluation) can never
shadow anything this repo imports.
"""

from __future__ import annotations

import importlib
import io
import pickle
import sys

import numpy as np
import pytest

from text2loc_tpu import constants as C
from text2loc_tpu.data import structs
from text2loc_tpu.prep import cells as our_cells
from text2loc_tpu.prep import describe as our_describe

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """The reference L0 modules, imported from the read-only checkout."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    mods = {}
    for name in ("imports", "utils", "select", "descriptions"):
        mods[name] = importlib.import_module(
            f"datapreparation.kitti360pose.{name}"
        )
    return mods


def _make_raw_scene(rng: np.random.Generator, ref):
    """One synthetic scene as raw (id, instance_id, xyz, rgb, label) tuples,
    built to exercise every create_cell branch: instance objects fully
    inside / straddling / outside the 30 m bbox, and stuff objects whose
    cropped points DBSCAN-split into multiple pseudo-instances (plus one
    blob below the 250-point threshold)."""
    stuff = list(ref["utils"].STUFF_CLASSES)
    instance_labels = [
        c for c in ref["utils"].KNOWN_CLASS if c not in stuff and c != "pad"
    ]
    raw = []
    oid = 0

    def add(xyz, label, instance_id):
        nonlocal oid
        rgb = rng.uniform(0.0, 1.0, size=xyz.shape)
        raw.append((oid, instance_id, np.asarray(xyz, np.float64), rgb, label))
        oid += 1

    # 10 instance objects inside the [0,30]^2 box (tight 60-pt clusters).
    for i in range(10):
        center = np.array([
            rng.uniform(3, 27), rng.uniform(3, 27), rng.uniform(0.5, 5)
        ])
        pts = center + rng.normal(0, 0.4, size=(60, 3))
        add(pts, instance_labels[i % len(instance_labels)], 100 + i)
    # One straddling the east edge (~40% of points inside -> passes the 1/3
    # inside_fraction rule; shifts of the same shape below fail it).
    edge = np.array([29.8, 15.0, 1.0])
    add(edge + rng.normal(0, 0.8, size=(90, 3)), instance_labels[0], 200)
    # One mostly outside (dropped by inside_fraction).
    add(np.array([32.5, 8.0, 1.0]) + rng.normal(0, 0.6, size=(80, 3)),
        instance_labels[1], 201)
    # One fully outside.
    add(np.array([45.0, 45.0, 1.0]) + rng.normal(0, 0.5, size=(50, 3)),
        instance_labels[2], 202)

    # Stuff object A: three well-separated dense blobs inside the bbox
    # (DBSCAN eps=0.75 splits them; each >= 250 pts survives the threshold)
    # plus a sub-threshold 80-pt blob and an out-of-bbox tail.
    blobs = []
    for bc in ([5.0, 5.0, 0.3], [14.0, 22.0, 0.3], [24.0, 7.0, 0.3]):
        blobs.append(np.asarray(bc) + rng.normal(0, 0.15, size=(300, 3)))
    blobs.append(np.array([20.0, 15.0, 0.3]) + rng.normal(0, 0.1, size=(80, 3)))
    blobs.append(np.array([40.0, 2.0, 0.3]) + rng.normal(0, 0.2, size=(120, 3)))
    add(np.concatenate(blobs), stuff[0], 300)
    # Stuff object B: one big blob (single pseudo-instance).
    add(np.array([9.0, 13.0, 0.4]) + rng.normal(0, 0.2, size=(400, 3)),
        stuff[1], 301)
    # Stuff object C: too few points inside (dropped before clustering).
    add(np.array([2.0, 25.0, 0.3]) + rng.normal(0, 0.1, size=(100, 3)),
        stuff[2], 302)
    return raw


def _as_ref_objects(raw, ref):
    return [
        ref["imports"].Object3d(i, inst, xyz.copy(), rgb.copy(), label)
        for (i, inst, xyz, rgb, label) in raw
    ]


def _as_our_objects(raw):
    return [
        structs.Object3d(i, inst, xyz.copy(), rgb.copy(), label)
        for (i, inst, xyz, rgb, label) in raw
    ]


BBOX = np.array([0.0, 0.0, 0.0, 30.0, 30.0, 30.0])
POSE_W = np.array([14.0, 16.0, 1.0])


@pytest.fixture(scope="module")
def cell_pair(ref):
    """(reference cell, our cell) built from one identical synthetic scene."""
    raw = _make_raw_scene(np.random.default_rng(17), ref)
    ref_cell = ref["descriptions"].create_cell(
        3, "0003", BBOX.copy(), _as_ref_objects(raw, ref), num_mentioned=6
    )
    our_cell = our_cells.create_cell(
        3, "0003", BBOX.copy(), _as_our_objects(raw), num_mentioned=6
    )
    assert ref_cell is not None and our_cell is not None
    return ref_cell, our_cell


def test_constants_match_reference(ref):
    """The protocol tables ARE the reference's (SURVEY 7.1 quirks list)."""
    u = ref["utils"]
    assert C.KNOWN_CLASSES == sorted(u.KNOWN_CLASS)
    assert C.CLASS_TO_INDEX == u.CLASS_TO_INDEX
    assert C.STUFF_CLASSES == u.STUFF_CLASSES
    np.testing.assert_array_equal(np.asarray(C.COLORS), np.asarray(u.COLORS))
    assert C.COLOR_NAMES == u.COLOR_NAMES
    # The reference's tables carry a "_pose" pseudo-class used only by its
    # pptk drawing helpers (utils.py:142,167,192 — never an object label in
    # the ETL); our tables deliberately omit it (PARITY.md).
    assert C.CLASS_TO_MINPOINTS == {
        k: v for k, v in u.CLASS_TO_MINPOINTS.items() if k != "_pose"
    }
    assert C.CLASS_TO_VOXELSIZE == {
        k: v for k, v in u.CLASS_TO_VOXELSIZE.items() if k != "_pose"
    }
    assert C.SCENE_NAMES == u.SCENE_NAMES
    assert C.SCENE_NAMES_TRAIN == u.SCENE_NAMES_TRAIN
    assert C.SCENE_NAMES_VAL == u.SCENE_NAMES_VAL
    assert C.SCENE_NAMES_TEST == u.SCENE_NAMES_TEST


def test_create_cell_matches_reference(cell_pair):
    """Bbox crop, inside_fraction thresholding, DBSCAN pseudo-instances,
    normalization and id reset all agree object-by-object
    (descriptions.py:85-149 vs text2loc_tpu/prep/cells.py)."""
    ref_cell, our_cell = cell_pair
    assert our_cell.id == ref_cell.id
    assert float(our_cell.cell_size) == float(ref_cell.cell_size)
    np.testing.assert_array_equal(our_cell.bbox_w, ref_cell.bbox_w)
    assert len(our_cell.objects) == len(ref_cell.objects)
    # The scene exercised the interesting branches: multiple pseudo-instances
    # from one stuff object and at least one straddling instance kept.
    assert len(ref_cell.objects) >= 6
    stuff_ids = [o.instance_id for o in ref_cell.objects if o.instance_id == 300]
    assert len(stuff_ids) == 3, "DBSCAN should yield 3 pseudo-instances"
    for ours, theirs in zip(our_cell.objects, ref_cell.objects):
        assert ours.id == theirs.id
        assert ours.instance_id == theirs.instance_id
        assert ours.label == theirs.label
        np.testing.assert_array_equal(ours.xyz, theirs.xyz)
        np.testing.assert_array_equal(ours.rgb, theirs.rgb)
        assert ours.get_color_text() == theirs.get_color_text()


def _assert_descriptions_equal(ours_list, ref_list):
    assert ours_list is not None and ref_list is not None
    assert len(ours_list) == len(ref_list)
    for ours, theirs in zip(ours_list, ref_list):
        assert ours.object_id == theirs.object_id
        assert ours.object_instance_id == theirs.object_instance_id
        assert ours.object_label == theirs.object_label
        assert ours.object_color_text == theirs.object_color_text
        assert ours.direction == theirs.direction
        np.testing.assert_allclose(ours.object_color_rgb,
                                   theirs.object_color_rgb, rtol=0, atol=0)
        np.testing.assert_allclose(ours.offset_center, theirs.offset_center,
                                   rtol=0, atol=0)
        np.testing.assert_allclose(ours.offset_closest, theirs.offset_closest,
                                   rtol=0, atol=0)
        np.testing.assert_allclose(ours.closest_point, theirs.closest_point,
                                   rtol=0, atol=0)


@pytest.mark.parametrize("select_by", ["closest", "direction", "class"])
@pytest.mark.parametrize("no_ontop", [False, True])
def test_describe_matches_reference(cell_pair, ref, select_by, no_ontop):
    """Candidate filtering, every deterministic selection strategy, direction
    words and offsets agree (descriptions.py:152-210, select.py:13-95 vs
    text2loc_tpu/prep/describe.py)."""
    ref_cell, our_cell = cell_pair
    ref_ds = ref["descriptions"].describe_pose_in_pose_cell(
        POSE_W.copy(), ref_cell, select_by, 6, no_ontop=no_ontop
    )
    our_ds = our_describe.describe_pose_in_pose_cell(
        POSE_W.copy(), our_cell, select_by, 6, no_ontop=no_ontop
    )
    _assert_descriptions_equal(our_ds, ref_ds)


def test_describe_too_few_candidates_matches_reference(cell_pair, ref):
    """Both sides return None when < num_mentioned candidates are in range."""
    ref_cell, our_cell = cell_pair
    # A pose in the far corner: max_dist=0.02 normalized leaves no candidates.
    pose = np.array([0.3, 0.3, 0.0])
    assert ref["descriptions"].describe_pose_in_pose_cell(
        pose, ref_cell, "closest", 6, max_dist=0.02
    ) is None
    assert our_describe.describe_pose_in_pose_cell(
        pose, our_cell, "closest", 6, max_dist=0.02
    ) is None


@pytest.fixture(scope="module")
def grounding_pair(ref, cell_pair):
    """Descriptions from the pose cell, grounded into a SHIFTED best cell
    (the dataset's decoupled pose-cell/best-cell layout, prepare.py:345-359):
    overlapping instances re-match, instances outside the shifted bbox go
    unmatched, and stuff pseudo-instances force multi-candidate argmin picks."""
    raw = _make_raw_scene(np.random.default_rng(17), ref)
    shift = np.array([6.0, -4.0, 0.0, 6.0, -4.0, 0.0])
    ref_best = ref["descriptions"].create_cell(
        4, "0003", (BBOX + shift).copy(), _as_ref_objects(raw, ref),
        num_mentioned=6, all_cells=True,
    )
    our_best = our_cells.create_cell(
        4, "0003", (BBOX + shift).copy(), _as_our_objects(raw),
        num_mentioned=6, all_cells=True,
    )
    ref_cell, our_cell = cell_pair
    ref_ds = ref["descriptions"].describe_pose_in_pose_cell(
        POSE_W.copy(), ref_cell, "closest", 6
    )
    our_ds = our_describe.describe_pose_in_pose_cell(
        POSE_W.copy(), our_cell, "closest", 6
    )
    ref_out = ref["descriptions"].ground_pose_to_best_cell(
        POSE_W.copy(), ref_ds, ref_best, all_cells=True
    )
    our_out = our_describe.ground_pose_to_best_cell(
        POSE_W.copy(), our_ds, our_best
    )
    return ref_out, our_out, ref_best


def test_ground_matches_reference(grounding_pair):
    """Instance-id + closest-offset re-matching (<= sqrt(2)/2 tolerance, no
    object reuse) agrees field-by-field (descriptions.py:213-298 vs
    text2loc_tpu/prep/describe.py:ground_pose_to_best_cell)."""
    (ref_ds, ref_pose, ref_unmatched), (our_ds, our_pose, our_unmatched), _ = (
        grounding_pair
    )
    np.testing.assert_allclose(our_pose, ref_pose, rtol=0, atol=0)
    assert our_unmatched == ref_unmatched
    assert len(our_ds) == len(ref_ds)
    matched_flags = [d.is_matched for d in ref_ds]
    assert True in matched_flags, "scene should produce matched descriptions"
    for ours, theirs in zip(our_ds, ref_ds):
        assert ours.is_matched == theirs.is_matched
        assert ours.object_instance_id == theirs.object_instance_id
        assert ours.object_label == theirs.object_label
        assert ours.direction == theirs.direction
        np.testing.assert_allclose(ours.offset_center, theirs.offset_center,
                                   rtol=0, atol=0)
        np.testing.assert_allclose(ours.offset_closest,
                                   theirs.offset_closest, rtol=0, atol=0)
        assert getattr(ours, "object_id", None) == getattr(
            theirs, "object_id", None
        )
        if theirs.is_matched:
            np.testing.assert_allclose(
                ours.best_offset_center, theirs.best_offset_center,
                rtol=0, atol=0,
            )
            np.testing.assert_allclose(
                ours.best_offset_closest, theirs.best_offset_closest,
                rtol=0, atol=0,
            )
            np.testing.assert_allclose(ours.closest_point,
                                       theirs.closest_point, rtol=0, atol=0)


def test_reference_pickle_round_trip(ref, grounding_pair):
    """Real reference-built Cell/Pose object graphs deserialize through
    CompatUnpickler into our reader structs with every field intact (the
    published pickles' schema, imports.py:8-247)."""
    (ref_ds, ref_pose, _), _, ref_best = grounding_pair
    pose_obj = ref["imports"].Pose(
        ref_pose, POSE_W.copy(), ref_best.id, "0003", ref_ds,
        described_by="closest",
    )
    blob = pickle.dumps({"cells": [ref_best], "poses": [pose_obj]})
    loaded = structs.CompatUnpickler(io.BytesIO(blob)).load()

    cell = loaded["cells"][0]
    assert isinstance(cell, structs.Cell)
    assert cell.id == ref_best.id
    assert float(cell.cell_size) == float(ref_best.cell_size)
    np.testing.assert_array_equal(cell.bbox_w, ref_best.bbox_w)
    assert len(cell.objects) == len(ref_best.objects)
    for ours, theirs in zip(cell.objects, ref_best.objects):
        assert isinstance(ours, structs.Object3d)
        assert (ours.id, ours.instance_id, ours.label) == (
            theirs.id, theirs.instance_id, theirs.label
        )
        np.testing.assert_array_equal(ours.xyz, theirs.xyz)
        # Derived values agree through OUR methods on reference-built data.
        np.testing.assert_allclose(
            ours.get_closest_point(ref_pose),
            theirs.get_closest_point(ref_pose), rtol=0, atol=0,
        )
        assert ours.get_color_text() == theirs.get_color_text()

    pose = loaded["poses"][0]
    assert isinstance(pose, structs.Pose)
    np.testing.assert_array_equal(pose.pose, ref_pose)
    np.testing.assert_array_equal(pose.pose_w, POSE_W)
    assert pose.cell_id == ref_best.id
    assert pose.described_by == "closest"
    assert len(pose.descriptions) == len(ref_ds)
    assert [d.is_matched for d in pose.descriptions] == [
        d.is_matched for d in ref_ds
    ]
    # The hint sentence content matches (the reference's get_text decorates
    # each hint with a debug ✓/☓ mark, ours with "matched"/"unmatched" — the
    # template part is the protocol, imports.py:163-166).
    for ours, theirs in zip(pose.descriptions, ref_ds):
        hint = f"Pose is {theirs.direction} of a {theirs.object_color_text} " \
               f"{theirs.object_label}"
        assert str(ours).startswith(hint) and str(theirs).startswith(hint)
