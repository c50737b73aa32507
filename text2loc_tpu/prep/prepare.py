"""ETL pipeline CLI: raw KITTI-360 -> cells/poses pickles + direction maps.

Rebuild of /root/reference/datapreparation/kitti360pose/prepare.py:434-515.
Outputs BOTH formats: the published pickle schema (so reference-format
consumers keep working) and, optionally, the framework's SceneArrays npz via
--array_dir (skipping a second ingest pass).

    python -m text2loc_tpu.prep.prepare --path_in RAW --path_out OUT \
        --scene_name 2013_05_28_drive_0000_sync [--array_dir ARR] ...
"""

from __future__ import annotations

import argparse
import os
import pickle
import time

import numpy as np

from text2loc_tpu.data.structs import load_compat_pickle
from text2loc_tpu.prep.cells import create_cells, create_locations, get_close_locations
from text2loc_tpu.prep.objects import gather_objects
from text2loc_tpu.prep.poses import create_poses
from text2loc_tpu.prep.relations import build_neighbor_map


def prepare_scene(args) -> None:
    rng = np.random.default_rng(args.seed)
    t0 = time.time()

    cell_locations = create_locations(args.path_in, args.scene_name, args.cell_dist)
    pose_locations = create_locations(args.path_in, args.scene_name, args.pose_dist)

    path_objects = os.path.join(args.path_in, "objects", f"{args.scene_name}.pkl")
    if os.path.isfile(path_objects):
        objects = load_compat_pickle(path_objects)
        print(f"loaded {len(objects)} cached objects")
    else:
        objects = gather_objects(args.path_in, args.scene_name)
        os.makedirs(os.path.dirname(path_objects), exist_ok=True)
        with open(path_objects, "wb") as f:
            pickle.dump(objects, f)
        print(f"gathered {len(objects)} objects in {time.time() - t0:.1f}s")

    cell_locations = get_close_locations(cell_locations, objects, args.cell_size)
    pose_locations = get_close_locations(pose_locations, objects, args.cell_size)

    cells = create_cells(
        objects, cell_locations, args.scene_name, args.cell_size, args.cell_dist,
        num_mentioned=args.num_mentioned, shift_cells=args.shift_cells,
        grid_cells=args.grid_cells, all_cells=args.all_cells,
    )
    print(f"{len(cells)} cells")

    poses = create_poses(
        objects, pose_locations, cells, args.cell_size,
        num_mentioned=args.num_mentioned, describe_by=args.describe_by,
        pose_count=args.pose_count, shift_poses=args.shift_poses,
        describe_best_cell=args.describe_best_cell, no_ontop=args.no_ontop,
        rng=rng,
    )
    print(f"{len(poses)} poses")

    for sub in ("cells", "poses", "direction"):
        os.makedirs(os.path.join(args.path_out, sub), exist_ok=True)
    with open(os.path.join(args.path_out, "cells", f"{args.scene_name}.pkl"), "wb") as f:
        pickle.dump(cells, f)
    with open(os.path.join(args.path_out, "poses", f"{args.scene_name}.pkl"), "wb") as f:
        pickle.dump(poses, f)
    import json

    with open(os.path.join(args.path_out, "direction", f"{args.scene_name}.json"), "w") as f:
        json.dump(build_neighbor_map(cells, stride=args.cell_dist), f, indent=2)

    if args.array_dir:
        from text2loc_tpu.data.ingest import convert_scene

        scene = convert_scene(
            cells, poses, args.scene_name,
            object_slots=max(28, max((len(c.objects) for c in cells), default=28)),
            num_mentioned=args.num_mentioned,
            neighbors_json=build_neighbor_map(cells, stride=args.cell_dist),
            seed=args.seed,
        )
        os.makedirs(args.array_dir, exist_ok=True)
        scene.save_npz(os.path.join(args.array_dir, f"{args.scene_name}.npz"))
        print(f"arrays: {scene.num_cells} cells / {scene.num_poses} poses")


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--path_in", required=True)
    ap.add_argument("--path_out", required=True)
    ap.add_argument("--scene_name", required=True)
    ap.add_argument("--array_dir", default=None)
    ap.add_argument("--cell_size", type=float, default=30.0)
    ap.add_argument("--cell_dist", type=float, default=10.0)
    ap.add_argument("--pose_dist", type=float, default=10.0)
    ap.add_argument("--pose_count", type=int, default=4)
    ap.add_argument("--num_mentioned", type=int, default=6)
    ap.add_argument("--describe_by", default="all",
                    choices=["all", "closest", "class", "direction", "random"])
    ap.add_argument("--shift_poses", action="store_true", default=True)
    ap.add_argument("--shift_cells", action="store_true")
    ap.add_argument("--grid_cells", action="store_true")
    ap.add_argument("--all_cells", action="store_true")
    ap.add_argument("--describe_best_cell", action="store_true",
                    help="describe against the best (database) cell instead "
                         "of the pose-centered cell")
    ap.add_argument("--no_ontop", action="store_true",
                    help="center-based direction words without the "
                         "'on-top' class (reference select.py:30-40)")
    ap.add_argument("--auto_name", action="store_true",
                    help="append the reference's config-encoded suffix to "
                         "path_out (datapreparation/args.py:41-54)")
    ap.add_argument("--seed", type=int, default=4096)
    return ap


def encode_output_name(args) -> str:
    """The reference's config-encoded dataset directory name
    (/root/reference/datapreparation/args.py:41-54): path_out plus one
    attribute token per non-default prep option, '_'-joined."""
    def num(v):
        # The reference's args are int-typed, so 30.0 must render "30" (a
        # float-styled "30.0-10.0" would never match a reference dirname).
        return int(v) if float(v).is_integer() else v

    attribs = [
        args.path_out,
        "allCells" if args.all_cells else None,
        f"{num(args.cell_size)}-{num(args.cell_dist)}",
        "gridCells" if args.grid_cells else (
            "shiftCells" if args.shift_cells else "noCellShift"),
        f"pd{num(args.pose_dist)}",
        f"pc{args.pose_count}",
        "shiftPoses" if args.shift_poses else None,
        args.describe_by,
        f"nm-{args.num_mentioned}",
        "bestCell" if args.describe_best_cell else None,
        "noOntop" if args.no_ontop else None,
    ]
    return "_".join(a for a in attribs if a is not None)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.auto_name:
        args.path_out = encode_output_name(args)
        print(f"output folder: {args.path_out}")
    prepare_scene(args)


if __name__ == "__main__":
    main()
