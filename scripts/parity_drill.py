#!/usr/bin/env python
"""End-to-end parity drill on a REFERENCE-generated dataset (VERDICT r4 #7).

KITTI360Pose itself cannot enter this container, so this is the strongest
available substitute for a real-data run: the REFERENCE'S OWN L0 pipeline
(imported from /root/reference as an oracle — pure numpy+sklearn) generates a
dataset with its real semantics, and the full framework consumes it exactly
as it would the published assets:

1. GENERATE — synthesize a raw scene (instance + stuff objects), then drive
   the reference's create_cell / describe_pose_in_pose_cell /
   ground_pose_to_best_cell (descriptions.py:85-298) over a 10 m-stride cell
   grid (the published dataset's layout — add_relation.py neighbors sit at
   exactly +-10 m bbox offsets) and pickle reference Cell/Pose object graphs
   into the published on-disk layout: cells/{scene}.pkl, poses/{scene}.pkl,
   direction/{scene}.json.
2. INGEST + EVAL — scripts/parity.py end to end: CompatUnpickler ingest ->
   reference-shaped torch checkpoints (tests/torch_fixtures) through the
   converters -> coarse retrieval + both k x thresh localization tables.
3. VERIFY — (a) determinism: two full runs (separate array caches) must
   produce identical reports (timing fields excluded); (b) output protocol:
   our evaluation.metrics.print_accuracies must render BYTE-IDENTICAL text
   to the reference's evaluation/utils.py:57-69 print_accuracies on the
   measured tables.

One command; the committed golden lives at examples/parity_drill_golden.json:

    python scripts/parity_drill.py --golden examples/parity_drill_golden.json

Oracle use only — reference modules are imported and executed, never copied.
/root/reference is APPENDED to sys.path so its generic top-level module names
(models, evaluation, ...) cannot shadow anything of ours.
"""

from __future__ import annotations

import argparse
import contextlib
import copy
import hashlib
import importlib
import io
import json
import os
import pickle
import sys
import tempfile

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Runtime inserts (NOT PYTHONPATH: pre-startup path changes break the axon
# site hook's backend registration on this stack).
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))
sys.path.insert(0, os.path.join(_REPO, "tests"))

REFERENCE_ROOT = "/root/reference"

VAL_SCENE = "2013_05_28_drive_0010_sync"  # constants.SCENE_NAMES_VAL[0]
CELL_SIZE = 30.0
STRIDE = 10.0  # published layout: overlapping cells at 10 m stride
GRID = 3       # GRID x GRID cell origins -> 9 cells over [0, 50]^2


def _ref_modules():
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    return {
        name: importlib.import_module(f"datapreparation.kitti360pose.{name}")
        for name in ("imports", "utils", "descriptions")
    }


def _make_raw_objects(ref, rng):
    """Raw scene objects spanning the [0, 50]^2 drill area: 40 tight instance
    clusters + stuff objects whose crops DBSCAN-split per cell."""
    stuff = list(ref["utils"].STUFF_CLASSES)
    inst_labels = [c for c in ref["utils"].KNOWN_CLASS
                   if c not in stuff and c != "pad"]
    objs = []
    oid = 0

    def add(xyz, label, instance_id):
        nonlocal oid
        rgb = rng.uniform(0.0, 1.0, size=xyz.shape)
        objs.append(ref["imports"].Object3d(
            oid, instance_id, np.asarray(xyz, np.float64), rgb, label
        ))
        oid += 1

    for i in range(40):
        center = np.array([rng.uniform(1, 49), rng.uniform(1, 49),
                           rng.uniform(0.5, 4.0)])
        add(center + rng.normal(0, 0.4, size=(60, 3)),
            inst_labels[i % len(inst_labels)], 1000 + i)
    for j in range(4):
        blobs = [
            np.array([rng.uniform(3, 47), rng.uniform(3, 47), 0.3])
            + rng.normal(0, 0.15, size=(300, 3))
            for _ in range(4)
        ]
        add(np.concatenate(blobs), stuff[j % len(stuff)], 2000 + j)
    return objs


def build_reference_dataset(root: str, seed: int = 4096, n_poses: int = 24):
    """Emit cells/poses pickles + direction JSON in the published layout,
    entirely through the reference's own pipeline functions."""
    ref = _ref_modules()
    rng = np.random.default_rng(seed)
    objects = _make_raw_objects(ref, rng)
    scene_short = VAL_SCENE.split("_")[-2]  # "0010" (prepare.py:223-224)

    # Cells on the 10 m-stride grid (reference create_cells semantics,
    # prepare.py:216-307, via its create_cell).
    cells = []
    idx = 0
    for gy in range(GRID):
        for gx in range(GRID):
            x0, y0 = gx * STRIDE, gy * STRIDE
            bbox = np.array([x0, y0, 0.0,
                             x0 + CELL_SIZE, y0 + CELL_SIZE, CELL_SIZE])
            cell = ref["descriptions"].create_cell(
                idx, scene_short, bbox, objects, num_mentioned=6
            )
            if cell is not None:
                cells.append(cell)
                idx += 1
    assert len(cells) >= 4, f"only {len(cells)} cells survived"

    # Poses: decoupled pose-cell centered ON the pose (prepare.py:353-359),
    # described there, grounded into the nearest containing DB cell
    # (prepare.py:345-350).
    poses = []
    centers = np.stack([0.5 * (c.bbox_w[0:3] + c.bbox_w[3:6]) for c in cells])
    while len(poses) < n_poses:
        pose_w = np.array([rng.uniform(8, 42), rng.uniform(8, 42), 1.0])
        pose_bbox = np.concatenate([pose_w - CELL_SIZE / 2,
                                    pose_w + CELL_SIZE / 2])
        pose_cell = ref["descriptions"].create_cell(
            0, scene_short, pose_bbox, objects, num_mentioned=6,
            all_cells=True,
        )
        if pose_cell is None:
            continue
        descrs = ref["descriptions"].describe_pose_in_pose_cell(
            pose_w, pose_cell, "closest", 6
        )
        if descrs is None:
            continue
        containing = [
            i for i, c in enumerate(cells)
            if np.all(pose_w >= c.bbox_w[0:3]) and np.all(pose_w <= c.bbox_w[3:6])
        ]
        if not containing:
            continue
        best_i = containing[int(np.argmin(
            np.linalg.norm(centers[containing, :2] - pose_w[:2], axis=1)
        ))]
        grounded, pose_in_cell, _ = ref["descriptions"].ground_pose_to_best_cell(
            pose_w, descrs, cells[best_i]
        )
        poses.append(ref["imports"].Pose(
            pose_in_cell, pose_w, cells[best_i].id, VAL_SCENE, grounded,
            described_by="closest",
        ))

    # Neighbor JSON per add_relation.py:13-68 semantics: the 8 compass
    # neighbors at EXACT +-10 m bbox-origin offsets (with its swapped-args
    # json.dump crash fixed, as in our prep/relations.py).
    compass = {(10, 0): "east", (-10, 0): "west", (0, 10): "north",
               (0, -10): "south", (10, 10): "northeast",
               (10, -10): "southeast", (-10, 10): "northwest",
               (-10, -10): "southwest"}
    nbrs = {c.id: {d: None for d in compass.values()} for c in cells}
    for c in cells:
        for o in cells:
            if o.id == c.id:
                continue
            dx = int(round(o.bbox_w[0] - c.bbox_w[0]))
            dy = int(round(o.bbox_w[1] - c.bbox_w[1]))
            if (dx, dy) in compass:
                nbrs[c.id][compass[(dx, dy)]] = o.id

    for sub in ("cells", "poses", "direction"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    paths = {
        "cells": os.path.join(root, "cells", f"{VAL_SCENE}.pkl"),
        "poses": os.path.join(root, "poses", f"{VAL_SCENE}.pkl"),
        "direction": os.path.join(root, "direction", f"{VAL_SCENE}.json"),
    }
    with open(paths["cells"], "wb") as f:
        pickle.dump(cells, f)
    with open(paths["poses"], "wb") as f:
        pickle.dump(poses, f)
    with open(paths["direction"], "w") as f:
        json.dump(nbrs, f, indent=4)

    digests = {
        k: hashlib.sha256(open(p, "rb").read()).hexdigest()[:16]
        for k, p in paths.items()
    }
    return {
        "scene": VAL_SCENE, "n_cells": len(cells), "n_poses": len(poses),
        "seed": seed, "digests": digests,
    }


def _strip_timing(report):
    """Timing fields are environment noise, not semantics."""
    out = copy.deepcopy(report)
    for split in out:
        if isinstance(out[split], dict):
            out[split].pop("fine_qps", None)
    return out


def _typed_table(table):
    """JSON-stringified k x thresh table back to the typed dict both
    print_accuracies implementations consume (insertion order preserved)."""
    return {int(k): {float(t): v for t, v in row.items()}
            for k, row in table.items()}


def check_table_byte_parity(tables):
    """Our print_accuracies stream == the reference's, byte for byte."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    ref_utils = importlib.import_module("evaluation.utils")

    from text2loc_tpu.evaluation import metrics

    results = {}
    for name, table in tables.items():
        ours, theirs = io.StringIO(), io.StringIO()
        with contextlib.redirect_stdout(ours):
            metrics.print_accuracies(table, name)
        with contextlib.redirect_stdout(theirs):
            ref_utils.print_accuracies(table, name)
        results[name] = ours.getvalue() == theirs.getvalue()
        if not results[name]:
            print(f"BYTE MISMATCH for {name}:\nours={ours.getvalue()!r}\n"
                  f"ref ={theirs.getvalue()!r}", file=sys.stderr)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default=None,
                    help="dataset dir (default: fresh temp dir)")
    ap.add_argument("--runs", type=int, default=2,
                    help="independent parity runs for the determinism check")
    ap.add_argument("--seed", type=int, default=4096)
    ap.add_argument("--full_model", action="store_true",
                    help="full-size Config towers (the golden run); default "
                         "is small_test_config for the test tier")
    ap.add_argument("--golden", default=None,
                    help="write the golden JSON here")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env vars are too late on "
                         "this stack — the axon site hook pre-imports jax)")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    root = args.root or tempfile.mkdtemp(prefix="parity_drill_")
    print(f"generating reference dataset under {root} ...", flush=True)
    dataset = build_reference_dataset(root, seed=args.seed)
    print(f"  {dataset['n_cells']} cells, {dataset['n_poses']} poses, "
          f"digests {dataset['digests']}")

    import torch
    from torch_fixtures import make_coarse_state_dict, make_fine_state_dict

    import parity

    from text2loc_tpu.config import Config, small_test_config

    mcfg = (Config().validate() if args.full_model
            else small_test_config()).model
    cpth = os.path.join(root, "coarse.pth")
    fpth = os.path.join(root, "fine.pth")
    torch.save(make_coarse_state_dict(mcfg), cpth)
    torch.save(make_fine_state_dict(mcfg), fpth)

    reports = []
    for run in range(args.runs):
        cache = os.path.join(root, f"cache_{run}")
        cli = ["--base_path", root, "--splits", "val",
               "--coarse_torch_ckpt", cpth, "--fine_torch_ckpt", fpth,
               "--array_cache", cache,
               "--out", os.path.join(root, f"report_{run}.json")]
        if not args.full_model:
            cli.append("--small_model")
        print(f"parity run {run} ...", flush=True)
        reports.append(parity.main(cli))

    stripped = [_strip_timing(r) for r in reports]
    deterministic = all(s == stripped[0] for s in stripped[1:])
    tables = {
        "Coarse": _typed_table(reports[0]["val"]["coarse_table"]),
        "Fine": _typed_table(reports[0]["val"]["fine_table"]),
    }
    parity_ok = check_table_byte_parity(tables)

    import jax

    golden = {
        "dataset": dataset,
        "model": "full" if args.full_model else "small_test_config",
        "backend": jax.default_backend(),
        "runs": args.runs,
        "deterministic": deterministic,
        "table_byte_parity_vs_reference": parity_ok,
        "report": stripped[0],
    }
    verdict = deterministic and all(parity_ok.values())
    print(f"\nDRILL: deterministic={deterministic} "
          f"table_byte_parity={parity_ok} -> {'PASS' if verdict else 'FAIL'}")
    if args.golden:
        with open(args.golden, "w") as f:
            json.dump(golden, f, indent=1)
        print(f"wrote {args.golden}")
    return 0 if verdict else 1


if __name__ == "__main__":
    sys.exit(main())
