"""Scene data as fixed-shape numpy arrays — the on-disk / in-memory schema.

The reference keeps scenes as pickles of Python object graphs
(/root/reference/datapreparation/kitti360pose/imports.py:8-247) and re-walks
them in every Dataset __getitem__. Here a scene is a flat bundle of padded
arrays; batch assembly is pure integer gathering, and every augmentation
(flip, hint shuffle, point resampling/rotation) runs on device.

Shapes: C cells, O object slots per cell (>= the coarse object_size cap),
P stored points per object, N poses, S hints per pose.

Padding object slots carry the reference's padding-object content
(imports.py:74-83): a tiny random cloud (x0.001), zero rgb, class "pad",
nearest-color "black", 8 points.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from text2loc_tpu import constants as C


@dataclass
class SceneArrays:
    scene_name: str
    cell_ids: List[str]          # len C, reference id format "{scene}_{idx:05d}"
    cell_bbox: np.ndarray        # [C, 6] world bbox (xmin ymin zmin xmax ymax zmax)
    cell_size: np.ndarray        # [C]
    obj_xyz: np.ndarray          # [C, O, P, 3] normalized-in-cell coords
    obj_rgb: np.ndarray          # [C, O, P, 3]
    obj_center: np.ndarray       # [C, O, 3]
    obj_color: np.ndarray        # [C, O, 3] mean rgb of original cloud
    obj_num_points: np.ndarray   # [C, O] original point counts (float32)
    obj_class: np.ndarray        # [C, O] int32
    obj_color_idx: np.ndarray    # [C, O] int32
    obj_mask: np.ndarray         # [C, O] bool
    pose_cell_idx: np.ndarray    # [N] int32 (best cell, scene-local index)
    pose_w: np.ndarray           # [N, 3] world coords
    pose_in_cell: np.ndarray     # [N, 2] normalized pose in best cell
    hint_dir: np.ndarray         # [N, S] int32 direction vocab index
    hint_color: np.ndarray       # [N, S] int32
    hint_label: np.ndarray       # [N, S] int32
    hint_obj_idx: np.ndarray     # [N, S] int32 object slot in best cell, -1 unmatched
    hint_matched: np.ndarray     # [N, S] bool
    offset_center: np.ndarray    # [N, S, 2] pose-cell center offsets
    offset_closest: np.ndarray   # [N, S, 2] pose-cell closest-point offsets
    best_offset_center: np.ndarray   # [N, S, 2]
    best_offset_closest: np.ndarray  # [N, S, 2]
    # Compass neighbor table for PMC (reference direction/*.json built by
    # add_relation.py): [C, 8] scene-local cell indices in the order
    # east/west/north/south/northeast/northwest/southeast/southwest, -1 = none.
    cell_neighbors: Optional[np.ndarray] = None
    # Precomputed PMC tables (reference poses.py:403-516 re-derives these per
    # __getitem__; here they're computed once at ingest against the full
    # clouds — see text2loc_tpu.data.pmc). Axis 1 indexes the 8 compass
    # neighbor slots of the pose's best cell.
    pmc_valid: Optional[np.ndarray] = None   # [N, 8] bool: clone candidate ok
    pmc_weight: Optional[np.ndarray] = None  # [N, 8] f32: 1/dist^2 sampling weight
    pmc_match: Optional[np.ndarray] = None   # [N, 8, S] int32: re-matched slots, -1
    # Hint-slot validity: poses with fewer than S hints are padded + masked
    # (the reference hard-asserts exactly num_mentioned hints,
    # training/coarse.py:229-233; we accept short hint sets). None = all real
    # (backwards compatible with round-1 npz files).
    hint_mask: Optional[np.ndarray] = None   # [N, S] bool

    def __post_init__(self):
        if self.hint_mask is None:
            self.hint_mask = np.ones(self.hint_dir.shape, dtype=bool)

    @property
    def num_cells(self) -> int:
        return len(self.cell_ids)

    @property
    def num_poses(self) -> int:
        return self.pose_w.shape[0]

    def save_npz(self, path: str):
        arrays = dataclasses.asdict(self)
        arrays["cell_ids"] = np.array(self.cell_ids)
        for name in ("cell_neighbors", "pmc_valid", "pmc_weight", "pmc_match"):
            if arrays[name] is None:
                del arrays[name]
        np.savez_compressed(path, **arrays)

    @classmethod
    def load_npz(cls, path: str) -> "SceneArrays":
        data = dict(np.load(path, allow_pickle=False))
        data["scene_name"] = str(data["scene_name"])
        data["cell_ids"] = [str(x) for x in data["cell_ids"]]
        return cls(**data)


def fill_padding_slots(scene: SceneArrays, rng: np.random.Generator) -> SceneArrays:
    """Write reference-style padding-object content into invalid object slots."""
    c, o, p, _ = scene.obj_xyz.shape
    pad = ~scene.obj_mask
    n_pad = int(pad.sum())
    if n_pad == 0:
        return scene
    pad_xyz = rng.random((n_pad, p, 3), dtype=np.float32) * 0.001
    scene.obj_xyz[pad] = pad_xyz
    scene.obj_rgb[pad] = 0.0
    scene.obj_center[pad] = pad_xyz.mean(axis=1)
    scene.obj_color[pad] = 0.0
    scene.obj_num_points[pad] = 8.0
    scene.obj_class[pad] = C.PAD_CLASS_INDEX
    # Nearest color centroid to rgb (0,0,0) is "black".
    scene.obj_color_idx[pad] = int(np.argmin(np.linalg.norm(C.COLORS, axis=1)))
    return scene


class MultiSceneArrays:
    """Concatenation of scenes with a global cell gallery.

    Mirrors Kitti360CoarseDatasetMulti / Kitti360FineDatasetMulti
    (dataloading/kitti360pose/cells.py:113-187, poses.py:528-587): poses and
    cells from all scenes with globally unique cell indices.
    """

    def __init__(self, scenes: Sequence[SceneArrays]):
        assert len(scenes) > 0
        self.scenes = list(scenes)
        self.cell_ids: List[str] = []
        self.cell_scene_idx_list: List[int] = []
        offsets = []
        off = 0
        for si, s in enumerate(self.scenes):
            offsets.append(off)
            self.cell_ids.extend(s.cell_ids)
            self.cell_scene_idx_list.extend([si] * s.num_cells)
            off += s.num_cells
        assert len(set(self.cell_ids)) == len(self.cell_ids), "cell ids must be unique"
        self._cell_offsets = np.array(offsets, dtype=np.int64)

        def cat(name):
            return np.concatenate([getattr(s, name) for s in self.scenes], axis=0)

        # Global cell-side arrays.
        self.cell_bbox = cat("cell_bbox")
        self.cell_size = cat("cell_size")
        self.obj_xyz = cat("obj_xyz")
        self.obj_rgb = cat("obj_rgb")
        self.obj_center = cat("obj_center")
        self.obj_color = cat("obj_color")
        self.obj_num_points = cat("obj_num_points")
        self.obj_class = cat("obj_class")
        self.obj_color_idx = cat("obj_color_idx")
        self.obj_mask = cat("obj_mask")
        self.cell_scene_idx = np.array(self.cell_scene_idx_list, dtype=np.int32)

        # Global pose-side arrays (cell idx re-based to the global gallery).
        self.pose_cell_idx = np.concatenate(
            [s.pose_cell_idx + offsets[si] for si, s in enumerate(self.scenes)]
        ).astype(np.int32)
        self.pose_scene_idx = np.concatenate(
            [np.full(s.num_poses, si, np.int32) for si, s in enumerate(self.scenes)]
        )
        for name in (
            "pose_w",
            "pose_in_cell",
            "hint_dir",
            "hint_color",
            "hint_label",
            "hint_obj_idx",
            "hint_matched",
            "hint_mask",
            "offset_center",
            "offset_closest",
            "best_offset_center",
            "best_offset_closest",
        ):
            setattr(self, name, cat(name))

        # Global PMC neighbor table (global cell indices, -1 = none).
        if all(s.cell_neighbors is not None for s in self.scenes):
            self.cell_neighbors = np.concatenate(
                [
                    np.where(s.cell_neighbors >= 0, s.cell_neighbors + offsets[si], -1)
                    for si, s in enumerate(self.scenes)
                ],
                axis=0,
            ).astype(np.int32)
        else:
            self.cell_neighbors = None

        # PMC tables (slot indices are cell-local; no rebasing needed).
        if all(s.pmc_valid is not None for s in self.scenes):
            self.pmc_valid = cat("pmc_valid")
            self.pmc_weight = cat("pmc_weight")
            self.pmc_match = cat("pmc_match")
        else:
            self.pmc_valid = self.pmc_weight = self.pmc_match = None

    @property
    def num_cells(self) -> int:
        return len(self.cell_ids)

    @property
    def num_poses(self) -> int:
        return self.pose_w.shape[0]

    @property
    def object_slots(self) -> int:
        return self.obj_xyz.shape[1]

    @property
    def stored_points(self) -> int:
        return self.obj_xyz.shape[2]

    # ------------------------------------------------------------------
    # Batch gathering (host-side numpy; everything downstream is on-device)
    # ------------------------------------------------------------------

    def gather_cell_objects(self, cell_indices: np.ndarray, o_cap: int) -> Dict[str, np.ndarray]:
        """Object arrays for the given cells, truncated to `o_cap` slots.

        The reference truncates cell objects beyond object_size
        (cell_retrieval.py:97); slots are stored real-objects-first so a plain
        slice is the same truncation.
        """
        ci = np.asarray(cell_indices)
        assert o_cap <= self.object_slots, (o_cap, self.object_slots)
        return {
            "xyz": self.obj_xyz[ci, :o_cap],
            "rgb": self.obj_rgb[ci, :o_cap],
            "center": self.obj_center[ci, :o_cap],
            "color": self.obj_color[ci, :o_cap],
            "num_points": self.obj_num_points[ci, :o_cap],
            "class_idx": self.obj_class[ci, :o_cap],
            "color_idx": self.obj_color_idx[ci, :o_cap],
            "mask": self.obj_mask[ci, :o_cap],
        }

    @property
    def cell_centers(self) -> np.ndarray:
        """[C, 2] world-frame cell centers — THE bbox-midpoint convention,
        shared by close_cells / eval_retrieval / visualize."""
        return 0.5 * (self.cell_bbox[:, 0:2] + self.cell_bbox[:, 3:5])

    def close_cells(self, pose_idx: int) -> np.ndarray:
        """Gallery cells whose center is within cell_size/2 of the pose and in
        the same scene (reference cells.py:69-74, sample_close_cell option)."""
        d = np.linalg.norm(self.cell_centers - self.pose_w[pose_idx, :2], axis=1)
        ok = (d <= self.cell_size / 2) & (
            self.cell_scene_idx == self.pose_scene_idx[pose_idx]
        )
        return np.nonzero(ok)[0]

    def gather_coarse(self, pose_indices: np.ndarray, object_size: int,
                      sample_close_rng: Optional[np.random.Generator] = None,
                      negative_rng: Optional[np.random.Generator] = None,
                      ) -> Dict[str, np.ndarray]:
        """Per-pose coarse sample: positive cell objects + hint triples.

        With `sample_close_rng`, the positive is a random cell within
        cell_size/2 of the pose instead of the best cell (the reference's
        sample_close_cell training augmentation, cells.py:65-74).

        With `negative_rng`, each sample also carries a uniformly random
        NON-matching gallery cell under `neg_*` keys — the negative cell the
        reference's triplet branch expects from its dataset
        (training/coarse.py:47-50; the reference dataset never actually
        produces `negative_cells`, making that branch dead code — this is
        the working equivalent, like losses.nt_xent for the dead NT_Xent).
        """
        pi = np.asarray(pose_indices)
        cells = self.pose_cell_idx[pi]
        if sample_close_rng is not None:
            cells = cells.copy()
            for i, p in enumerate(pi):
                cand = self.close_cells(int(p))
                if len(cand):
                    cells[i] = cand[sample_close_rng.integers(len(cand))]
        out = self.gather_cell_objects(cells, object_size)
        if negative_rng is not None:
            assert self.num_cells > 1, "triplet negatives need >= 2 cells"
            # Uniform over the other C-1 cells: draw in [0, C-1) and shift
            # past the positive index.
            neg = negative_rng.integers(
                0, self.num_cells - 1, size=len(pi)
            ).astype(np.int32)
            neg = np.where(neg >= cells, neg + 1, neg)
            out.update(
                {f"neg_{k}": v
                 for k, v in self.gather_cell_objects(neg, object_size).items()}
            )
            out["neg_cell_index"] = neg
        out.update(
            cell_index=cells.astype(np.int32),
            hint_dir=self.hint_dir[pi],
            hint_color=self.hint_color[pi],
            hint_label=self.hint_label[pi],
            sentence_mask=self.hint_mask[pi],
            pose_in_cell=self.pose_in_cell[pi],
            pose_w=self.pose_w[pi],
        )
        return out

    def fine_object_order(self, pose_indices: np.ndarray, cell_indices: np.ndarray,
                          pad_size: int, hint_obj_idx: Optional[np.ndarray] = None) -> np.ndarray:
        """Matched-objects-first slot ordering for the fine stage.

        Replicates dataloading/kitti360pose/poses.py:90-121: matched objects in
        hint order first, then distractors in storage order, truncated/padded
        to pad_size. Returns [B, pad_size] indices into the cell's O slots;
        indices of pad slots point at stored padding content.
        """
        pi = np.asarray(pose_indices)
        ci = np.asarray(cell_indices)
        b = len(pi)
        o = self.object_slots
        matched_src = self.hint_obj_idx[pi] if hint_obj_idx is None else hint_obj_idx

        from text2loc_tpu import native

        if native.available():
            return native.fine_object_order(matched_src, o, pad_size)

        order = np.zeros((b, pad_size), dtype=np.int32)
        for i in range(b):
            # Mirror the native kernel exactly: bound-check AND dedup the
            # matched slots (two hints matched to the same object, or a
            # slot beyond this dataset's O cap, must not emit duplicates /
            # out-of-range gathers — text2loc_native.cpp fine_object_order).
            matched, seen = [], set()
            for m in matched_src[i]:
                m = int(m)
                if 0 <= m < o and m not in seen:
                    matched.append(m)
                    seen.add(m)
            rest = [j for j in range(o) if j not in seen]
            full = (matched + rest)[:pad_size]
            # Pad with trailing (padding-content) slots if the cell has fewer
            # slots than pad_size — cannot happen when O >= pad_size.
            while len(full) < pad_size:
                full.append(o - 1)
            order[i] = full
        return order

    def fine_offset_targets(self, pose_indices: np.ndarray,
                            regressor_cell: str = "pose",
                            regressor_learn: str = "center") -> np.ndarray:
        """Legacy per-hint offset targets [B, S, 2] (reference
        poses.py:55-72): pose-cell offsets, or best-cell offsets falling back
        to pose-cell ones for unmatched hints. The published config uses the
        absolute-pose target instead (gather_fine's `target`)."""
        pi = np.asarray(pose_indices)
        assert regressor_learn in ("center", "closest")
        pose_arr = (
            self.offset_center if regressor_learn == "center" else self.offset_closest
        )[pi]
        if regressor_cell == "pose":
            return pose_arr.astype(np.float32)
        assert regressor_cell == "best", regressor_cell
        best_arr = (
            self.best_offset_center if regressor_learn == "center"
            else self.best_offset_closest
        )[pi]
        matched = self.hint_matched[pi][..., None]
        return np.where(matched, best_arr, pose_arr).astype(np.float32)

    def gather_fine(self, pose_indices: np.ndarray, pad_size: int,
                    cell_indices: Optional[np.ndarray] = None,
                    hint_obj_idx: Optional[np.ndarray] = None,
                    match_first: bool = True) -> Dict[str, np.ndarray]:
        """Per-pose fine sample against its best cell (or a supplied cell).

        Target = absolute normalized pose in the candidate cell
        (regressor_cell="all", poses.py:74-75, the published config). The
        legacy per-hint offset targets live in `fine_offset_targets`.

        match_first=False keeps plain storage order truncated to pad_size —
        the ordering the reference uses at evaluation time against *retrieved*
        cells, where no gt matching exists (eval.py:147-174).
        """
        pi = np.asarray(pose_indices)
        ci = self.pose_cell_idx[pi] if cell_indices is None else np.asarray(cell_indices)
        if match_first:
            order = self.fine_object_order(pi, ci, pad_size, hint_obj_idx=hint_obj_idx)
        else:
            order = np.broadcast_to(
                np.arange(pad_size, dtype=np.int32), (len(pi), pad_size)
            )
        bidx = np.arange(len(pi))[:, None]
        out = {
            "xyz": self.obj_xyz[ci[:, None], order],
            "rgb": self.obj_rgb[ci[:, None], order],
            "center": self.obj_center[ci[:, None], order],
            "color": self.obj_color[ci[:, None], order],
            "num_points": self.obj_num_points[ci[:, None], order],
            "class_idx": self.obj_class[ci[:, None], order],
            "color_idx": self.obj_color_idx[ci[:, None], order],
            "mask": self.obj_mask[ci[:, None], order],
        }
        bbox = self.cell_bbox[ci]
        # Both axes normalized by the scalar cell_size (the longest edge) —
        # the reference's new_pose convention (poses.py:74-75, 419).
        size = np.maximum(self.cell_size[ci], 1e-9)
        target = np.stack(
            [
                (self.pose_w[pi, 0] - bbox[:, 0]) / size,
                (self.pose_w[pi, 1] - bbox[:, 1]) / size,
            ],
            axis=-1,
        ).astype(np.float32)
        out.update(
            cell_index=ci.astype(np.int32),
            hint_dir=self.hint_dir[pi],
            hint_color=self.hint_color[pi],
            hint_label=self.hint_label[pi],
            sentence_mask=self.hint_mask[pi],
            target=target,
            pose_in_cell=self.pose_in_cell[pi].astype(np.float32),
            pose_w=self.pose_w[pi],
        )
        del bidx
        return out
