"""Duplicate-description statistics (reference cells.py:216-245 analysis)."""

import numpy as np

from text2loc_tpu.data.stats import description_stats


class _FakeData:
    def __init__(self, hint_dir, hint_color, hint_label, hint_mask, cells):
        self.hint_dir = np.asarray(hint_dir, np.int32)
        self.hint_color = np.asarray(hint_color, np.int32)
        self.hint_label = np.asarray(hint_label, np.int32)
        self.hint_mask = np.asarray(hint_mask, bool)
        self.pose_cell_idx = np.asarray(cells, np.int32)
        self.num_poses = len(self.hint_dir)


def test_description_stats_counts_and_order_invariance():
    # Poses 0 and 1 share the same mention set in different hint ORDER and
    # live in different cells (true ambiguity); pose 2 repeats the set in
    # the SAME cell as 0 (still a duplicate, and the group spans 2 cells);
    # pose 3 is unique; pose 4 matches pose 0 on its two REAL slots but the
    # masked third slot makes it a shorter set -> a different description.
    d = _FakeData(
        hint_dir=[[0, 1, 2], [2, 1, 0], [0, 1, 2], [3, 3, 3], [0, 1, 7]],
        hint_color=[[4, 5, 6], [6, 5, 4], [4, 5, 6], [1, 1, 1], [4, 5, 7]],
        hint_label=[[8, 9, 1], [1, 9, 8], [8, 9, 1], [2, 2, 2], [8, 9, 7]],
        hint_mask=[[1, 1, 1], [1, 1, 1], [1, 1, 1], [1, 1, 1], [1, 1, 0]],
        cells=[0, 1, 0, 2, 3],
    )
    s = description_stats(d)
    assert s["num_poses"] == 5
    # {0,1,2} collapse to one key (order ignored); 3 and 4 are unique.
    assert s["num_unique_descriptions"] == 3
    assert s["duplicated_poses"] == 3
    assert s["cross_cell_duplicated_poses"] == 3  # cells {0, 1, 0}
    assert s["worst_multiplicity"] == 3


def test_description_stats_no_duplicates():
    d = _FakeData(
        hint_dir=[[0, 1], [2, 3]],
        hint_color=[[0, 1], [2, 3]],
        hint_label=[[0, 1], [2, 3]],
        hint_mask=[[1, 1], [1, 1]],
        cells=[0, 0],
    )
    s = description_stats(d)
    assert s["duplicated_poses"] == 0
    assert s["cross_cell_duplicated_poses"] == 0
    assert s["num_unique_descriptions"] == 2
