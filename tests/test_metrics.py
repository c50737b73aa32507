"""Evaluation metrics vs hand oracles (reference evaluation/utils.py:31-69,
training/coarse.py:119-150): world-coordinate conversion, cross-scene
inf-masking, top-k minimum, close-recall."""

import numpy as np

from text2loc_tpu.evaluation import metrics


def test_localization_accuracies_cross_scene_masking():
    # 2 queries, 2 candidates each, 30 m cells at known origins.
    pose_w = np.array([[15.0, 15.0], [45.0, 15.0]])
    pose_scene = np.array([0, 0])
    bbox = np.zeros((2, 2, 6))
    bbox[0, 0, :2] = (0.0, 0.0)    # query 0, cand 0: its own cell
    bbox[0, 1, :2] = (30.0, 0.0)   # cand 1: neighbor
    bbox[1, 0, :2] = (30.0, 0.0)
    bbox[1, 1, :2] = (0.0, 0.0)
    size = np.full((2, 2), 30.0)
    scenes = np.array([[0, 0], [1, 0]])  # query 1's top-1 is cross-scene
    pos = np.full((2, 2, 2), 0.5)        # predict cell centers

    accs = metrics.localization_accuracies(
        pose_w, pose_scene, bbox, size, scenes, pos,
        top_k=[1, 2], threshs=[5.0, 40.0],
    )
    # Query 0: top-1 center (15,15) -> dist 0 (hit at both threshs).
    # Query 1: top-1 is cross-scene -> inf; top-2 center (15,15) -> 30 m.
    assert accs[1][5.0] == 0.5
    assert accs[1][40.0] == 0.5
    assert accs[2][5.0] == 0.5
    assert accs[2][40.0] == 1.0


def test_retrieval_accuracies():
    retrieved = np.array([[0, 1], [1, 0]])
    target = np.array([0, 0])
    pose_w = np.array([[15.0, 15.0], [15.0, 15.0]])
    centers = np.array([[15.0, 15.0], [100.0, 100.0]])
    acc, close = metrics.retrieval_accuracies(
        retrieved, target, pose_w, centers, cell_size=30.0, top_k=[1, 2]
    )
    assert acc[1] == 0.5 and acc[2] == 1.0
    # close: center within 15 m. Query 0 top-1 = cell0 (dist 0); query 1
    # top-1 = cell1 (far), top-2 includes cell0.
    assert close[1] == 0.5 and close[2] == 1.0


def test_print_accuracies_format():
    table = {1: {5.0: 0.1234, 10.0: 0.5}, 3: {5.0: 0.25, 10.0: 0.75}}
    text = metrics.print_accuracies(table, "Fine")
    assert "Fine:" in text
    assert "0.1234" in text and "5.0/10.0" in text
