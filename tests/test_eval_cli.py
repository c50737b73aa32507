"""Evaluation CLI entry points (synthetic mode) + retrieval visualization."""

import os

import numpy as np


def test_pipeline_cli_with_plots(tmp_path):
    from text2loc_tpu.evaluation.cli import main_pipeline

    png = str(tmp_path / "retrievals.png")
    result = main_pipeline(["--synthetic", "--plot_retrievals", png])
    assert set(result.keys()) >= {"coarse", "fine", "retrievals", "fine_qps"}
    assert os.path.exists(png)


def test_coarse_cli():
    from text2loc_tpu.evaluation.cli import main_coarse

    accs, retrievals = main_coarse(["--synthetic"])
    assert retrievals.ndim == 2
    for k, row in accs.items():
        for t, v in row.items():
            assert 0.0 <= v <= 1.0


def test_render_cell_topdown(small_data):
    from text2loc_tpu.evaluation.visualize import render_cell_topdown

    img = render_cell_topdown(small_data, 0, size=64)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert img.any()  # something was drawn


def test_render_pose_in_cell(small_data):
    from text2loc_tpu.evaluation.visualize import render_pose_in_cell

    img = render_pose_in_cell(small_data, 0, size=96,
                              pred_in_cell=np.array([0.5, 0.5]))
    assert img.shape == (96, 96, 3)
    # Crosses drawn (white gt + magenta pred present).
    assert (img == (255, 255, 255)).all(axis=-1).any()
    assert (img == (255, 0, 255)).all(axis=-1).any()


def test_pipeline_cli_restores_checkpoints(small_cfg, small_embedder, small_data, tmp_path):
    """--coarse_ckpt restore path: train -> Orbax dir -> eval CLI."""
    import dataclasses

    from text2loc_tpu.evaluation.cli import main_coarse
    from text2loc_tpu.training.coarse import train_coarse

    cfg = small_cfg.replace(
        train=dataclasses.replace(small_cfg.train, epochs=1, batch_size=8)
    )
    train_coarse(cfg, small_data, small_data, small_embedder, workdir=str(tmp_path))
    accs, retrievals = main_coarse(
        ["--synthetic", "--coarse_ckpt", str(tmp_path / "coarse_ckpt")]
    )
    assert retrievals.ndim == 2
