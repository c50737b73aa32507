"""Evaluation CLI entry points (synthetic mode) + retrieval visualization."""

import os

import pytest

import numpy as np


@pytest.mark.slow
def test_pipeline_cli_with_plots(tmp_path):
    from text2loc_tpu.evaluation.cli import main_pipeline

    png = str(tmp_path / "retrievals.png")
    result = main_pipeline(["--synthetic", "--plot_retrievals", png])
    assert set(result.keys()) >= {"coarse", "fine", "retrievals", "fine_qps"}
    assert os.path.exists(png)


@pytest.mark.slow
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


def test_coarse_cli_reference_attention_flag():
    """--reference_attention (pool over padded slots like the reference,
    for converted-checkpoint numerics) runs end to end."""
    from text2loc_tpu.evaluation.cli import main_coarse

    accs, retrievals = main_coarse(["--synthetic", "--reference_attention"])
    assert retrievals.ndim == 2


def test_render_cell_3d(small_data, tmp_path):
    from text2loc_tpu.evaluation.visualize import render_cell_3d

    out = str(tmp_path / "cell3d.png")
    render_cell_3d(small_data, 0, out_path=out)
    assert os.path.getsize(out) > 0


def test_render_flythrough(small_data, tmp_path):
    """Camera-orbit frame export (reference rendering.py:31-70 equivalent)."""
    from text2loc_tpu.evaluation.visualize import render_flythrough

    paths = render_flythrough(small_data, 0, str(tmp_path / "fly"), num_frames=4)
    assert len(paths) == 4
    for p in paths:
        assert os.path.getsize(p) > 0


def test_render_pose_in_cell(small_data):
    from text2loc_tpu.evaluation.visualize import render_pose_in_cell

    img = render_pose_in_cell(small_data, 0, size=96,
                              pred_in_cell=np.array([0.5, 0.5]))
    assert img.shape == (96, 96, 3)
    # Crosses drawn (white gt + magenta pred present).
    assert (img == (255, 255, 255)).all(axis=-1).any()
    assert (img == (255, 0, 255)).all(axis=-1).any()


def test_coarse_cli_loads_torch_checkpoint(tmp_path):
    """--coarse_torch_ckpt: a published-layout .pth (PointNet path, the
    default config) converts and drives retrieval end to end."""
    import pytest

    torch = pytest.importorskip("torch")
    from torch_fixtures import make_coarse_state_dict

    from text2loc_tpu.config import small_test_config
    from text2loc_tpu.evaluation.cli import main_coarse

    cfg = small_test_config().model
    sd = make_coarse_state_dict(cfg)

    path = str(tmp_path / "coarse.pth")
    torch.save(sd, path)
    accs, retrievals = main_coarse(["--synthetic", "--coarse_torch_ckpt", path])
    assert retrievals.ndim == 2
    for row in accs.values():
        for v in row.values():
            assert 0.0 <= v <= 1.0


@pytest.mark.slow
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
