"""Trainer entry points: epochs, eval gating, Orbax checkpointing, PMC path."""

import dataclasses
import os

import numpy as np

from text2loc_tpu.training.coarse import train_coarse
from text2loc_tpu.training.fine import train_fine


def _small_two_epoch(cfg):
    return cfg.replace(train=dataclasses.replace(cfg.train, epochs=2, batch_size=8))


def test_train_coarse_with_checkpointing(small_cfg, small_embedder, small_data, tmp_path):
    cfg = _small_two_epoch(small_cfg)
    state, model, logger = train_coarse(
        cfg, small_data, small_data, small_embedder, workdir=str(tmp_path)
    )
    assert len(logger.history["loss"]) == 2
    assert all(np.isfinite(v) for v in logger.history["loss"])
    assert "val_acc" in logger.history
    # Orbax wrote a checkpoint + metrics log + plot.
    assert os.path.isdir(tmp_path / "coarse_ckpt")
    assert os.path.exists(tmp_path / "coarse_metrics.jsonl")
    assert os.path.exists(tmp_path / "coarse_metrics.png")


def test_trainers_compute_in_train_dtype(small_cfg, small_embedder, small_data):
    """Trainers must build their models at train_dtype (f32): the bf16
    backward miscompiles to zero gradients on the remote-TPU stack
    (BENCHMARKS.md); params are f32 either way, so states stay serving-
    compatible."""
    cfg = _small_two_epoch(small_cfg)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, dtype="bfloat16", train_dtype="float32"))
    state, model, _ = train_coarse(cfg, small_data, None, small_embedder)
    assert model.cfg.dtype == "float32"
    import jax

    # All trained params are f32 (loadable into the bf16 serving model).
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == np.float32, leaf.dtype


def test_train_fine_runs(small_cfg, small_embedder, small_data):
    cfg = _small_two_epoch(small_cfg)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, pmc_prob=0.5))
    state, model, logger = train_fine(cfg, small_data, small_data, small_embedder)
    assert len(logger.history["loss"]) == 2
    assert all(np.isfinite(v) for v in logger.history["loss"])
    assert "val_pose_error" in logger.history


def test_checkpoint_round_trip(small_cfg, small_embedder, small_data, tmp_path):
    import jax

    from text2loc_tpu.utils.checkpoint import CheckpointManager

    cfg = _small_two_epoch(small_cfg)
    state, model, _ = train_coarse(cfg, small_data, None, small_embedder)

    mgr = CheckpointManager(str(tmp_path / "ck"), mode="max")
    assert mgr.save(0, state, 0.5)
    assert not mgr.save(1, state, 0.4)  # worse metric -> not saved
    restored = mgr.restore(state)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_train_coarse_resume(small_cfg, small_embedder, small_data, tmp_path):
    import dataclasses

    cfg2 = small_cfg.replace(
        train=dataclasses.replace(small_cfg.train, epochs=1, batch_size=8)
    )
    train_coarse(cfg2, small_data, small_data, small_embedder, workdir=str(tmp_path))
    cfg4 = cfg2.replace(train=dataclasses.replace(cfg2.train, epochs=2))
    state, _, logger = train_coarse(
        cfg4, small_data, small_data, small_embedder, workdir=str(tmp_path),
        resume=True,
    )
    # Resumed run trains only the remaining epoch.
    assert len(logger.history["loss"]) == 1
    assert int(state.step) >= 1
