"""Trainer entry points: epochs, eval gating, Orbax checkpointing, PMC path."""

import dataclasses
import os

import pytest
import numpy as np

from text2loc_tpu.training.coarse import train_coarse
from text2loc_tpu.training.fine import train_fine


def _small_two_epoch(cfg):
    return cfg.replace(train=dataclasses.replace(cfg.train, epochs=2, batch_size=8))


@pytest.mark.slow
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


def test_train_coarse_triplet_loss(small_cfg, small_embedder, small_data):
    """ranking_loss="triplet" trains end to end: negative cells are sampled
    per batch (gather_coarse negative_rng) and fed through the working
    triplet branch (the reference's is dead code, coarse.py:47-50)."""
    cfg = _small_two_epoch(small_cfg)
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, loss=dataclasses.replace(
            cfg.train.loss, ranking_loss="triplet")))
    cfg.validate()
    state, model, logger = train_coarse(cfg, small_data, small_data, small_embedder)
    assert len(logger.history["loss"]) == 2
    assert all(np.isfinite(v) for v in logger.history["loss"])
    assert int(state.step) >= 1


def test_train_coarse_eval_train_flag(small_cfg, small_embedder, small_data):
    """--eval_train logs per-epoch train-split recall (reference
    coarse.py:283-287, the overfitting signal)."""
    cfg = _small_two_epoch(small_cfg)
    _, _, logger = train_coarse(
        cfg, small_data, small_data, small_embedder, eval_train=True
    )
    keys = [k for k in logger.history if k.startswith("train_recall@")]
    assert keys, logger.history.keys()
    assert len(logger.history[keys[0]]) == 2


def test_gather_coarse_negative_sampling(small_data, small_cfg):
    rng = np.random.default_rng(0)
    batch = small_data.gather_coarse(
        np.arange(8), small_cfg.model.object_size, negative_rng=rng
    )
    assert batch["neg_xyz"].shape == batch["xyz"].shape
    # Negatives never equal the positive cell, and span the global gallery.
    assert (batch["neg_cell_index"] != batch["cell_index"]).all()
    assert batch["neg_cell_index"].min() >= 0
    assert batch["neg_cell_index"].max() < small_data.num_cells


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


@pytest.mark.slow
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

    # A NEW manager over the same directory (the resume path) recovers the
    # best metric from disk, so a worse post-resume eval is still rejected —
    # without this, the first post-resume save would overwrite the best
    # checkpoint and be reported as the best state.
    mgr2 = CheckpointManager(str(tmp_path / "ck"), mode="max")
    assert mgr2.best_metric == 0.5
    assert not mgr2.save(2, state, 0.3)
    assert mgr2.save(3, state, 0.6)
    mgr2.close()


@pytest.mark.slow
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


def test_mixed_precision_body_dtype_learns():
    """body_dtype="bfloat16" (mixed-precision training: bf16 object body,
    f32 tail — ModelConfig.body_dtype) must produce finite, NONZERO gradients
    and a decreasing loss on CPU. The on-chip speed/learning A/B lives in
    scripts/probe_mixed_train.py (results in BENCHMARKS.md)."""
    import dataclasses

    import jax
    import numpy as np

    from text2loc_tpu.config import small_test_config
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.text_embedding import HintTextEmbedder
    from text2loc_tpu.training import steps as steps_lib

    cfg = small_test_config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, dtype="float32",
                                  body_dtype="bfloat16")
    )
    data = MultiSceneArrays([
        make_scene("0000", num_cells=6, num_poses=16,
                   object_slots=cfg.model.object_size,
                   num_points=cfg.model.pointnet.num_points,
                   num_mentioned=cfg.model.num_mentioned, seed=0)
    ])
    model = CellRetrievalNetwork(cfg.model)
    embedder = HintTextEmbedder.compositional(
        cfg.model.text_embed_dim, cfg.model.max_hint_tokens
    )
    rng = jax.random.PRNGKey(0)
    opt = steps_lib.make_optimizer(cfg, steps_per_epoch=4)
    b = data.gather_coarse(np.arange(cfg.train.batch_size),
                           cfg.model.object_size)
    objects, text = steps_lib.prepare_coarse_batch(b, embedder, cfg, rng,
                                                   train=False)
    state = steps_lib.init_train_state(model, opt, rng, objects, text)
    step = jax.jit(steps_lib.make_coarse_train_step(model, embedder, cfg, opt))

    p0 = jax.tree_util.tree_map(lambda a: np.asarray(a), state.params)
    losses = []
    for i in range(6):
        state, m = step(state, b, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses
    # The POINTNET body's params must have moved (nonzero grads through the
    # bf16 body — the failure mode the full-bf16 stack exhibits is exactly
    # zero updates).
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(b) - a).max()), p0, state.params
    )
    flat = jax.tree_util.tree_flatten_with_path(moved)[0]
    pn_moves = [v for k, v in flat if "pointnet" in jax.tree_util.keystr(k)]
    assert pn_moves and max(pn_moves) > 0.0, "pointnet params did not move"


def test_stage_auto_hbm_budget(monkeypatch):
    """The fused-SA "auto" tokens are HBM-aware: when the cached-edge
    residuals (one [N, S*K, H1] tensor per e/e32 level, linear in batch)
    would exceed the per-chip budget, auto degrades the cached levels to
    the recompute kernel instead of OOMing — the measured-safe config
    (coarse batch 256 OOMs under (e32,e32,1) on the 16 GB v5e but runs
    all-recompute; scripts/probe_batch_scaling.py)."""
    from text2loc_tpu.config import Config, ModelConfig, TrainConfig
    from text2loc_tpu.training import steps as steps_lib

    monkeypatch.delenv("TEXT2LOC_FUSED_SA_ECACHE_GB", raising=False)
    cfg = Config(model=ModelConfig(), train=TrainConfig()).validate()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, body_dtype="float32"))

    def coarse_auto(batch, n_shards=1, triplet=False):
        n = (-(-batch // n_shards)) * cfg.model.object_size * (2 if triplet else 1)
        return steps_lib._stage_auto(
            cfg, steps_lib.COARSE_FUSED_TRAIN_AUTO, n)

    # Default batches keep the measured per-level winners.
    assert coarse_auto(32) == ("e32", "e32", "1")
    assert coarse_auto(128) == ("e32", "e32", "1")
    # The measured-OOM point degrades every cached level to recompute.
    assert coarse_auto(256) == ("1", "1", "1")
    # Triplet keeps both towers' residuals live: half the batch budget.
    assert coarse_auto(128, triplet=True) == ("1", "1", "1")
    # DP shards the object batch: global 256 over 8 chips is per-chip 32.
    assert coarse_auto(256, n_shards=8) == ("e32", "e32", "1")
    # Env budget override wins in both directions.
    monkeypatch.setenv("TEXT2LOC_FUSED_SA_ECACHE_GB", "100")
    assert coarse_auto(256) == ("e32", "e32", "1")
    monkeypatch.setenv("TEXT2LOC_FUSED_SA_ECACHE_GB", "0.001")
    assert coarse_auto(32) == ("1", "1", "1")
    monkeypatch.delenv("TEXT2LOC_FUSED_SA_ECACHE_GB")

    # Fine stage: pad_size clouds per sample; same guard. Batch 256 (8.6 GB
    # of e cache) measured WORKING on-chip, so it must stay cached.
    n_fine = 256 * cfg.model.pad_size
    assert steps_lib._stage_auto(
        cfg, steps_lib.FINE_FUSED_TRAIN_AUTO, n_fine
    ) == ("0", "e32", "e32")
    assert steps_lib._stage_auto(
        cfg, steps_lib.FINE_FUSED_TRAIN_AUTO, 2 * n_fine
    ) == ("0", "1", "1")

    # Non-f32 bodies keep returning None (env/default handling downstream).
    bf = cfg.replace(model=dataclasses.replace(cfg.model, body_dtype="bfloat16"))
    assert steps_lib._stage_auto(
        bf, steps_lib.COARSE_FUSED_TRAIN_AUTO, 10**9) is None
