"""Sentence-table eval query path == full text trunk (float tolerance).

The [V, D] table path (evaluation/retrieval.make_sentence_table_text_encoder)
must reproduce encode_queries exactly up to float reassociation — including
short-hint poses, where masked padded slots must not contaminate the pooled
query embedding.
"""

import dataclasses

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup(small_cfg, small_embedder):
    import jax.numpy as jnp

    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.training import steps

    cfg = small_cfg
    data = MultiSceneArrays([
        make_scene("0000", num_cells=6, num_poses=20,
                   object_slots=cfg.model.object_size,
                   num_points=cfg.model.pointnet.num_points,
                   num_mentioned=cfg.model.num_mentioned, seed=3)
    ])
    # Short-hint poses: mask out the tail sentences of a few queries.
    data.hint_mask[:5, -2:] = False
    model = CellRetrievalNetwork(cfg.model)
    opt = steps.make_optimizer(cfg, steps_per_epoch=4)
    rng = jax.random.PRNGKey(0)
    b = data.gather_coarse(
        np.arange(cfg.train.batch_size), cfg.model.object_size
    )
    b = {k: jnp.asarray(v) for k, v in b.items() if k != "pose_w"}
    objects, text = steps.prepare_coarse_batch(
        b, small_embedder, cfg, rng, train=False
    )
    state = steps.init_train_state(model, opt, rng, objects, text)
    return cfg, data, model, state


def test_table_queries_equal_full_trunk(setup, small_embedder):
    from text2loc_tpu.evaluation.retrieval import (
        encode_queries,
        encode_queries_table,
    )
    from text2loc_tpu.training.steps import make_coarse_encoders

    cfg, data, model, state = setup
    _, encode_text = make_coarse_encoders(model, small_embedder, cfg)
    full = encode_queries(data, state, encode_text, cfg)
    table = encode_queries_table(data, state, model, small_embedder, cfg)
    np.testing.assert_allclose(table, full, rtol=1e-4, atol=1e-5)


def test_run_fine_sentence_table_equals_trunk(setup, small_embedder):
    """run_fine with EvalConfig.sentence_table: the fine hint encodings
    collapse to a [V, D] gather (the fine text path has no cross-sentence
    head) — predictions must match the full-trunk path."""
    import jax

    from text2loc_tpu.evaluation.pipeline import run_fine
    from text2loc_tpu.models.cross_matcher import CrossMatch
    from text2loc_tpu.training import steps

    cfg, data, _, _ = setup
    model = CrossMatch(cfg.model)
    opt = steps.make_optimizer(cfg, steps_per_epoch=4)
    rng = jax.random.PRNGKey(1)
    fb = steps.prepare_fine_batch(
        data.gather_fine(np.arange(cfg.train.batch_size), cfg.model.pad_size),
        small_embedder, cfg, rng, train=False,
    )
    state = steps.init_train_state(model, opt, rng, fb.objects, fb.text)

    retr = np.tile(np.arange(2), (data.num_poses, 1))        # [Q, 2]
    _, pos_full, _ = run_fine(
        data, retr, state, model, small_embedder, cfg
    )
    cfg_t = cfg.replace(
        eval=dataclasses.replace(cfg.eval, sentence_table=True)
    )
    _, pos_tbl, _ = run_fine(
        data, retr, state, model, small_embedder, cfg_t
    )
    np.testing.assert_allclose(pos_tbl, pos_full, rtol=1e-4, atol=1e-5)


def test_eval_retrieval_sentence_table_flag(setup, small_embedder):
    from text2loc_tpu.evaluation.retrieval import eval_retrieval

    cfg, data, model, state = setup
    acc, close, idx = eval_retrieval(
        data, state, model, small_embedder, cfg, top_k=(1, 3)
    )
    cfg_t = cfg.replace(
        eval=dataclasses.replace(cfg.eval, sentence_table=True)
    )
    acc_t, close_t, idx_t = eval_retrieval(
        data, state, model, small_embedder, cfg_t, top_k=(1, 3)
    )
    np.testing.assert_array_equal(idx_t, idx)
    assert acc_t == acc and close_t == close
