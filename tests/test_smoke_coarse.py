"""End-to-end smoke: synthetic data -> coarse train step -> retrieval eval."""

import jax
import jax.numpy as jnp
import numpy as np

from text2loc_tpu.evaluation.retrieval import eval_retrieval
from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
from text2loc_tpu.training import steps


def _gather_batch(data, cfg, idx):
    batch = data.gather_coarse(np.asarray(idx), cfg.model.object_size)
    return {k: jnp.asarray(v) for k, v in batch.items() if k not in ("pose_w",)}


def test_coarse_train_step_and_eval(small_cfg, small_embedder, small_data):
    cfg, embedder, data = small_cfg, small_embedder, small_data
    model = CellRetrievalNetwork(cfg.model)
    optimizer = steps.make_optimizer(cfg, steps_per_epoch=4)
    rng = jax.random.PRNGKey(0)

    batch = _gather_batch(data, cfg, np.arange(cfg.train.batch_size))
    objects, text = steps.prepare_coarse_batch(batch, embedder, cfg, rng, train=False)
    state = steps.init_train_state(model, optimizer, rng, objects, text)

    step = jax.jit(steps.make_coarse_train_step(model, embedder, cfg, optimizer))
    losses = []
    for i in range(3):
        state, metrics_out = step(state, batch, rng)
        losses.append(float(metrics_out["loss"]))
    assert np.isfinite(losses).all(), losses
    assert int(state.step) == 3

    acc, acc_close, retrievals = eval_retrieval(data, state, model, embedder, cfg)
    for k in cfg.train.top_k:
        assert 0.0 <= acc[k] <= 1.0
        assert 0.0 <= acc_close[k] <= 1.0
    assert retrievals.shape == (data.num_poses, min(max(cfg.train.top_k), data.num_cells))
