"""Training actually learns: coarse contrastive on a synthetic scene drives
train-set retrieval recall far above chance, and the loss decreases.

The synthetic scenes carry real signal (hints describe each pose's closest
objects by class/color/direction), so a working pipeline must separate cells.
"""

import dataclasses

import jax
import pytest

import numpy as np

from text2loc_tpu.evaluation.retrieval import eval_retrieval
from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
from text2loc_tpu.training import steps


@pytest.mark.slow
def test_coarse_training_learns(small_cfg, small_embedder, small_data):
    cfg = small_cfg.replace(
        train=dataclasses.replace(
            small_cfg.train, batch_size=8, learning_rate=5e-3, top_k=(1, 3)
        )
    )
    data, embedder = small_data, small_embedder
    model = CellRetrievalNetwork(cfg.model)
    optimizer = steps.make_optimizer(cfg, steps_per_epoch=100)
    rng = jax.random.PRNGKey(3)

    batch0 = data.gather_coarse(np.arange(8), cfg.model.object_size)
    objects, text = steps.prepare_coarse_batch(batch0, embedder, cfg, rng, train=False)
    state = steps.init_train_state(model, optimizer, rng, objects, text)

    step = jax.jit(
        steps.make_coarse_train_step(model, embedder, cfg, optimizer),
        donate_argnums=(0,),
    )
    order = np.random.default_rng(0)
    first_losses, last_losses = [], []
    n_steps = 60
    for i in range(n_steps):
        idx = order.choice(data.num_poses, 8, replace=False)
        batch = data.gather_coarse(idx, cfg.model.object_size)
        rng, srng = jax.random.split(rng)
        state, metrics = step(state, batch, srng)
        loss = float(metrics["loss"])
        (first_losses if i < 10 else last_losses)[:0] = [loss]

    assert np.mean(last_losses[:10]) < np.mean(first_losses), (
        np.mean(first_losses), np.mean(last_losses[:10])
    )

    acc, _, _ = eval_retrieval(data, state, model, embedder, cfg)
    chance = 1.0 / data.num_cells
    # Train-set recall@1 must beat chance decisively (12 cells -> ~8%).
    assert acc[1] > 3 * chance, (acc, chance)
