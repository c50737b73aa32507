"""End-to-end determinism (SURVEY.md section 4, plan item d).

Same seeds + same data must produce identical losses and identical
retrieval/eval outputs across runs — the property that makes TPU preemption
recovery and cross-run comparisons trustworthy.
"""

import jax
import pytest
import numpy as np

from text2loc_tpu.evaluation.retrieval import eval_retrieval
from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
from text2loc_tpu.training import steps


def _run_once(cfg, embedder, data):
    model = CellRetrievalNetwork(cfg.model)
    optimizer = steps.make_optimizer(cfg, steps_per_epoch=2)
    rng = jax.random.PRNGKey(7)
    batch = data.gather_coarse(np.arange(cfg.train.batch_size), cfg.model.object_size)
    objects, text = steps.prepare_coarse_batch(batch, embedder, cfg, rng, train=False)
    state = steps.init_train_state(model, optimizer, rng, objects, text)
    step = jax.jit(steps.make_coarse_train_step(model, embedder, cfg, optimizer))
    losses = []
    for _ in range(2):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    acc, acc_close, idx = eval_retrieval(data, state, model, embedder, cfg)
    return losses, acc, idx


@pytest.mark.slow
def test_training_and_eval_deterministic(small_cfg, small_embedder, small_data):
    l1, a1, i1 = _run_once(small_cfg, small_embedder, small_data)
    l2, a2, i2 = _run_once(small_cfg, small_embedder, small_data)
    assert l1 == l2, (l1, l2)
    assert a1 == a2
    np.testing.assert_array_equal(i1, i2)
