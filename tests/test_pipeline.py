"""End-to-end evaluation pipeline on synthetic scenes (coarse -> fine ->
k x thresh tables), the equivalent of the reference's evaluation.pipeline run."""

import dataclasses

import jax
import numpy as np

from text2loc_tpu.evaluation.pipeline import run_pipeline
from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
from text2loc_tpu.models.cross_matcher import CrossMatch
from text2loc_tpu.training import steps


def _init_state(model, optimizer, rng, objects, text):
    return steps.init_train_state(model, optimizer, rng, objects, text)


def test_pipeline_tables(small_cfg, small_embedder, small_data):
    cfg = small_cfg.replace(
        eval=dataclasses.replace(small_cfg.eval, top_k=(1, 2, 3), batch_size=8)
    )
    data, embedder = small_data, small_embedder
    rng = jax.random.PRNGKey(0)

    coarse_model = CellRetrievalNetwork(cfg.model)
    fine_model = CrossMatch(cfg.model)
    optimizer = steps.make_optimizer(cfg, steps_per_epoch=1)

    cbatch = data.gather_coarse(np.arange(4), cfg.model.object_size)
    cobj, ctext = steps.prepare_coarse_batch(cbatch, embedder, cfg, rng, train=False)
    coarse_state = _init_state(coarse_model, optimizer, rng, cobj, ctext)

    fbatch = data.gather_fine(np.arange(4), cfg.model.pad_size)
    fb = steps.prepare_fine_batch(fbatch, embedder, cfg, rng, train=False)
    fine_state = _init_state(fine_model, optimizer, rng, fb.objects, fb.text)

    result = run_pipeline(
        data, coarse_state, coarse_model, fine_state, fine_model, embedder, cfg,
        verbose=False,
    )

    q = data.num_poses
    max_k = min(max(cfg.eval.top_k), data.num_cells)
    assert result["retrievals"].shape == (q, max_k)
    assert result["pos_in_cells"].shape == (q, max_k, 2)
    assert result["fine_qps"] > 0

    for table in (result["coarse"], result["fine"]):
        ks = sorted(table.keys())
        # Recall non-decreasing in k and in threshold.
        for t in cfg.eval.threshs:
            vals = [table[k][t] for k in ks]
            assert all(0.0 <= v <= 1.0 for v in vals)
            assert vals == sorted(vals), (t, vals)
        for k in ks:
            row = [table[k][t] for t in cfg.eval.threshs]
            assert row == sorted(row), (k, row)
