"""run_fine's batched accuracy table vs a brute-force per-pose oracle.

The reference computes localization recall pose-by-pose
(evaluation/pipeline.py:141-196 + evaluation/utils.py:31-54); our run_fine
flattens Q*K candidates into device batches. This test re-derives the table
with an explicit python loop from run_fine's own predictions and asserts
equality — catching any indexing/reshape error in the batched path.
"""

import dataclasses

import jax
import numpy as np

from text2loc_tpu.evaluation.pipeline import run_coarse, run_fine
from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
from text2loc_tpu.models.cross_matcher import CrossMatch
from text2loc_tpu.training import steps


def test_run_fine_matches_per_pose_oracle(small_cfg, small_embedder, small_data):
    cfg = small_cfg.replace(
        eval=dataclasses.replace(
            small_cfg.eval, top_k=(1, 2), threshs=(5.0, 15.0, 40.0), batch_size=8
        )
    )
    data, embedder = small_data, small_embedder
    rng = jax.random.PRNGKey(0)
    opt = steps.make_optimizer(cfg, 1)

    coarse_model = CellRetrievalNetwork(cfg.model)
    cb = data.gather_coarse(np.arange(4), cfg.model.object_size)
    cobj, ctext = steps.prepare_coarse_batch(cb, embedder, cfg, rng, train=False)
    coarse_state = steps.init_train_state(coarse_model, opt, rng, cobj, ctext)

    fine_model = CrossMatch(cfg.model)
    fb = data.gather_fine(np.arange(4), cfg.model.pad_size)
    pfb = steps.prepare_fine_batch(fb, embedder, cfg, rng, train=False)
    fine_state = steps.init_train_state(fine_model, opt, rng, pfb.objects, pfb.text)

    _, retrievals = run_coarse(data, coarse_state, coarse_model, embedder, cfg)
    accs, pos_in_cells, _ = run_fine(
        data, retrievals, fine_state, fine_model, embedder, cfg
    )

    # The cached-cell path (distinct cells encoded once) must equal the
    # reference-style pair-by-pair recompute: the object tower is query-
    # independent and eval BatchNorm uses running statistics.
    accs_raw, pos_raw, _ = run_fine(
        data, retrievals, fine_state, fine_model, embedder, cfg,
        precompute_cells=False,
    )
    np.testing.assert_allclose(pos_in_cells, pos_raw, atol=1e-5, rtol=1e-5)
    assert accs == accs_raw

    # Brute-force oracle from the same predictions.
    q, k = retrievals.shape
    for kk in [x for x in cfg.eval.top_k if x <= k]:
        for t in cfg.eval.threshs:
            hits = 0
            for qi in range(q):
                best = np.inf
                for ki in range(kk):
                    ci = retrievals[qi, ki]
                    if data.cell_scene_idx[ci] != data.pose_scene_idx[qi]:
                        continue  # cross-scene -> infinite distance
                    bbox = data.cell_bbox[ci]
                    pred = bbox[:2] + pos_in_cells[qi, ki] * data.cell_size[ci]
                    best = min(best, float(np.linalg.norm(data.pose_w[qi, :2] - pred)))
                hits += best <= t
            np.testing.assert_allclose(accs[kk][t], hits / q, atol=1e-9)
