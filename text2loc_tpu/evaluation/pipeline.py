"""End-to-end coarse-to-fine evaluation — THE benchmark entry point.

Rebuild of /root/reference/evaluation/pipeline.py:41-286. Two stages:

* `run_coarse` — full-gallery retrieval (reusing the on-device matmul+top-k of
  text2loc_tpu.evaluation.retrieval) scored as "predict the cell center"
  (pos_in_cells = 0.5, reference pipeline.py:70-83).
* `run_fine` — the retrieved top-k candidates refined by CrossMatch. The
  reference loops poses one at a time (a single-item Python loop flagged HOT
  at pipeline.py:105-126); here all Q poses x K candidates are flattened into
  [Q*K] device batches — the fine stage is a handful of MXU-bound forwards.

Output: two k x thresh localization-recall tables (the published format,
evaluation/utils.py:57-69), with cross-scene retrievals masked to infinite
distance (utils.py:49-51).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from text2loc_tpu.config import Config
from text2loc_tpu.data.arrays import MultiSceneArrays
from text2loc_tpu.evaluation import metrics
from text2loc_tpu.evaluation.retrieval import eval_retrieval
from text2loc_tpu.models.text_embedding import HintTextEmbedder
from text2loc_tpu.training.steps import (
    TrainState,
    encode_fine_gallery,
    make_fine_forward,
    make_fine_split_forwards,
)


def run_coarse(
    data: MultiSceneArrays,
    state: TrainState,
    model,
    embedder: HintTextEmbedder,
    cfg: Config,
) -> Tuple[Dict[int, Dict[float, float]], np.ndarray]:
    """Retrieval + center-guess accuracy table (reference pipeline.py:41-87).

    Returns (accuracy table, retrievals [Q, max_k]).
    """
    top_k = cfg.eval.top_k
    _, _, retrievals = eval_retrieval(
        data, state, model, embedder, cfg, top_k=top_k
    )
    k = retrievals.shape[1]
    bbox = data.cell_bbox[retrievals]                      # [Q, K, 6]
    sizes = data.cell_size[retrievals]                     # [Q, K]
    scenes = data.cell_scene_idx[retrievals]               # [Q, K]
    center = np.full((data.num_poses, k, 2), 0.5, np.float32)
    accs = metrics.localization_accuracies(
        pose_w=data.pose_w[:, :2],
        pose_scene_idx=data.pose_scene_idx,
        top_cell_bbox=bbox,
        top_cell_size=sizes,
        top_cell_scene_idx=scenes,
        pos_in_cells=center,
        top_k=[kk for kk in top_k if kk <= k],
        threshs=cfg.eval.threshs,
    )
    return accs, retrievals


def run_fine(
    data: MultiSceneArrays,
    retrievals: np.ndarray,
    state: TrainState,
    model,
    embedder: HintTextEmbedder,
    cfg: Config,
    chunk: Optional[int] = None,
    precompute_cells: bool = True,
) -> Tuple[Dict[int, Dict[float, float]], np.ndarray, float]:
    """Batched fine refinement over all (pose, candidate) pairs.

    Returns (accuracy table, pos_in_cells [Q, K, 2], queries/sec) — the
    throughput figure mirrors the reference's stage timer (pipeline.py:102-126).

    With `precompute_cells` (default), each DISTINCT retrieved cell's object
    embeddings are encoded once and reused across every (pose, candidate)
    pair — identical outputs (the object tower is query-independent and eval
    BatchNorm uses running stats), radically less compute than the
    reference's per-pose recompute loop. False forces the pair-by-pair
    recompute (the reference's exact work).
    """
    q, k = retrievals.shape
    pad = cfg.model.pad_size
    pose_idx = np.repeat(np.arange(q), k)
    cell_idx = retrievals.reshape(-1)
    total = len(pose_idx)
    # Default device chunk: bounded so the PointNet SA edge activations
    # (chunk * pad_size clouds) stay well inside HBM (see bench.py).
    chunk = chunk or min(cfg.eval.batch_size * max(cfg.eval.top_k), 128)
    rng = jax.random.PRNGKey(0)

    out = np.zeros((total, 2), np.float32)
    if precompute_cells:
        fwd = make_fine_split_forwards(model, embedder, cfg)
        uniq, inv = np.unique(cell_idx, return_inverse=True)
        start = time.perf_counter()
        # Encode each distinct candidate cell once.
        cell_emb, cell_mask = encode_fine_gallery(
            fwd, data, state.params, state.batch_stats, pad, rng,
            cell_indices=uniq, chunk=chunk,
        )
        # Encode each pose's hints once (shared by its K candidates).
        if getattr(cfg.eval, "sentence_table", False):
            # The fine text path is the per-sentence trunk ONLY (CrossMatch
            # .encode_hints — no cross-sentence head), so over the closed
            # vocabulary it is exactly a [V, D] table gather. Same
            # construction as serving's fine sentence table; equality with
            # the full trunk is float tolerance
            # (tests/test_eval_sentence_table.py).
            import jax.numpy as jnp

            from text2loc_tpu import constants as C
            from text2loc_tpu.evaluation.retrieval import (
                build_vocab_sentence_table,
            )

            ftbl = build_vocab_sentence_table(
                model, embedder, state.params, state.batch_stats,
                model.encode_hints,
            )                                                 # [V, D]
            ids = C.hint_id(data.hint_dir, data.hint_color, data.hint_label)
            hints = np.asarray(jnp.take(ftbl, jnp.asarray(ids), axis=0))
        else:
            hint_rows = []
            for s in range(0, q, chunk):
                ids = np.resize(np.arange(s, min(s + chunk, q)), chunk)
                tb = {
                    "hint_dir": data.hint_dir[ids],
                    "hint_color": data.hint_color[ids],
                    "hint_label": data.hint_label[ids],
                    "sentence_mask": data.hint_mask[ids],
                }
                h = fwd.encode_text(state.params, state.batch_stats, tb)
                hint_rows.append(np.asarray(h)[: min(chunk, q - s)])
            hints = np.concatenate(hint_rows, axis=0)        # [Q, S, D]
        # Per-pair: cached object embeddings x cached hint encodings.
        for s in range(0, total, chunk):
            idx = np.arange(s, min(s + chunk, total))
            full = np.resize(idx, chunk)
            pi = pose_idx[full]
            pred = fwd.cct(
                state.params, state.batch_stats,
                cell_emb[inv[full]], cell_mask[inv[full]],
                hints[pi], data.hint_mask[pi],
            )
            out[idx] = np.asarray(pred)[: len(idx)]
        elapsed = time.perf_counter() - start
    else:
        forward = make_fine_forward(model, embedder, cfg)
        start = time.perf_counter()
        for s in range(0, total, chunk):
            idx = np.arange(s, min(s + chunk, total))
            full = np.resize(idx, chunk)  # pad the tail by wrapping
            batch = data.gather_fine(
                pose_idx[full], pad, cell_indices=cell_idx[full], match_first=False
            )
            pred = forward(state.params, state.batch_stats, batch, rng)
            out[idx] = np.asarray(pred)[: len(idx)]
        elapsed = time.perf_counter() - start
    qps = q / max(elapsed, 1e-9)

    pos_in_cells = out.reshape(q, k, 2)
    accs = metrics.localization_accuracies(
        pose_w=data.pose_w[:, :2],
        pose_scene_idx=data.pose_scene_idx,
        top_cell_bbox=data.cell_bbox[retrievals],
        top_cell_size=data.cell_size[retrievals],
        top_cell_scene_idx=data.cell_scene_idx[retrievals],
        pos_in_cells=pos_in_cells,
        top_k=[kk for kk in cfg.eval.top_k if kk <= k],
        threshs=cfg.eval.threshs,
    )
    return accs, pos_in_cells, qps


def run_pipeline(
    data: MultiSceneArrays,
    coarse_state: TrainState,
    coarse_model,
    fine_state: TrainState,
    fine_model,
    embedder: HintTextEmbedder,
    cfg: Config,
    verbose: bool = True,
):
    """Full pipeline: coarse retrieval -> fine refinement -> both tables
    (reference pipeline.py:207-286)."""
    coarse_accs, retrievals = run_coarse(data, coarse_state, coarse_model, embedder, cfg)
    fine_accs, pos_in_cells, qps = run_fine(
        data, retrievals, fine_state, fine_model, embedder, cfg
    )
    if verbose:
        metrics.print_accuracies(coarse_accs, "Coarse")
        metrics.print_accuracies(fine_accs, "Fine")
        print(f"Fine matching: {qps:.1f} queries/sec", flush=True)
    return {
        "coarse": coarse_accs,
        "fine": fine_accs,
        "retrievals": retrievals,
        "pos_in_cells": pos_in_cells,
        "fine_qps": qps,
    }


if __name__ == "__main__":
    from text2loc_tpu.evaluation.cli import main_pipeline

    main_pipeline()
