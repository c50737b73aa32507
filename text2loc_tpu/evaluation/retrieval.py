"""Gallery encoding and on-device top-k retrieval.

The reference scores each query against the full cell gallery with a per-query
host numpy matmul + argsort (/root/reference/training/coarse.py:119-125). Here
the whole retrieval is one on-device [Q, D] @ [D, C] matmul + `lax.top_k` —
MXU-bound and jitted once. The sharded multi-chip variant (gallery split over
the mesh, per-shard top-k + ICI merge) lives in text2loc_tpu.parallel.retrieval.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from text2loc_tpu.config import Config
from text2loc_tpu.data.arrays import MultiSceneArrays
from text2loc_tpu.evaluation import metrics
from text2loc_tpu.models.text_embedding import HintTextEmbedder
from text2loc_tpu.training.steps import TrainState, make_coarse_encoders


def _approx_topk() -> bool:
    """`TEXT2LOC_APPROX_TOPK=1` swaps `lax.top_k` for TPU `approx_max_k`
    in gallery retrieval. Opt-in, default OFF: exact selection is the
    reference protocol (argsort over all cells, training/coarse.py:119-125)
    and its tie-breaking is what the parity tests pin. Read at TRACE time —
    A/B scripts must build fresh jitted closures per variant (CLAUDE.md)."""
    return os.environ.get("TEXT2LOC_APPROX_TOPK", "0") == "1"


@functools.partial(jax.jit, static_argnames=("k", "approx"))
def _topk_impl(cell_enc: jax.Array, text_enc: jax.Array, k: int, approx: bool):
    scores = jnp.einsum(
        "qd,cd->qc", text_enc.astype(jnp.float32), cell_enc.astype(jnp.float32)
    )
    if approx:
        # TPU-native approximate max-k (Chern et al. 2022): partial-reduce
        # per bucket then aggregate, skipping the full [Q, C] sort. With the
        # default recall_target (0.95) the measured top-1 agreement vs exact
        # on unit-normalized galleries is 1.0 and the top-10 overlap ~0.983
        # (BENCHMARKS log #21).
        return jax.lax.approx_max_k(scores, k)
    return jax.lax.top_k(scores, k)


def topk_retrieval(cell_enc: jax.Array, text_enc: jax.Array, k: int):
    """Top-k gallery indices per query by descending inner product.

    cell_enc: [C, D]; text_enc: [Q, D] (both L2-normalized by the towers).
    Returns (scores [Q, k], indices [Q, k]). Selection is exact `lax.top_k`
    unless TEXT2LOC_APPROX_TOPK=1 (see `_approx_topk`)."""
    return _topk_impl(cell_enc, text_enc, k, _approx_topk())


def _batched(n: int, batch: int):
    for start in range(0, n, batch):
        yield np.arange(start, min(start + batch, n))


def encode_gallery(
    data: MultiSceneArrays,
    state: TrainState,
    encode_cells,
    cfg: Config,
    rng: jax.Array,
) -> np.ndarray:
    """Encode every cell of the gallery (reference coarse.py:104-113).

    Pads the final batch to keep a single compiled shape.
    """
    bsz = cfg.eval.batch_size
    d = cfg.model.coarse_embed_dim
    out = np.zeros((data.num_cells, d), np.float32)
    for idx in _batched(data.num_cells, bsz):
        full = np.resize(idx, bsz)  # pad by wrapping; extra rows discarded
        batch = data.gather_cell_objects(full, cfg.model.object_size)
        enc = encode_cells(state.params, state.batch_stats, batch, rng)
        out[idx] = np.asarray(enc)[: len(idx)]
    return out


def encode_queries(
    data: MultiSceneArrays,
    state: TrainState,
    encode_text,
    cfg: Config,
) -> np.ndarray:
    """Encode every pose's hint set (reference coarse.py:89-101)."""
    bsz = cfg.eval.batch_size
    d = cfg.model.coarse_embed_dim
    out = np.zeros((data.num_poses, d), np.float32)
    for idx in _batched(data.num_poses, bsz):
        full = np.resize(idx, bsz)
        batch = {
            "hint_dir": data.hint_dir[full],
            "hint_color": data.hint_color[full],
            "hint_label": data.hint_label[full],
            "sentence_mask": data.hint_mask[full],
        }
        enc = encode_text(state.params, state.batch_stats, batch)
        out[idx] = np.asarray(enc)[: len(idx)]
    return out


def build_vocab_sentence_table(model, embedder: HintTextEmbedder, params,
                               batch_stats, method):
    """[V, D] per-sentence trunk outputs over the closed hint vocabulary.

    The per-sentence text trunk is a pure function of one sentence's frozen
    token embeddings at eval, so it collapses to a table built once per
    weights. `method` selects the trunk: CellRetrievalNetwork
    .encode_text_sentences (coarse) or CrossMatch.encode_hints (fine). The
    ONE construction shared by serving (Localizer._build_sentence_tables),
    the eval loop (make_sentence_table_text_encoder), run_fine's table
    option, and bench.py."""
    from text2loc_tpu.data.batch import TextSet

    v = embedder.table.shape[0]
    vocab = TextSet(
        token_embeds=jnp.asarray(embedder.table)[:, None],   # [V, 1, T, E]
        token_mask=jnp.asarray(embedder.token_mask)[:, None],
        sentence_mask=jnp.ones((v, 1), bool),
    )
    out = jax.jit(
        lambda p, s, t: model.apply(
            {"params": p, "batch_stats": s}, t, train=False, method=method,
        )
    )(params, batch_stats, vocab)
    return out[:, 0]                                         # [V, D]


def make_sentence_table_text_encoder(model, embedder: HintTextEmbedder):
    """(build_table, encode) for the sentence-table query path.

    At eval the per-sentence text trunk is a pure function of the sentence
    (LanguageEncoder.encode_sentences), so over the closed hint vocabulary
    it collapses to a [V, D] table built ONCE per weights; each query then
    costs a row gather + the tiny cross-sentence head instead of the full
    intra stack at E=1024. Same construction as the serving path
    (serving.Localizer._build_sentence_tables); here it is the opt-in
    eval-loop variant (EvalConfig.sentence_table) for real-data evals where
    Q * S >> V. Equality with the full trunk is float-tolerance
    (tests/test_eval_sentence_table.py).
    """
    from text2loc_tpu import constants as C

    def build_table(params, batch_stats):
        return build_vocab_sentence_table(
            model, embedder, params, batch_stats,
            model.encode_text_sentences,
        )

    @jax.jit
    def encode(params, batch_stats, table, batch):
        ids = C.hint_id(batch["hint_dir"], batch["hint_color"],
                        batch["hint_label"])
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.take(table, ids, axis=0),
            jnp.asarray(batch["sentence_mask"], bool),
            train=False, method=model.encode_text_from_sentences,
        )

    return build_table, encode


def encode_queries_table(
    data: MultiSceneArrays,
    state: TrainState,
    model,
    embedder: HintTextEmbedder,
    cfg: Config,
) -> np.ndarray:
    """encode_queries via the precomputed sentence table (see above)."""
    build_table, encode = make_sentence_table_text_encoder(model, embedder)
    table = build_table(state.params, state.batch_stats)
    bsz = cfg.eval.batch_size
    out = np.zeros((data.num_poses, cfg.model.coarse_embed_dim), np.float32)
    for idx in _batched(data.num_poses, bsz):
        full = np.resize(idx, bsz)
        batch = {
            "hint_dir": data.hint_dir[full],
            "hint_color": data.hint_color[full],
            "hint_label": data.hint_label[full],
            "sentence_mask": data.hint_mask[full],
        }
        enc = encode(state.params, state.batch_stats, table, batch)
        out[idx] = np.asarray(enc)[: len(idx)]
    return out


def eval_retrieval(
    data: MultiSceneArrays,
    state: TrainState,
    model,
    embedder: HintTextEmbedder,
    cfg: Config,
    top_k: Optional[Sequence[int]] = None,
    rng: Optional[jax.Array] = None,
    mesh=None,
    encoders=None,
) -> Tuple[Dict[int, float], Dict[int, float], np.ndarray]:
    """Full eval_epoch equivalent (reference training/coarse.py:63-157).

    With a mesh, the gallery is sharded across chips and top-k candidates are
    merged over ICI (text2loc_tpu.parallel.retrieval).

    Pass prebuilt `encoders` ((encode_cells, encode_text) from
    make_coarse_encoders) when calling in a loop — each fresh build is a new
    jit wrapper whose first call retraces and recompiles, minutes per epoch
    over the remote-compile tunnel.

    Returns (top-k recall, close recall, retrieved gallery indices [Q, max_k]).
    """
    top_k = tuple(top_k) if top_k is not None else cfg.train.top_k
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    encode_cells, encode_text = (
        encoders if encoders is not None
        else make_coarse_encoders(model, embedder, cfg)
    )

    cell_enc = encode_gallery(data, state, encode_cells, cfg, rng)
    if getattr(cfg.eval, "sentence_table", False):
        text_enc = encode_queries_table(data, state, model, embedder, cfg)
    else:
        text_enc = encode_queries(data, state, encode_text, cfg)
    k = min(max(top_k), data.num_cells)
    if mesh is not None:
        from text2loc_tpu.parallel.retrieval import sharded_topk_retrieval

        _, idx = sharded_topk_retrieval(cell_enc, text_enc, k, mesh)
    else:
        _, idx = topk_retrieval(jnp.asarray(cell_enc), jnp.asarray(text_enc), k)
    idx = np.asarray(idx)

    cell_centers = data.cell_centers
    acc, acc_close = metrics.retrieval_accuracies(
        retrieved_cell_idx=idx,
        target_cell_idx=data.pose_cell_idx,
        pose_w=data.pose_w[:, :2],
        cell_centers=cell_centers,
        cell_size=float(data.cell_size[0]),
        top_k=top_k,
    )
    return acc, acc_close, idx
