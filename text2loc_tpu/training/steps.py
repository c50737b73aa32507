"""Jittable train/eval steps for both stages.

Replaces the reference's per-batch Python train loops
(/root/reference/training/coarse.py:32-60, training/fine.py:39-100) with pure
functions: augmentation, frozen-text lookup, both tower forwards, loss, grads
and the optimizer update are one XLA program. Multi-chip data parallelism is
the same step jitted with a batch sharded over the mesh's `dp` axis and
replicated params — XLA inserts the ICI collectives (the global-batch InfoNCE
similarity matrix implies an all-gather of both towers' embeddings, the working
equivalent of the reference's dead NT_Xent/GatherLayer path, losses.py:386-387).
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from text2loc_tpu.config import Config
from text2loc_tpu.data import augment
from text2loc_tpu.data.batch import FineBatch, ObjectSet, TextSet
from text2loc_tpu.models import pointnet2
from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
from text2loc_tpu.models.cross_matcher import CrossMatch
from text2loc_tpu.models.text_embedding import HintTextEmbedder
from text2loc_tpu.training import losses


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    """Per-epoch LR decay (reference coarse.py:272-277, torch semantics)."""
    t = cfg.train
    if t.lr_scheduler == "exponential":
        return optax.exponential_decay(
            t.learning_rate, transition_steps=max(steps_per_epoch, 1),
            decay_rate=t.lr_gamma, staircase=True,
        )
    if t.lr_scheduler == "step":
        return optax.exponential_decay(
            t.learning_rate,
            transition_steps=max(steps_per_epoch * t.lr_step, 1),
            decay_rate=t.lr_gamma, staircase=True,
        )
    raise ValueError(t.lr_scheduler)


def make_optimizer(cfg: Config, steps_per_epoch: int, lr: Optional[float] = None):
    sched = lr if lr is not None else make_lr_schedule(cfg, steps_per_epoch)
    return optax.adam(sched)


def embed_text_batch(embedder: HintTextEmbedder, batch) -> TextSet:
    """TextSet from a batch dict: table lookup for hint triples, or a direct
    pass-through when the batch already carries embedded sentences
    (`token_embeds`/`token_mask` [B, S, T, E]/[B, S, T] — the online-encoder
    path for out-of-vocabulary queries, models/t5_encoder.py)."""
    if "token_embeds" in batch:
        return TextSet(
            jnp.asarray(batch["token_embeds"]),
            jnp.asarray(batch["token_mask"], bool),
            jnp.asarray(batch["sentence_mask"], bool),
        )
    return embedder.embed(
        batch["hint_dir"], batch["hint_color"], batch["hint_label"],
        sentence_mask=batch.get("sentence_mask"),
    )


def _build_object_set(batch: Dict[str, jnp.ndarray], xyz, rgb) -> ObjectSet:
    return ObjectSet(
        xyz=xyz,
        rgb=rgb,
        center=batch["center"],
        color=batch["color"],
        num_points=batch["num_points"],
        class_idx=batch["class_idx"],
        color_idx=batch["color_idx"],
        mask=batch["mask"],
    )


def prepare_coarse_batch(batch, embedder: HintTextEmbedder, cfg: Config, rng,
                         train: bool) -> Tuple[ObjectSet, TextSet]:
    """On-device augmentation + frozen-text lookup for a gathered batch."""
    t = cfg.train
    kf, ks, kp = jax.random.split(rng, 3)
    if train and t.flip_poses:
        batch = augment.flip_coarse(batch, kf)
    if train and t.shuffle_hints:
        batch = augment.shuffle_hints(batch, ks)
    xyz, rgb = augment.point_cloud_transform(
        batch["xyz"], batch["rgb"], kp,
        num_points=cfg.model.pointnet.num_points,
        augment=train and t.pc_augment,
    )
    objects = _build_object_set(batch, xyz, rgb)
    # Shared lookup (handles the online-encoder token_embeds passthrough for
    # OOV eval batches exactly like prepare_fine_batch).
    text = embed_text_batch(embedder, batch)
    return objects, text


def prepare_negative_objects(batch, cfg: Config, rng) -> ObjectSet:
    """ObjectSet for the `neg_*` cell of a triplet batch (gather_coarse with
    `negative_rng`). No flip: the negative has no geometric relation to the
    hints, so flipping it changes nothing about the triplet."""
    xyz, rgb = augment.point_cloud_transform(
        batch["neg_xyz"], batch["neg_rgb"], rng,
        num_points=cfg.model.pointnet.num_points,
        augment=cfg.train.pc_augment,
    )
    return ObjectSet(
        xyz=xyz, rgb=rgb, center=batch["neg_center"], color=batch["neg_color"],
        num_points=batch["neg_num_points"], class_idx=batch["neg_class_idx"],
        color_idx=batch["neg_color_idx"], mask=batch["neg_mask"],
    )


# What TEXT2LOC_FUSED_SA_TRAIN "auto" resolves to per stage: the measured
# per-level winners of the cached-e/recompute/XLA sweep (BENCHMARKS.md log
# #11; tokens per SA level, "0"=XLA, "1"=recompute kernel, "e32"=f32
# cached-edge kernel). The stages differ because the fine stage's 4x
# smaller cloud batch moves the crossover. f32 bodies only: the cache
# dtype must match the compute dtype (mismatches pay per-pass converts on
# the [T, H] tiles — bf16-body e32,e32,1 measured 106.5 ms vs its 91.1
# baseline), and the bf16-body sweep produced no winner clear of the
# run-to-run noise, so bf16 bodies keep the plain last-level default.
# Applied only when the ladder depth matches the measured 3-level config.
COARSE_FUSED_TRAIN_AUTO = ("e32", "e32", "1")
FINE_FUSED_TRAIN_AUTO = ("0", "e32", "e32")

# HBM budget for the cached-edge residuals, GB per chip (env
# TEXT2LOC_FUSED_SA_ECACHE_GB overrides). The cached-e kernels write one
# [N_clouds, S*K, H1] tensor per cached level that stays live as an AD
# residual until the backward — linear in batch size, and by far the
# largest allocation of a cached-edge train step. Measured anchors on the
# 16 GB v5e (scripts/probe_batch_scaling.py): fine batch 256 under the
# (0, e32, e32) auto = 8.6 GB of e cache, runs; coarse batch 256 under
# (e32, e32, 1) = 11.3 GB, OOMs; the all-recompute kernel (edges stay in
# VMEM) runs coarse 256 fine at 1011 ms/step. 9 GB sits between the
# measured-good and measured-bad anchors.
_ECACHE_BUDGET_GB = 9.0


def _ecache_gb(cfg: Config, tokens, n_clouds: int) -> float:
    """Estimated HBM bytes (in GB) of the cached-edge residuals for one
    train step: sum over e/e32 levels of n_clouds * S * K * H1 * itemsize.
    Slight underestimate (the kernel pads N up to its grid tile), covered
    by the budget's headroom."""
    pn = cfg.model.pointnet
    total = 0
    for i, tok in enumerate(tokens):
        if tok not in ("e", "e32"):
            continue
        itemsize = 4 if tok == "e32" else 2
        total += (n_clouds * pn.sa_num_points[i] * pn.sa_max_neighbors
                  * pn.sa_mlps[i][1] * itemsize)
    return total / 1e9


def _stage_auto(cfg: Config, tokens, n_clouds: int = 0):
    """Resolve the stage's fused-SA auto tokens, HBM-aware.

    `n_clouds` is the per-chip point-cloud count of one step (batch x
    object slots, doubled for triplet's live second tower). When the
    cached-edge residuals would exceed the budget, every e/e32 token
    degrades to "1" (the recompute kernel, whose edges live only in VMEM)
    instead of OOMing — the measured-safe large-batch config. An explicit
    TEXT2LOC_FUSED_SA_TRAIN env value still bypasses auto entirely."""
    n = len(cfg.model.pointnet.sa_mlps)
    body = cfg.model.body_dtype or cfg.model.train_dtype
    if len(tokens) != n or body != "float32":
        return None
    budget = float(os.environ.get(
        "TEXT2LOC_FUSED_SA_ECACHE_GB", _ECACHE_BUDGET_GB))
    gb = _ecache_gb(cfg, tokens, n_clouds)
    if gb > budget:
        logging.getLogger(__name__).info(
            "fused-SA auto: est. %.1f GB of cached-edge residuals exceeds "
            "the %.1f GB budget (TEXT2LOC_FUSED_SA_ECACHE_GB); using the "
            "recompute kernel for the cached levels", gb, budget)
        tokens = tuple("1" if t in ("e", "e32") else t for t in tokens)
    return tokens


def make_coarse_train_step(model: CellRetrievalNetwork, embedder: HintTextEmbedder,
                           cfg: Config, optimizer, *, n_shards: int = 1) -> Callable:
    is_triplet = cfg.train.loss.ranking_loss == "triplet"
    margin = cfg.train.loss.margin
    loss_fn_sel = None if is_triplet else losses.make_retrieval_loss(cfg.train.loss)
    # Triplet keeps BOTH towers' SA residuals live until the backward.
    n_clouds = (-(-cfg.train.batch_size // n_shards) * cfg.model.object_size
                * (2 if is_triplet else 1))
    auto = _stage_auto(cfg, COARSE_FUSED_TRAIN_AUTO, n_clouds)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        rng = jax.random.fold_in(rng, state.step)
        kaug, kdrop, kneg, kdrop_neg = jax.random.split(rng, 4)
        objects, text = prepare_coarse_batch(batch, embedder, cfg, kaug, train=True)
        neg_objects = (
            prepare_negative_objects(batch, cfg, kneg) if is_triplet else None
        )

        def loss_of(params):
            (cell_emb, text_emb), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                objects, text, train=True,
                mutable=["batch_stats"], rngs={"dropout": kdrop},
            )
            if is_triplet:
                # Negative tower pass chained AFTER the positive one so BN
                # running stats see both batches, like the reference's
                # sequential encode_objects calls (coarse.py:44-50).
                # Independent dropout key: reusing kdrop would give the
                # negative tower bit-identical masks to the positive pass
                # (same module paths/shapes), correlating the pos/neg noise
                # where the reference's torch dropout draws independently.
                neg_emb, updates = model.apply(
                    {"params": params,
                     "batch_stats": updates["batch_stats"]},
                    neg_objects, train=True,
                    mutable=["batch_stats"], rngs={"dropout": kdrop_neg},
                    method=model.encode_objects,
                )
                # nn.TripletMarginLoss on the (normalized) tower outputs
                # (reference coarse.py:268, :50).
                loss = losses.triplet_margin_loss(
                    text_emb, cell_emb, neg_emb, margin
                )
                return loss, updates["batch_stats"]
            # anchor = text, positive = cell (reference coarse.py:44-52).
            loss = loss_fn_sel(text_emb, cell_emb)
            return loss, updates["batch_stats"]

        with pointnet2.fused_train_auto(auto):
            (loss, new_stats), grads = jax.value_and_grad(
                loss_of, has_aux=True
            )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_stats, new_opt, state.step + 1)
        return new_state, {"loss": loss}

    return step


def make_coarse_encoders(model: CellRetrievalNetwork, embedder: HintTextEmbedder,
                         cfg: Config):
    """Inference-mode tower encoders for evaluation / gallery building."""

    def encode_cells(params, batch_stats, batch, rng):
        xyz, rgb = augment.point_cloud_transform(
            batch["xyz"], batch["rgb"], rng,
            num_points=cfg.model.pointnet.num_points, augment=False,
        )
        objects = _build_object_set(batch, xyz, rgb)
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            objects, train=False, method=model.encode_objects,
        )

    def encode_text(params, batch_stats, batch):
        text = embed_text_batch(embedder, batch)
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            text, train=False, method=model.encode_text,
        )

    return jax.jit(encode_cells), jax.jit(encode_text)


def prepare_fine_batch(batch, embedder: HintTextEmbedder, cfg: Config, rng,
                       train: bool) -> FineBatch:
    kp, kf = jax.random.split(rng)
    # Fine-stage flips have their own gate, DEFAULT ON (the measured winner,
    # BENCHMARKS.md fine-flip A/B); `--fine_flip_poses off` reproduces the
    # reference recipe, which trains without them (training/fine.py:168,
    # flip_pose=False).
    if train and cfg.train.fine_flip_poses:
        batch = augment.flip_coarse(batch, kf)
    xyz, rgb = augment.point_cloud_transform(
        batch["xyz"], batch["rgb"], kp,
        num_points=cfg.model.pointnet.num_points,
        augment=train and cfg.train.pc_augment,
    )
    objects = _build_object_set(batch, xyz, rgb)
    text = embed_text_batch(embedder, batch)
    return FineBatch(
        objects=objects, text=text,
        target=batch["target"], pose_in_cell=batch["pose_in_cell"],
    )


def make_fine_train_step(model: CrossMatch, embedder: HintTextEmbedder,
                         cfg: Config, optimizer, *, n_shards: int = 1) -> Callable:
    offset_lambda = cfg.train.offset_lambda
    n_clouds = -(-cfg.train.batch_size // n_shards) * cfg.model.pad_size
    auto = _stage_auto(cfg, FINE_FUSED_TRAIN_AUTO, n_clouds)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        rng = jax.random.fold_in(rng, state.step)
        kaug, kdrop = jax.random.split(rng)
        fb = prepare_fine_batch(batch, embedder, cfg, kaug, train=True)

        def loss_of(params):
            pred, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                fb.objects, fb.text, train=True,
                mutable=["batch_stats"], rngs={"dropout": kdrop},
            )
            # loss = offset_lambda * MSE(pred, target) (reference fine.py:65-68).
            mse = jnp.mean((pred - fb.target) ** 2)
            # Metric against fb.target, NOT fb.pose_in_cell: target lives in
            # the batch's candidate-cell frame (PMC clones swap the cell,
            # flips transform the target), while pose_in_cell stays in the
            # stored best-cell frame — mixing frames adds ~0.33 phantom
            # error per cloned sample.
            err = losses.pose_error(pred, fb.target)
            return offset_lambda * mse, (updates["batch_stats"], err)

        with pointnet2.fused_train_auto(auto):
            (loss, (new_stats, err)), grads = jax.value_and_grad(
                loss_of, has_aux=True
            )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_stats, new_opt, state.step + 1)
        return new_state, {"loss": loss, "pose_error": err}

    return step


def make_fine_forward(model: CrossMatch, embedder: HintTextEmbedder, cfg: Config):
    """Batched inference forward: [B] samples -> [B, 2] positions."""

    def forward(params, batch_stats, batch, rng):
        fb = prepare_fine_batch(batch, embedder, cfg, rng, train=False)
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            fb.objects, fb.text, train=False,
        )

    return jax.jit(forward)


class FineSplitForwards(NamedTuple):
    """The fine stage split at its reuse boundaries (all jitted):

    * encode_objects(params, stats, cell_batch, rng) -> [B, O, D] — pure
      function of the CELL (static map data): computed once per gallery cell.
    * encode_text(params, stats, text_batch) -> [B, S, D] — pure function of
      the QUERY: computed once per query, shared by its K candidates.
    * cct(params, stats, obj_emb, obj_mask, hints, sentence_mask) -> [B, 2]
      — the only per-(query, candidate)-pair compute.
    * refine(params, stats, obj_emb, obj_mask, text_batch) -> [B, 2] —
      encode_text + cct in one program (per-pair text encoding; used where
      text reuse isn't worth staging).
    * obj_pre / hints_pre / cct_tail — cct() factored at the cascade's
      layer-0 self/cross boundary (CrossMatch.cct_obj_pre/...): the layer-0
      self-attention blocks are pure functions of ONE side, so serving runs
      obj_pre once per gallery cell (cached offline with encode_objects) and
      hints_pre once per query; only cct_tail is per-pair. Exact:
      cct(obj, ..., hints, sm) == cct_tail(obj_pre(obj), ..., hints,
      hints_pre(hints), sm) (tests/test_cct_factored.py).

    The TPU-first answer to the reference's per-pose recompute loop
    (evaluation/pipeline.py:105-126); outputs are identical to
    make_fine_forward's combined program (eval-mode BatchNorm uses running
    statistics, so splitting changes nothing — oracle-tested).
    """

    encode_objects: Callable
    encode_text: Callable
    cct: Callable
    refine: Callable
    obj_pre: Callable
    hints_pre: Callable
    cct_tail: Callable


def make_fine_split_forwards(model: CrossMatch, embedder: HintTextEmbedder,
                             cfg: Config) -> FineSplitForwards:
    def encode_objects(params, batch_stats, batch, rng):
        xyz, rgb = augment.point_cloud_transform(
            batch["xyz"], batch["rgb"], rng,
            num_points=cfg.model.pointnet.num_points, augment=False,
        )
        objects = _build_object_set(batch, xyz, rgb)
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            objects, train=False, method=model.encode_objects,
        )

    def _embed(batch):
        return embed_text_batch(embedder, batch)

    def encode_text(params, batch_stats, batch):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            _embed(batch), train=False, method=model.encode_hints,
        )

    def cct(params, batch_stats, obj_emb, obj_mask, hints, sentence_mask):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            obj_emb, obj_mask, hints, sentence_mask, train=False,
            method=model.cct,
        )

    def refine(params, batch_stats, obj_emb, obj_mask, batch):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            obj_emb, obj_mask, _embed(batch), train=False, method=model.refine,
        )

    def obj_pre(params, batch_stats, obj_emb, obj_mask):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            obj_emb, obj_mask, train=False, method=model.cct_obj_pre,
        )

    def hints_pre(params, batch_stats, hints, sentence_mask):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            hints, sentence_mask, train=False, method=model.cct_hints_pre,
        )

    def cct_tail(params, batch_stats, obj1, obj_mask, hints, hints1,
                 sentence_mask):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            obj1, obj_mask, hints, hints1, sentence_mask, train=False,
            method=model.cct_tail,
        )

    return FineSplitForwards(
        jax.jit(encode_objects), jax.jit(encode_text), jax.jit(cct),
        jax.jit(refine), jax.jit(obj_pre), jax.jit(hints_pre),
        jax.jit(cct_tail),
    )


def encode_fine_gallery(fwd: FineSplitForwards, data, params, batch_stats,
                        pad_size: int, rng, cell_indices=None,
                        chunk: int = 128, obj_pre: bool = False):
    """Encode gallery cells' fine object embeddings once, in device chunks.

    Args:
        cell_indices: which cells to encode (default: the whole gallery).
        obj_pre: additionally push each cell through the CCT's layer-0
            object self-attention block (CrossMatch.cct_obj_pre) — it is a
            pure function of the cell, so serving caches its OUTPUT and the
            per-(query, candidate) path starts at cct_tail.
    Returns (cell_emb [C, pad, D], cell_mask [C, pad]) as host numpy — the
    static-map cache shared by serving, evaluation, and bench.
    """
    import numpy as np

    ids = (
        np.arange(data.num_cells)
        if cell_indices is None
        else np.asarray(cell_indices)
    )
    rows = []
    for s in range(0, len(ids), chunk):
        sl = ids[s : s + chunk]
        full = np.resize(sl, chunk)  # pad the tail by wrapping
        cb = data.gather_cell_objects(full, pad_size)
        e = fwd.encode_objects(params, batch_stats, cb, rng)
        if obj_pre:
            m = jnp.asarray(data.obj_mask[full][:, :pad_size], bool)
            e = fwd.obj_pre(params, batch_stats, e, m)
        rows.append(np.asarray(e)[: len(sl)])
    emb = np.concatenate(rows, axis=0)
    mask = np.asarray(data.obj_mask[ids][:, :pad_size])
    return emb, mask


def init_train_state(model, optimizer, rng, objects: ObjectSet, text: TextSet,
                     method=None) -> TrainState:
    kp, kd = jax.random.split(rng)
    # Jit the init: flax init otherwise runs op-by-op (minutes over a remote
    # TPU tunnel; also avoids materializing init intermediates).
    init_fn = jax.jit(
        functools.partial(model.init, train=True, method=method)
    )
    variables = init_fn({"params": kp, "dropout": kd}, objects, text)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))
