"""Fine matching-free position regressor (cascaded cross-attention).

Rebuild of /root/reference/models/cross_matcher.py:39-129:

* ObjectEncoder -> [B, pad_size, fine_embed_dim], L2-normalized (:96-105).
* LanguageEncoder (fine path) -> per-hint [B, S, D] (:91).
* Cascaded Cross-attention Transformer (CCT): `fine_num_decoder_layers` paired
  TransformerDecoderLayer stacks — per layer i,
  objects = cross_objects[i](objects, hints) then
  hints = cross_hints[i](hints, objects) (:113-117); single-layer fallback when
  fine_num_decoder_layers == 0 uses one hints->objects decoder layer (:76-79,123).
* max-pool over hints -> mlp_offsets [D -> D/2 -> 2], no trailing activation
  (:65,125-126) -> predicted position, normalized cell coordinates.

Also provides `get_pos_in_cell` / `get_pos_in_cell_intersect`, the legacy
SuperGlue-era geometric estimators (:138-185), as vectorized numpy helpers.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from text2loc_tpu.config import ModelConfig
from text2loc_tpu.data.batch import ObjectSet, TextSet
from text2loc_tpu.models.language_encoder import LanguageEncoder
from text2loc_tpu.models.mlp import get_mlp_offset
from text2loc_tpu.models.object_encoder import ObjectEncoder
from text2loc_tpu.models.transformer import TorchDecoderLayer
from text2loc_tpu.ops.masked import l2_normalize, masked_max


class CrossMatch(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.embed_dim = cfg.fine_embed_dim
        body_dtype = jnp.dtype(cfg.body_dtype) if cfg.body_dtype else dtype
        self.object_encoder = ObjectEncoder(
            embed_dim=cfg.fine_embed_dim, cfg=cfg, dtype=body_dtype
        )
        self.language_encoder = LanguageEncoder(
            embed_dim=cfg.fine_embed_dim,
            token_dim=cfg.text_embed_dim,
            is_fine=True,
            intra_num_layers=cfg.fine_intra_num_layers,
            intra_num_heads=cfg.fine_intra_num_heads,
            dropout_rate=cfg.dropout_rate,
            mask_padded=cfg.mask_padded,
            dtype=dtype,
        )
        n_layers = max(cfg.fine_num_decoder_layers, 1)

        def dec(name):
            return TorchDecoderLayer(
                d_model=cfg.fine_embed_dim,
                num_heads=cfg.fine_num_decoder_heads,
                dim_feedforward=4 * cfg.fine_embed_dim,
                dropout_rate=cfg.dropout_rate,
                dtype=dtype,
                name=name,
            )

        self.cross_hints = [dec(f"cross_hints_{i}") for i in range(n_layers)]
        if cfg.fine_num_decoder_layers > 0:
            self.cross_objects = [dec(f"cross_objects_{i}") for i in range(n_layers)]
        else:
            self.cross_objects = None
        self.mlp_offsets = get_mlp_offset(
            [cfg.fine_embed_dim, cfg.fine_embed_dim // 2, 2], dtype=dtype
        )

    def encode_objects(self, objects: ObjectSet, train: bool = False):
        """Query-independent half: [B, O, D] normalized object embeddings.

        The candidate-cell side of the fine stage depends only on the cell
        (static map data) — production serving precomputes it per gallery
        cell once (serving.Localizer), the TPU-first counterpart of the
        reference re-encoding every candidate inside its per-pose loop
        (evaluation/pipeline.py:105-126)."""
        obj = self.object_encoder(objects, train=train)        # [B, O, D]
        # Body/tail boundary cast (see ModelConfig.body_dtype).
        return l2_normalize(obj.astype(jnp.dtype(self.cfg.dtype)))

    def encode_hints(self, text: TextSet, train: bool = False):
        """Per-QUERY half of the text side: [B, S, D] hint encodings.

        A query's hint encodings are shared by all of its K candidate cells;
        serving/eval encode them once per query instead of once per
        (query, candidate) pair."""
        return self.language_encoder(text, train=train)

    def cct(self, obj, obj_mask, hints, sentence_mask, train: bool = False):
        """Per-PAIR half: cascaded cross-attention + offsets -> [B, 2]."""
        if not self.cfg.mask_padded:
            obj_mask = None
        hint_mask = sentence_mask if self.cfg.mask_padded else None

        if self.cross_objects is not None:
            for co, ch in zip(self.cross_objects, self.cross_hints):
                obj = co(obj, hints, tgt_mask=obj_mask, memory_mask=hint_mask, train=train)
                hints = ch(hints, obj, tgt_mask=hint_mask, memory_mask=obj_mask, train=train)
        else:
            hints = self.cross_hints[0](
                hints, obj, tgt_mask=hint_mask, memory_mask=obj_mask, train=train
            )

        if self.cfg.mask_padded:
            pooled = masked_max(hints, sentence_mask, axis=1)    # [B, D]
        else:
            pooled = jnp.max(hints, axis=1)
        offsets = self.mlp_offsets(pooled.astype(jnp.float32))
        return offsets                                           # [B, 2]

    # -- Exact factorization of cct() at the layer-0 self/cross boundary --
    # The cascade's FIRST self-attention blocks read only their own side:
    # cross_objects_0's self block is a pure function of the CELL's object
    # embeddings (precomputable per gallery cell, with encode_objects), and
    # cross_hints_0's self block is a pure function of the POSE's hint
    # encodings (computable once per query and shared by its K candidate
    # pairs, like encode_hints). cct(obj, hints) ==
    # cct_tail(cct_obj_pre(obj), cct_hints_pre(hints), hints) exactly — same
    # blocks, same order (tests/test_cct_factored.py).

    def cct_obj_pre(self, obj, obj_mask, train: bool = False):
        """Per-CELL: layer-0 object self-attention block ([B, O, D])."""
        if self.cross_objects is None:
            return obj  # 0-layer fallback: objects are memory only (:123)
        m = obj_mask if self.cfg.mask_padded else None
        return self.cross_objects[0](obj, tgt_mask=m, train=train,
                                     stage="self")

    def cct_hints_pre(self, hints, sentence_mask, train: bool = False):
        """Per-POSE: layer-0 hint self-attention block ([B, S, D])."""
        m = sentence_mask if self.cfg.mask_padded else None
        return self.cross_hints[0](hints, tgt_mask=m, train=train,
                                   stage="self")

    def cct_tail(self, obj1, obj_mask, hints, hints1, sentence_mask,
                 train: bool = False):
        """Per-PAIR remainder of cct(): layer-0 cross+FFN blocks, the full
        later layers, and the pooled offset head.

        Args:
            obj1: cct_obj_pre output (per-cell, cacheable offline).
            hints: ORIGINAL hint encodings — layer 0's object-side
                cross-attention attends to the un-self-attended hints.
            hints1: cct_hints_pre output (per-pose, shared across K).
        """
        if not self.cfg.mask_padded:
            obj_mask = None
        hint_mask = sentence_mask if self.cfg.mask_padded else None

        if self.cross_objects is not None:
            obj = self.cross_objects[0](
                obj1, hints, memory_mask=hint_mask, train=train, stage="rest"
            )
            cur = self.cross_hints[0](
                hints1, obj, memory_mask=obj_mask, train=train, stage="rest"
            )
            for co, ch in zip(self.cross_objects[1:], self.cross_hints[1:]):
                obj = co(obj, cur, tgt_mask=obj_mask, memory_mask=hint_mask,
                         train=train)
                cur = ch(cur, obj, tgt_mask=hint_mask, memory_mask=obj_mask,
                         train=train)
        else:
            cur = self.cross_hints[0](
                hints1, obj1, memory_mask=obj_mask, train=train, stage="rest"
            )

        if self.cfg.mask_padded:
            pooled = masked_max(cur, sentence_mask, axis=1)      # [B, D]
        else:
            pooled = jnp.max(cur, axis=1)
        offsets = self.mlp_offsets(pooled.astype(jnp.float32))
        return offsets                                           # [B, 2]

    def refine(self, obj, obj_mask, text: TextSet, train: bool = False):
        """Query-dependent half: text encoder + CCT + offsets -> [B, 2]."""
        hints = self.encode_hints(text, train=train)             # [B, S, D]
        return self.cct(obj, obj_mask, hints, text.sentence_mask, train=train)

    def __call__(self, objects: ObjectSet, text: TextSet, train: bool = False):
        """Returns [B, 2] predicted normalized positions."""
        obj = self.encode_objects(objects, train=train)
        return self.refine(obj, objects.mask, text, train=train)


# ---------------------------------------------------------------------------
# Legacy geometric position estimators (reference cross_matcher.py:138-185).
# Host-side numpy; kept for capability parity with the SuperGlue-era API.
# ---------------------------------------------------------------------------


def get_pos_in_cell(centers: np.ndarray, matches0: np.ndarray, offsets: np.ndarray):
    """Average of matched-object centers plus their hints' offset vectors.

    Args:
        centers: [O, 2] object centers in normalized cell coords.
        matches0: [O] per-object matched hint index, -1 = unmatched.
        offsets: [S, 2] per-hint offset predictions.

    Returns:
        [2] position estimate; (0.5, 0.5) when nothing matched (:159-161).
    """
    matches0 = np.asarray(matches0)
    valid = matches0 >= 0
    if not np.any(valid):
        return np.array((0.5, 0.5))
    preds = centers[valid, :2] + offsets[matches0[valid]]
    return preds.mean(axis=0)


def get_pos_in_cell_intersect(
    centers: np.ndarray, matches0: np.ndarray, directions: np.ndarray
):
    """Least-squares intersection of per-hint direction rays (:164-185)."""
    directions = directions / np.linalg.norm(directions, axis=1, keepdims=True)
    matches0 = np.asarray(matches0)
    valid = matches0 >= 0
    p0 = centers[valid, :2]
    if len(p0) < 2:
        return np.array((0.5, 0.5))
    p1 = p0 + directions[matches0[valid]]
    n = (p1 - p0) / np.linalg.norm(p1 - p0, axis=1)[:, None]
    projs = np.eye(n.shape[1]) - n[:, :, None] * n[:, None]
    r = projs.sum(axis=0)
    q = (projs @ p0[:, :, None]).sum(axis=0)
    return np.linalg.lstsq(r, q, rcond=None)[0].ravel()
