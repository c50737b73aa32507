"""Coarse dual-encoder place-recognition model.

Rebuild of /root/reference/models/cell_retrieval.py:13-120. Two independent
towers embed text queries and map cells into a shared `coarse_embed_dim` space:

* encode_text: LanguageEncoder (coarse path) -> L2-normalize (:57-63).
* encode_objects: ObjectEncoder -> L2-normalize -> pad to [B, object_size, D]
  (:85-98; our inputs are already padded/masked) -> 2x
  TransformerEncoderLayer(D, 4 heads, ff=2D) over objects (:35,101-103) ->
  max-pool over objects -> L2-normalize -> [B, D] (:107-108).

Retrieval itself (gallery matmul + top-k) lives in
text2loc_tpu.evaluation.retrieval — the towers are pure encoders, mirroring the
reference's separately-called towers (forward() raises there, :112-113).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from text2loc_tpu.config import ModelConfig
from text2loc_tpu.data.batch import ObjectSet, TextSet
from text2loc_tpu.models.language_encoder import LanguageEncoder
from text2loc_tpu.models.object_encoder import ObjectEncoder
from text2loc_tpu.models.transformer import TorchEncoderLayer
from text2loc_tpu.ops.masked import l2_normalize, masked_max


class CellRetrievalNetwork(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.embed_dim = cfg.coarse_embed_dim
        body_dtype = jnp.dtype(cfg.body_dtype) if cfg.body_dtype else dtype
        self.object_encoder = ObjectEncoder(
            embed_dim=cfg.coarse_embed_dim, cfg=cfg, dtype=body_dtype
        )
        self.obj_inter = [
            TorchEncoderLayer(
                d_model=cfg.coarse_embed_dim,
                num_heads=cfg.object_inter_num_heads,
                dim_feedforward=2 * cfg.coarse_embed_dim,
                dropout_rate=cfg.dropout_rate,
                dtype=dtype,
                name=f"obj_inter_{i}",
            )
            for i in range(cfg.object_inter_num_layers)
        ]
        self.language_encoder = LanguageEncoder(
            embed_dim=cfg.coarse_embed_dim,
            token_dim=cfg.text_embed_dim,
            is_fine=False,
            intra_num_layers=cfg.intra_num_layers,
            intra_num_heads=cfg.intra_num_heads,
            inter_num_layers=cfg.inter_num_layers,
            inter_num_heads=cfg.inter_num_heads,
            dropout_rate=cfg.dropout_rate,
            mask_padded=cfg.mask_padded,
            dtype=dtype,
        )

    def encode_text(self, text: TextSet, train: bool = False) -> jnp.ndarray:
        enc = self.language_encoder(text, train=train)
        return l2_normalize(enc.astype(jnp.float32))

    def encode_text_sentences(self, text: TextSet, train: bool = False):
        """Per-sentence trunk only: [B, S, T, E] -> [B, S, D] (no inter head,
        no normalize). At eval this is a pure function of each sentence —
        serving precomputes it over the closed vocabulary once
        (LanguageEncoder.encode_sentences docstring)."""
        return self.language_encoder.encode_sentences(text, train=train)

    def encode_text_from_sentences(self, sent_emb, sentence_mask,
                                   train: bool = False) -> jnp.ndarray:
        """Cross-sentence head: [B, S, D] (+mask) -> normalized [B, D].

        encode_text == encode_text_from_sentences(encode_text_sentences(t),
        t.sentence_mask) — oracle-tested; the serving path feeds gathered
        table rows instead of a fresh trunk pass."""
        enc = self.language_encoder.finish_coarse(
            sent_emb.astype(jnp.dtype(self.cfg.dtype)), sentence_mask,
            train=train,
        )
        return l2_normalize(enc.astype(jnp.float32))

    def encode_objects(self, objects: ObjectSet, train: bool = False) -> jnp.ndarray:
        x = self.object_encoder(objects, train=train)        # [B, O, D]
        # Body/tail boundary: under mixed-precision training (body bf16,
        # tail f32 — see ModelConfig.body_dtype) cast up here so the
        # transformer tail and its backward run in the tail dtype.
        x = x.astype(jnp.dtype(self.cfg.dtype))
        x = l2_normalize(x)
        if self.cfg.mask_padded:
            x = jnp.where(objects.mask[:, :, None], x, 0.0)  # zero pad slots (:85)
            attn_mask = objects.mask
        else:
            attn_mask = None
        for layer in self.obj_inter:
            x = layer(x, mask=attn_mask, train=train)
        if self.cfg.mask_padded:
            pooled = masked_max(x, objects.mask, axis=1)
        else:
            pooled = jnp.max(x, axis=1)
        return l2_normalize(pooled.astype(jnp.float32))       # [B, D]

    def __call__(self, objects: ObjectSet, text: TextSet, train: bool = False):
        """Convenience joint forward: (cell_embeddings, text_embeddings)."""
        return self.encode_objects(objects, train=train), self.encode_text(
            text, train=train
        )
