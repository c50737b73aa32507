"""Hint-set language encoder (trainable stack over frozen text embeddings).

Rebuild of /root/reference/models/language_encoder.py:76-148. The frozen
T5 forward is replaced by the precomputed token-embedding lookup
(text2loc_tpu.models.text_embedding); the trainable computation is identical in
structure:

  token embeds [B*S, T, E]
    -> intra module: N x TransformerEncoderLayer(E, heads, ff=4E)   (:98,132-133)
    -> max-pool over tokens                                          (:135)
    -> inter_mlp = get_mlp2([E, D])  (Linear+BN, no trailing ReLU)   (:100,137)
    -> reshape [B, S, D]                                             (:138)
  coarse path (is_fine=False):
    -> inter module with EXTRA additive residual  x = x + layer(x)   (:143-145)
    -> max-pool over sentences -> [B, D]                             (:147)
  fine path (is_fine=True): return [B, S, D]                         (:140-141)

TPU deviation (documented): pooling and attention are masked over real
tokens/sentences; the reference max-pools over pad-to-longest token positions,
which makes its outputs depend on batch composition.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from text2loc_tpu.data.batch import TextSet
from text2loc_tpu.models.mlp import get_mlp2
from text2loc_tpu.models.transformer import TorchEncoderLayer
from text2loc_tpu.ops.masked import masked_max


class LanguageEncoder(nn.Module):
    embed_dim: int                    # output D (coarse 256 / fine 128)
    is_fine: bool = False
    intra_num_layers: int = 1
    intra_num_heads: int = 4
    inter_num_layers: int = 1
    inter_num_heads: int = 4
    dropout_rate: float = 0.1
    mask_padded: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text: TextSet, train: bool = False):
        b, s, t, e = text.token_embeds.shape
        x = text.token_embeds.reshape(b * s, t, e).astype(self.dtype)
        token_mask = text.token_mask.reshape(b * s, t)
        sent_mask = text.sentence_mask.reshape(b * s)

        attn_token_mask = token_mask if self.mask_padded else None
        for i in range(self.intra_num_layers):
            x = TorchEncoderLayer(
                d_model=e,
                num_heads=self.intra_num_heads,
                dim_feedforward=4 * e,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                name=f"intra_{i}",
            )(x, mask=attn_token_mask, train=train)

        if self.mask_padded:
            x = masked_max(x, token_mask, axis=1)      # [B*S, E]
        else:
            x = jnp.max(x, axis=1)

        x = get_mlp2([e, self.embed_dim], dtype=self.dtype, name="inter_mlp")(
            x, mask=sent_mask if self.mask_padded else None, train=train
        )
        x = x.reshape(b, s, self.embed_dim)

        if self.is_fine:
            return x                                    # [B, S, D]

        smask = text.sentence_mask if self.mask_padded else None
        for i in range(self.inter_num_layers):
            # Reference quirk kept for parity: additive residual on top of the
            # layer's own residual stream (language_encoder.py:145).
            x = x + TorchEncoderLayer(
                d_model=self.embed_dim,
                num_heads=self.inter_num_heads,
                dim_feedforward=4 * self.embed_dim,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                name=f"inter_{i}",
            )(x, mask=smask, train=train)

        if self.mask_padded:
            return masked_max(x, text.sentence_mask, axis=1)  # [B, D]
        return jnp.max(x, axis=1)
