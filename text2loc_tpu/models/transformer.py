"""Torch-parity transformer layers in Flax.

The reference composes stock `nn.TransformerEncoderLayer` /
`nn.TransformerDecoderLayer` modules (post-LayerNorm, ReLU feed-forward,
dropout 0.1, biases everywhere) — see /root/reference/models/
language_encoder.py:98,103, cell_retrieval.py:35, cross_matcher.py:68-78.
These Flax modules replicate that computation on [B, L, D] batch-first arrays
(the reference's [L, B, D] permutes are layout-only) and add key-padding masks,
which the reference omits (it attends to zero-padded slots; masking is the
well-defined TPU-native behavior, toggled by passing mask=None).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def _attn_mask(q_len: int, key_mask) -> Optional[jnp.ndarray]:
    """[B, Lk] key validity -> [B, 1, Lq, Lk] attention mask (or None)."""
    if key_mask is None:
        return None
    return jnp.asarray(key_mask, bool)[:, None, None, :].repeat(q_len, axis=2)


class TorchEncoderLayer(nn.Module):
    """Post-LN self-attention encoder layer (torch defaults)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        deterministic = not train
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.d_model,
            out_features=self.d_model,
            dropout_rate=self.dropout_rate,
            deterministic=deterministic,
            dtype=self.dtype,
            name="self_attn",
        )(x, x, x, mask=_attn_mask(x.shape[1], mask))
        attn = nn.Dropout(self.dropout_rate, deterministic=deterministic)(attn)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + attn)

        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + h)
        return x


class TorchDecoderLayer(nn.Module):
    """Post-LN decoder layer: self-attn -> cross-attn -> feed-forward.

    Used by the fine stage's cascaded cross-attention transformer
    (reference cross_matcher.py:113-123): tgt attends to itself, then to
    `memory`.
    """

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask=None, memory_mask=None, train: bool = False):
        deterministic = not train
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.d_model,
            out_features=self.d_model,
            dropout_rate=self.dropout_rate,
            deterministic=deterministic,
            dtype=self.dtype,
            name="self_attn",
        )(tgt, tgt, tgt, mask=_attn_mask(tgt.shape[1], tgt_mask))
        sa = nn.Dropout(self.dropout_rate, deterministic=deterministic)(sa)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt + sa)

        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.d_model,
            out_features=self.d_model,
            dropout_rate=self.dropout_rate,
            deterministic=deterministic,
            dtype=self.dtype,
            name="cross_attn",
        )(tgt, memory, memory, mask=_attn_mask(tgt.shape[1], memory_mask))
        ca = nn.Dropout(self.dropout_rate, deterministic=deterministic)(ca)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt + ca)

        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt + h)
        return tgt
