"""Torch-parity transformer layers in Flax, tuned for tiny-sequence TPU serving.

The reference composes stock `nn.TransformerEncoderLayer` /
`nn.TransformerDecoderLayer` modules (post-LayerNorm, ReLU feed-forward,
dropout 0.1, biases everywhere) — see /root/reference/models/
language_encoder.py:98,103, cell_retrieval.py:35, cross_matcher.py:68-78.
These Flax modules replicate that computation on [B, L, D] batch-first arrays
(the reference's [L, B, D] permutes are layout-only) and add key-padding masks,
which the reference omits (it attends to zero-padded slots; masking is the
well-defined TPU-native behavior, toggled by passing mask=None).

TPU-serving specializations (same math, measured on chip —
scripts/probe_cct_parts.py, BENCHMARKS.md):

* GROUPED ATTENTION (off by default — measured NEGATIVE in context): the
  per-sample attention einsums at the fine stage's shapes lower to batched
  16x16 matmuls at MFU 0.001, and an isolated block-diagonal fold (G samples
  into one dense [G*L, G*L'] score matrix per head) ran 1.66 vs 2.46 ms
  (probe_cct_parts.py). In the FULL cascade, however, the fold's mask
  construction + reshapes cost more than the matmul saving (cct 6.52 ->
  7.07 ms, full sweep in BENCHMARKS.md), so TEXT2LOC_GROUPED_ATTN defaults
  0; set 1 to re-measure on other hardware. The math is exact either way
  (other samples' keys at -1e9 underflow to weight 0 in the f32 softmax;
  equality tests in tests/test_transformer_opt.py).
* FUSED ADD+LAYERNORM (on by default for d_model <= 256): the 12-step
  post-LN chain of the CCT measured 2.29 ms as stock ops; the one-pass
  Pallas kernel (ops/pallas_ln.py) takes the cascade 6.52 -> 5.91 ms and
  the production serve to ~24.7k q/s. At the language tower's d_model=1024
  the same kernel is SLOWER than XLA's fused ops (encode 6.51 -> 7.40 ms),
  so it engages only for small dims. Env: TEXT2LOC_FUSED_LN=0 disables,
  =all forces every dim.
* FUSED FFN+ADD+LAYERNORM (on by default for d_model <= 256): the whole
  feed-forward block (linear1 -> relu -> linear2 -> residual -> LN) runs as
  ONE Pallas kernel per row tile (ops/pallas_ffn.py) — the 4x-wide
  intermediate never reaches HBM. Interleaved A/B: cct 5.50/5.65 ->
  5.40/5.41 ms. Env: TEXT2LOC_FUSED_FFN=0 disables, =all forces every dim.

Parameter trees are IDENTICAL to the previous stock-flax modules
(nn.MultiHeadDotProductAttention / nn.LayerNorm layouts), so converted torch
checkpoints and trained states load unchanged.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _attn_mask(q_len: int, key_mask) -> Optional[jnp.ndarray]:
    """[B, Lk] key validity -> [B, 1, Lq, Lk] attention mask (or None)."""
    if key_mask is None:
        return None
    return jnp.asarray(key_mask, bool)[:, None, None, :].repeat(q_len, axis=2)


def _grouped_enabled() -> bool:
    return os.environ.get("TEXT2LOC_GROUPED_ATTN", "0") != "0"


def _fused_ln_enabled(d: int) -> bool:
    v = os.environ.get("TEXT2LOC_FUSED_LN", "1")
    return (
        jax.default_backend() not in ("cpu", "gpu")
        and v != "0"
        and not os.environ.get("TEXT2LOC_DISABLE_PALLAS")
        and (d <= 256 or v == "all")
    )


def _fused_ffn_enabled(d: int) -> bool:
    v = os.environ.get("TEXT2LOC_FUSED_FFN", "1")
    return (
        jax.default_backend() not in ("cpu", "gpu")
        and v != "0"
        and not os.environ.get("TEXT2LOC_DISABLE_PALLAS")
        and (d <= 256 or v == "all")
    )


class _DenseParams(nn.Module):
    """Parameter-only twin of nn.Dense ({kernel, bias}, same initializers):
    lets the fused kernels consume the weights directly while the stock path
    applies them functionally — one param tree for both."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


def _feed_forward(x, d_model: int, dim_feedforward: int, norm_name: str,
                  dropout_rate: float, dtype, train: bool):
    """linear1 -> relu -> linear2 -> add+LayerNorm (post-LN torch block).

    Called from within a layer's compact scope, so linear1/linear2 and the
    norm stay DIRECT children of the layer (the previous nn.Dense/
    nn.LayerNorm param layout). Deterministic TPU path at d_model <= 256
    runs the single fused Pallas kernel (ops/pallas_ffn.py: no HBM round
    trip for the 4x-wide intermediate, the FFN output, or the pre-norm sum);
    training/CPU use stock composable ops with the dropouts in their torch
    positions."""
    dt = jnp.dtype(dtype)
    k1, b1 = _DenseParams(dim_feedforward, name="linear1")(d_model)
    k2, b2 = _DenseParams(d_model, name="linear2")(dim_feedforward)
    scale, bias = _LNParams(name=norm_name)(d_model)
    if (not train and d_model % 128 == 0 and dim_feedforward % 128 == 0
            and _fused_ffn_enabled(d_model)):
        from text2loc_tpu.ops.pallas_ffn import fused_ffn_addlayernorm

        return fused_ffn_addlayernorm(x, k1, b1, k2, b2, scale, bias)
    deterministic = not train
    h = x @ k1.astype(dt) + b1.astype(dt)
    h = nn.relu(h)
    h = nn.Dropout(dropout_rate, deterministic=deterministic)(h)
    h = h @ k2.astype(dt) + b2.astype(dt)
    h = nn.Dropout(dropout_rate, deterministic=deterministic)(h)
    return apply_add_layernorm(x, h, scale, bias, 1e-5, dt, train)


def grouped_dot_product_attention(query, key, value, mask=None,
                                  group_rows: int = 128):
    """Per-sample attention via sample-folded dense matmuls (exact).

    query: [B, Lq, H, DH]; key/value: [B, Lk, H, DH]; mask: [B, 1, Lq, Lk]
    bool or None. Folds G = group_rows // Lq samples: scores become
    [B/G, H, G*Lq, G*Lk] dense matmuls with a block-diagonal validity mask.
    Equal to flax's dot_product_attention (q/sqrt(dh) scaling, f32 softmax)
    because cross-sample logits at -1e9 underflow to exactly zero weight.
    """
    b, lq, h, dh = query.shape
    lk = key.shape[1]
    g = max(1, group_rows // max(lq, lk))
    pad = (-b) % g
    if pad:
        query = jnp.pad(query, ((0, pad), (0, 0), (0, 0), (0, 0)))
        key = jnp.pad(key, ((0, pad), (0, 0), (0, 0), (0, 0)))
        value = jnp.pad(value, ((0, pad), (0, 0), (0, 0), (0, 0)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, pad), (0, 0), (0, 0), (0, 0)))
    nb = query.shape[0] // g

    qf = query.reshape(nb, g * lq, h, dh)
    kf = key.reshape(nb, g * lk, h, dh)
    vf = value.reshape(nb, g * lk, h, dh)
    scores = jnp.einsum(
        "nqhd,nkhd->nhqk", qf, kf, preferred_element_type=jnp.float32
    ) / np.sqrt(dh).astype(np.float32)

    # Block-diagonal sample validity, intersected with the key mask.
    eye = jnp.eye(g, dtype=bool)
    if mask is not None:
        m = mask[:, 0].reshape(nb, g, lq, lk)                   # [nb, g, Lq, Lk]
        allow = m[:, :, None] & eye[None, :, :, None, None]     # [nb, g, g, Lq, Lk]
    else:
        ones = jnp.ones((nb, g, lq, lk), bool)
        allow = ones[:, :, None] & eye[None, :, :, None, None]
    allow = allow.transpose(0, 1, 3, 2, 4).reshape(nb, 1, g * lq, g * lk)
    scores = jnp.where(allow, scores, -1e9)

    weights = jax.nn.softmax(scores, axis=-1).astype(query.dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", weights, vf)
    out = out.reshape(nb * g, lq, h, dh)
    return out[:b] if pad else out


class TorchMultiHeadAttention(nn.Module):
    """nn.MultiHeadDotProductAttention twin with the grouped serving path.

    Parameter tree is identical to flax MHDPA (DenseGeneral query/key/value/
    out), so checkpoints are interchangeable. Deterministic calls use
    `grouped_dot_product_attention`; training keeps flax's stock attention
    (which carries the weight dropout).
    """

    num_heads: int
    qkv_features: int
    out_features: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, mask=None, deterministic: bool = True):
        h = self.num_heads
        dh = self.qkv_features // h
        dense = functools.partial(
            nn.DenseGeneral, features=(h, dh), dtype=self.dtype
        )
        q = dense(name="query")(q_in)
        k = dense(name="key")(kv_in)
        v = dense(name="value")(kv_in)
        if deterministic and _grouped_enabled():
            x = grouped_dot_product_attention(q, k, v, mask=mask)
        else:
            dropout_rng = None
            if not deterministic and self.dropout_rate > 0.0:
                dropout_rng = self.make_rng("dropout")
            x = nn.dot_product_attention(
                q, k, v, mask=mask,
                dropout_rng=dropout_rng, dropout_rate=self.dropout_rate,
                deterministic=deterministic, dtype=self.dtype,
            )
        return nn.DenseGeneral(
            features=self.out_features, axis=(-2, -1), dtype=self.dtype,
            name="out",
        )(x)


class _LNParams(nn.Module):
    """Parameter-only twin of nn.LayerNorm ({scale, bias})."""

    @nn.compact
    def __call__(self, d: int):
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return scale, bias


def apply_add_layernorm(x, res, scale, bias, eps: float, out_dtype,
                        train: bool):
    """LayerNorm(x + res): the fused one-pass Pallas kernel at inference on
    TPU (ops/pallas_ln), stock composable ops otherwise (same f32 stats)."""
    d = x.shape[-1]
    if not train and d % 128 == 0 and _fused_ln_enabled(d):
        from text2loc_tpu.ops.pallas_ln import fused_add_layernorm

        return fused_add_layernorm(x, res, scale, bias, eps=eps)
    s = (x + res).astype(jnp.float32)
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mu), axis=-1, keepdims=True)
    y = (s - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale + bias
    return y.astype(out_dtype)


class AddLayerNorm(nn.Module):
    """LayerNorm(x + res) with nn.LayerNorm's parameter layout."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res, train: bool = False):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return apply_add_layernorm(x, res, scale, bias, self.epsilon,
                                   self.dtype, train)


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
        attn = TorchMultiHeadAttention(
            num_heads=self.num_heads,
            qkv_features=self.d_model,
            out_features=self.d_model,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="self_attn",
        )(x, x, mask=_attn_mask(x.shape[1], mask), deterministic=deterministic)
        attn = nn.Dropout(self.dropout_rate, deterministic=deterministic)(attn)
        x = AddLayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(
            x, attn, train=train
        )
        return _feed_forward(
            x, self.d_model, self.dim_feedforward, "norm2",
            self.dropout_rate, self.dtype, train,
        )


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
        sa = TorchMultiHeadAttention(
            num_heads=self.num_heads,
            qkv_features=self.d_model,
            out_features=self.d_model,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="self_attn",
        )(tgt, tgt, mask=_attn_mask(tgt.shape[1], tgt_mask),
          deterministic=deterministic)
        sa = nn.Dropout(self.dropout_rate, deterministic=deterministic)(sa)
        tgt = AddLayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(
            tgt, sa, train=train
        )

        ca = TorchMultiHeadAttention(
            num_heads=self.num_heads,
            qkv_features=self.d_model,
            out_features=self.d_model,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="cross_attn",
        )(tgt, memory, mask=_attn_mask(tgt.shape[1], memory_mask),
          deterministic=deterministic)
        ca = nn.Dropout(self.dropout_rate, deterministic=deterministic)(ca)
        tgt = AddLayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(
            tgt, ca, train=train
        )
        return _feed_forward(
            tgt, self.d_model, self.dim_feedforward, "norm3",
            self.dropout_rate, self.dtype, train,
        )
