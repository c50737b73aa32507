"""Minimal frozen T5 encoder in JAX — the online text path for novel queries.

The reference runs a frozen HF torch `T5EncoderModel` on EVERY batch
(/root/reference/models/language_encoder.py:85-128). Here the closed template
vocabulary is served from the precomputed [V, T, E] table
(models/text_embedding.py); this module covers the one capability that table
cannot: embedding ARBITRARY sentences. It is a from-scratch Flax rebuild of
the T5 encoder stack (RMSNorm pre-norm blocks, unscaled dot-product attention
with shared bucketed relative-position bias, ReLU or gated-GELU feed-forward)
plus a torch-state-dict converter following the same discipline as
models/torch_convert.py — so the frozen weights load once from a local HF
snapshot and all serving-time forwards run on TPU under jit.

Numerics match HF `T5EncoderModel` to float tolerance (tests/test_t5_encoder.py
asserts forward equality against randomly-initialized torch models for both
feed-forward variants, and table==online over the full hint vocabulary via the
shared stub tokenizer).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class T5Config:
    """Shapes of the encoder stack (HF T5Config field names kept)."""

    vocab_size: int
    d_model: int
    d_kv: int
    num_heads: int
    d_ff: int
    num_layers: int
    feed_forward_proj: str = "relu"       # "relu" | "gated-gelu"
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dtype: str = "float32"                # compute dtype (params stay f32)


def relative_position_buckets(length: int, num_buckets: int = 32,
                              max_distance: int = 128) -> np.ndarray:
    """[L, L] int32 bucket ids for (query, key) pairs — T5's bidirectional
    log-bucketing (HF `T5Attention._relative_position_bucket`). Static-shape
    host computation: the result is baked into the jitted program."""
    ctx = np.arange(length, dtype=np.int64)
    rel = ctx[None, :] - ctx[:, None]                 # memory - query
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(rel < max_exact, rel, large)
    return buckets.astype(np.int32)


def rms_norm(x, scale, eps: float):
    """T5LayerNorm: no mean subtraction, variance in f32, scale only."""
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    y = x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    return (scale * y.astype(x.dtype)) if scale.dtype == x.dtype else (
        scale.astype(x.dtype) * y.astype(x.dtype)
    )


class T5Encoder(nn.Module):
    """Frozen T5 encoder: (input_ids [B, L], attention_mask [B, L]) ->
    last_hidden_state [B, L, d_model].

    Parameters are flat, HF-shape-derived raw params (see
    `convert_t5_encoder`); attention is one fused einsum chain per block —
    big batched MXU matmuls, softmax in f32, no data-dependent control flow.
    """

    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        init = nn.initializers.normal(1.0)

        embed = self.param("token_embed", init, (c.vocab_size, c.d_model))
        x = jnp.take(embed, input_ids, axis=0).astype(dt)

        # Shared relative position bias (computed by block 0 in HF, reused by
        # every layer) + additive key mask, in f32 logits space.
        L = input_ids.shape[1]
        rel = self.param(
            "rel_bias", init, (c.relative_attention_num_buckets, c.num_heads)
        )
        buckets = relative_position_buckets(
            L, c.relative_attention_num_buckets,
            c.relative_attention_max_distance,
        )
        pos_bias = jnp.take(rel.astype(jnp.float32), buckets.reshape(-1),
                            axis=0).reshape(L, L, c.num_heads)
        pos_bias = jnp.transpose(pos_bias, (2, 0, 1))[None]    # [1, H, L, L]
        key_mask = jnp.where(
            attention_mask.astype(bool)[:, None, None, :], 0.0, -1e9
        ).astype(jnp.float32)                                  # [B, 1, 1, L]
        bias = pos_bias + key_mask

        inner = c.num_heads * c.d_kv
        gated = c.feed_forward_proj.startswith("gated")
        for i in range(c.num_layers):
            # --- self-attention (pre-norm; T5 omits the 1/sqrt(d_kv) scale).
            ln0 = self.param(f"block_{i}_ln0", nn.initializers.ones,
                             (c.d_model,))
            h = rms_norm(x, ln0, c.layer_norm_epsilon)
            wq = self.param(f"block_{i}_q", init, (c.d_model, inner))
            wk = self.param(f"block_{i}_k", init, (c.d_model, inner))
            wv = self.param(f"block_{i}_v", init, (c.d_model, inner))
            wo = self.param(f"block_{i}_o", init, (inner, c.d_model))
            b, l = h.shape[:2]
            q = (h @ wq.astype(dt)).reshape(b, l, c.num_heads, c.d_kv)
            k = (h @ wk.astype(dt)).reshape(b, l, c.num_heads, c.d_kv)
            v = (h @ wv.astype(dt)).reshape(b, l, c.num_heads, c.d_kv)
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) + bias
            attn = jax.nn.softmax(scores, axis=-1).astype(dt)
            o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, l, inner)
            x = x + o @ wo.astype(dt)

            # --- feed-forward (pre-norm; relu or gated-gelu).
            ln1 = self.param(f"block_{i}_ln1", nn.initializers.ones,
                             (c.d_model,))
            h = rms_norm(x, ln1, c.layer_norm_epsilon)
            if gated:
                wi0 = self.param(f"block_{i}_wi0", init, (c.d_model, c.d_ff))
                wi1 = self.param(f"block_{i}_wi1", init, (c.d_model, c.d_ff))
                h = nn.gelu(h @ wi0.astype(dt), approximate=True) * (
                    h @ wi1.astype(dt)
                )
            else:
                wi = self.param(f"block_{i}_wi", init, (c.d_model, c.d_ff))
                h = nn.relu(h @ wi.astype(dt))
            wo2 = self.param(f"block_{i}_wo", init, (c.d_ff, c.d_model))
            x = x + h @ wo2.astype(dt)

        final = self.param("final_ln", nn.initializers.ones, (c.d_model,))
        return rms_norm(x, final, c.layer_norm_epsilon)


# ---------------------------------------------------------------------------
# torch -> flax conversion (discipline of models/torch_convert.py)
# ---------------------------------------------------------------------------


def convert_t5_encoder(sd: Mapping[str, np.ndarray],
                       max_distance: int = 128) -> Tuple[Dict, T5Config]:
    """HF `T5EncoderModel` state_dict (as numpy, `torch_convert.to_numpy`) ->
    (params, T5Config) for `T5Encoder`. Shapes, bucket count, and the
    feed-forward variant are inferred from the weights; `max_distance` is not
    recoverable from them (pass the HF config value when it differs from the
    T5 default 128)."""
    def t(a):
        return np.ascontiguousarray(np.asarray(a, np.float32).T)

    emb = sd.get("shared.weight", sd.get("encoder.embed_tokens.weight"))
    if emb is None:
        raise KeyError("no token embedding (shared.weight) in state dict")
    rel = sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
    q0 = sd["encoder.block.0.layer.0.SelfAttention.q.weight"]    # [inner, D]
    num_heads = rel.shape[1]
    gated = "encoder.block.0.layer.1.DenseReluDense.wi_0.weight" in sd
    wi_key = "wi_0" if gated else "wi"
    d_ff = sd[f"encoder.block.0.layer.1.DenseReluDense.{wi_key}.weight"].shape[0]

    num_layers = 0
    while f"encoder.block.{num_layers}.layer.0.SelfAttention.q.weight" in sd:
        num_layers += 1

    cfg = T5Config(
        vocab_size=emb.shape[0],
        d_model=q0.shape[1],
        d_kv=q0.shape[0] // num_heads,
        num_heads=num_heads,
        d_ff=d_ff,
        num_layers=num_layers,
        feed_forward_proj="gated-gelu" if gated else "relu",
        relative_attention_num_buckets=rel.shape[0],
        relative_attention_max_distance=max_distance,
    )

    params: Dict[str, np.ndarray] = {
        "token_embed": np.asarray(emb, np.float32),
        "rel_bias": np.asarray(rel, np.float32),
        "final_ln": np.asarray(sd["encoder.final_layer_norm.weight"],
                               np.float32),
    }
    for i in range(num_layers):
        a = f"encoder.block.{i}.layer.0"
        f = f"encoder.block.{i}.layer.1"
        params[f"block_{i}_q"] = t(sd[f"{a}.SelfAttention.q.weight"])
        params[f"block_{i}_k"] = t(sd[f"{a}.SelfAttention.k.weight"])
        params[f"block_{i}_v"] = t(sd[f"{a}.SelfAttention.v.weight"])
        params[f"block_{i}_o"] = t(sd[f"{a}.SelfAttention.o.weight"])
        params[f"block_{i}_ln0"] = np.asarray(sd[f"{a}.layer_norm.weight"],
                                              np.float32)
        if gated:
            params[f"block_{i}_wi0"] = t(sd[f"{f}.DenseReluDense.wi_0.weight"])
            params[f"block_{i}_wi1"] = t(sd[f"{f}.DenseReluDense.wi_1.weight"])
        else:
            params[f"block_{i}_wi"] = t(sd[f"{f}.DenseReluDense.wi.weight"])
        params[f"block_{i}_wo"] = t(sd[f"{f}.DenseReluDense.wo.weight"])
        params[f"block_{i}_ln1"] = np.asarray(sd[f"{f}.layer_norm.weight"],
                                              np.float32)
    return params, cfg


# ---------------------------------------------------------------------------
# Online sentence encoder (serving front end)
# ---------------------------------------------------------------------------


class T5OnlineEncoder:
    """Frozen-T5 sentence encoder for out-of-vocabulary queries.

    `encode(sentences)` tokenizes on host and runs the jitted TPU forward,
    returning the same (token_embeds [N, T, E], token_mask [N, T]) layout the
    precomputed table serves for in-vocabulary hints — so `Localizer` can use
    either interchangeably. Batches pad to power-of-two buckets (one compile
    per bucket). The encoder is frozen: params never change after load.

    Reference behavior covered: language_encoder.py:106-128 (tokenize +
    frozen `llm_model` forward + detach), minus the per-batch torch round
    trip.
    """

    def __init__(self, params: Dict, cfg: T5Config, tokenizer,
                 max_tokens: int = 32):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_tokens = int(max_tokens)
        self._params = jax.tree_util.tree_map(jnp.asarray, params)
        model = T5Encoder(cfg)
        self._forward = jax.jit(
            lambda p, ids, mask: model.apply({"params": p}, ids, mask)
        )

    @property
    def embed_dim(self) -> int:
        return self.cfg.d_model

    @classmethod
    def from_snapshot(cls, model_name_or_path: str, max_tokens: int = 32,
                      dtype: str = "float32") -> "T5OnlineEncoder":
        """Load a local HF snapshot (torch weights, converted once; same
        local-snapshot gate as `HintTextEmbedder.from_t5` — no network)."""
        import torch
        from transformers import AutoTokenizer, T5EncoderModel

        from text2loc_tpu.models.torch_convert import to_numpy

        tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        tmodel = T5EncoderModel.from_pretrained(model_name_or_path).eval()
        with torch.no_grad():
            params, cfg = convert_t5_encoder(
                to_numpy(tmodel.state_dict()),
                max_distance=tmodel.config.relative_attention_max_distance,
            )
        del tmodel
        cfg = dataclasses.replace(cfg, dtype=dtype)
        return cls(params, cfg, tokenizer, max_tokens=max_tokens)

    def _tokenize(self, sentences: List[str]):
        toks = self.tokenizer(
            sentences, return_tensors="np", padding="max_length",
            truncation=True, max_length=self.max_tokens,
        )
        ids = np.asarray(toks["input_ids"], np.int32)
        mask = np.asarray(toks["attention_mask"], np.int32)
        return ids, mask

    def encode(self, sentences: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        """sentences -> (token_embeds [N, T, E] f32, token_mask [N, T] bool)."""
        n = len(sentences)
        if n == 0:
            return (np.zeros((0, self.max_tokens, self.embed_dim), np.float32),
                    np.zeros((0, self.max_tokens), bool))
        ids, mask = self._tokenize(list(sentences))
        bucket = 1
        while bucket < n:
            bucket *= 2
        if n < bucket:
            pad = bucket - n
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad, 0)], axis=0)
            mask = np.concatenate([mask, np.repeat(mask[-1:], pad, 0)], axis=0)
        out = np.asarray(
            self._forward(self._params, jnp.asarray(ids), jnp.asarray(mask)),
            np.float32,
        )[:n]
        return out, mask[:n].astype(bool)


class CompositionalOnlineEncoder:
    """Stand-in online encoder matched to `HintTextEmbedder.compositional`.

    In-vocabulary template sentences produce BIT-IDENTICAL embeddings to the
    compositional table (it re-renders through the same word table), so the
    table fast path and the online fallback agree exactly; arbitrary other
    sentences embed word-by-word with deterministic seeded-hash vectors.
    Used where no T5 snapshot exists (tests, offline demos).
    """

    def __init__(self, embed_dim: int = 1024, max_tokens: int = 16,
                 seed: int = 17):
        from text2loc_tpu import constants as C
        from text2loc_tpu.models.text_embedding import HintTextEmbedder

        self._C = C
        self._table = HintTextEmbedder.compositional(
            embed_dim=embed_dim, max_tokens=max_tokens, seed=seed
        )
        # Host copies ONCE: the embedder stores device arrays, and a
        # per-encode np.asarray would transfer the whole [V, T, E] table
        # (~100 MB at T5-large dims) device->host on every call.
        self._table_np = np.asarray(self._table.table)
        self._tmask_np = np.asarray(self._table.token_mask)
        self.embed_dim = embed_dim
        self.max_tokens = max_tokens
        self._seed = seed

    def _word_vec(self, word: str) -> np.ndarray:
        import hashlib

        h = int.from_bytes(
            hashlib.sha256(f"{self._seed}:{word}".encode()).digest()[:8],
            "little",
        )
        return np.random.default_rng(h).standard_normal(
            self.embed_dim
        ).astype(np.float32)

    def encode(self, sentences: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        from text2loc_tpu.text import HintParseError, parse_hint

        n = len(sentences)
        emb = np.zeros((n, self.max_tokens, self.embed_dim), np.float32)
        mask = np.zeros((n, self.max_tokens), bool)
        table, tmask = self._table_np, self._tmask_np
        for i, s in enumerate(sentences):
            try:
                d, c, l = parse_hint(s)
                hid = int(self._C.hint_id(d, c, l))
                emb[i], mask[i] = table[hid], tmask[hid]
            except HintParseError:
                words = s.replace(".", " .").split()[: self.max_tokens]
                for j, w in enumerate(words):
                    emb[i, j] = self._word_vec(w)
                mask[i, : len(words)] = True
        return emb, mask
