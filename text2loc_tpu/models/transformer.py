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
* FUSED ATTENTION BLOCK (on by default for d_model <= 256): the whole
  post-LN attention block (QKV projections -> per-sample attention ->
  out-projection -> residual -> LN) as ONE Pallas kernel
  (ops/pallas_mha.py) — the sample fold that lost at the XLA level wins
  in VMEM, where its block-diagonal mask is an iota compare instead of an
  HBM-materialized boolean tensor, and the latency-bound [B, H, Lq, Lk]
  batched matmuls become full-width MXU tiles. Default also engages the
  E=1024 bf16 intra stack (the lane-aligned per-head branch; full-trunk
  serve 8.41 -> 7.64 ms, BENCHMARKS log #13) but NOT f32 at E=1024 (the
  f32 operands exceed the 16 MB scoped-VMEM budget). Env:
  TEXT2LOC_FUSED_ATTN=0 disables, =all forces every dim/dtype;
  TEXT2LOC_FUSED_ATTN_ROWS tunes the sample-fold tile (default 512 rows —
  the on-chip sweep winner at both d=128 and d=1024).

Parameter trees are IDENTICAL to the previous stock-flax modules
(nn.MultiHeadDotProductAttention / nn.LayerNorm layouts), so converted torch
checkpoints and trained states load unchanged.
"""

from __future__ import annotations

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


def _fused_attn_enabled(d: int, dtype=None) -> bool:
    # Default engages small dims unconditionally and the E=1024 bf16 trunk
    # (measured winner — BENCHMARKS log #13: full-trunk serve 8.41 -> 7.64 ms
    # at rows=512, and the kernel's f32 softmax sits CLOSER to the f32 oracle
    # than stock-bf16). f32 at d=1024 stays on XLA: the fused block's f32
    # operands exceed the 16 MB scoped-VMEM budget. "all" forces every case.
    # Intermediate bf16 dims in (256, 1024) are enabled on the assumption
    # they behave like the measured d=1024 case (bf16 VMEM fit is monotone
    # below 1024; correctness is equality-tested, only perf is assumed).
    # Callers pass the RUNTIME activation dtype (x.dtype), not the module's
    # declared dtype — the kernel computes in x.dtype, so the VMEM gate must
    # see what will actually flow through it.
    v = os.environ.get("TEXT2LOC_FUSED_ATTN", "1")
    if (
        jax.default_backend() in ("cpu", "gpu")
        or v == "0"
        or os.environ.get("TEXT2LOC_DISABLE_PALLAS")
    ):
        return False
    if v == "all" or d <= 256:
        return True
    return d <= 1024 and jnp.dtype(dtype or jnp.float32) == jnp.bfloat16


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

    # Key-mask penalty (-1e9) and block-diagonal penalty (-2e9) are applied
    # SEPARATELY, off-block strictly dominating: a row whose own keys are
    # all masked must still attend within its own sample, not spread weight
    # onto other samples in the fold whose logits would otherwise tie.
    def fold(x):
        return x.transpose(0, 1, 3, 2, 4).reshape(nb, 1, g * lq, g * lk)

    eye = jnp.eye(g, dtype=bool)
    if mask is not None:
        m = mask[:, 0].reshape(nb, g, lq, lk)                   # [nb, g, Lq, Lk]
        km = jnp.broadcast_to(m[:, None], (nb, g, g, lq, lk))   # key-group at 2
        scores = jnp.where(fold(km), scores, -1e9)
    block = jnp.broadcast_to(eye[None, :, :, None, None], (nb, g, g, lq, lk))
    scores = jnp.where(fold(block), scores, -2e9)

    weights = jax.nn.softmax(scores, axis=-1).astype(query.dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", weights, vf)
    out = out.reshape(nb * g, lq, h, dh)
    return out[:b] if pad else out


class _DenseGeneralParams(nn.Module):
    """Parameter-only twin of nn.DenseGeneral ({kernel, bias}, same shapes
    and the same flattened-fan lecun_normal init nn.DenseGeneral wraps)."""

    in_shape: tuple
    out_shape: tuple

    @nn.compact
    def __call__(self):
        n_in = int(np.prod(self.in_shape))
        n_out = int(np.prod(self.out_shape))

        def kernel_init(rng, shape, dtype=jnp.float32):
            flat = nn.initializers.lecun_normal()(rng, (n_in, n_out), dtype)
            return flat.reshape(shape)

        kernel = self.param("kernel", kernel_init,
                            self.in_shape + self.out_shape)
        bias = self.param("bias", nn.initializers.zeros, self.out_shape,
                          jnp.float32)
        return kernel, bias


class _MHAParams(nn.Module):
    """Parameter container with nn.MultiHeadDotProductAttention's tree
    (DenseGeneral query/key/value/out), so converted torch checkpoints and
    previously trained states load unchanged."""

    num_heads: int
    d_model: int

    @nn.compact
    def __call__(self, d_q: int, d_kv: int):
        h = self.num_heads
        dh = self.d_model // h
        wq, bq = _DenseGeneralParams((d_q,), (h, dh), name="query")()
        wk, bk = _DenseGeneralParams((d_kv,), (h, dh), name="key")()
        wv, bv = _DenseGeneralParams((d_kv,), (h, dh), name="value")()
        wo, bo = _DenseGeneralParams((h, dh), (self.d_model,), name="out")()
        return wq, bq, wk, bk, wv, bv, wo, bo


def _stock_attention(q_in, kv_in, p, mask, dropout_rng, dropout_rate: float,
                     deterministic: bool, dtype, num_heads: int):
    """The previous module path, functional: DenseGeneral projections in
    `dtype` + flax dot_product_attention (or the grouped fold)."""
    wq, bq, wk, bk, wv, bv, wo, bo = p
    dt = jnp.dtype(dtype)
    q = jnp.einsum("...d,dhk->...hk", q_in.astype(dt), wq.astype(dt))
    q = q + bq.astype(dt)
    k = jnp.einsum("...d,dhk->...hk", kv_in.astype(dt), wk.astype(dt))
    k = k + bk.astype(dt)
    v = jnp.einsum("...d,dhk->...hk", kv_in.astype(dt), wv.astype(dt))
    v = v + bv.astype(dt)
    if deterministic and _grouped_enabled():
        x = grouped_dot_product_attention(q, k, v, mask=mask)
    else:
        x = nn.dot_product_attention(
            q, k, v, mask=mask,
            dropout_rng=dropout_rng, dropout_rate=dropout_rate,
            deterministic=deterministic, dtype=dt,
        )
    return jnp.einsum("...hk,hkd->...d", x.astype(dt), wo.astype(dt)) \
        + bo.astype(dt)


def _attention_block(mod, x, kv, key_mask, *, d_model: int, num_heads: int,
                     attn_name: str, norm_name: str, dropout_rate: float,
                     dtype, train: bool):
    """Post-LN attention block: LayerNorm(x + Dropout(MHA(x, kv))).

    Declared params keep the stock layout ({attn_name}/{query,key,value,out}
    + {norm_name}/{scale,bias}). Deterministic TPU calls at d_model <= 256
    run the single fused Pallas kernel (ops/pallas_mha.py: projections +
    sample-folded attention + out-projection + residual LayerNorm in one
    VMEM pass — the latency-bound [B, H, Lq, Lk] batched matmuls and five
    HBM round trips disappear); training/CPU keep stock composable ops with
    the dropouts in their torch positions."""
    p = _MHAParams(num_heads=num_heads, d_model=d_model, name=attn_name)(
        x.shape[-1], kv.shape[-1]
    )
    scale, bias = _LNParams(name=norm_name)(d_model)
    deterministic = not train
    # The fused kernel assumes query/memory widths both equal d_model (the
    # stock path supports d_kv != d_model); mismatched widths fall back.
    if (deterministic and d_model % 128 == 0
            and x.shape[-1] == d_model == kv.shape[-1]
            and _fused_attn_enabled(d_model, x.dtype)):
        from text2loc_tpu.ops.pallas_mha import fused_mha_addlayernorm

        rows = int(os.environ.get("TEXT2LOC_FUSED_ATTN_ROWS", "512"))
        return fused_mha_addlayernorm(
            x, kv, *p, scale, bias, key_mask=key_mask,
            num_heads=num_heads, group_rows=rows,
        )
    dropout_rng = None
    if not deterministic and dropout_rate > 0.0:
        dropout_rng = mod.make_rng("dropout")
    attn = _stock_attention(
        x, kv, p, _attn_mask(x.shape[1], key_mask), dropout_rng,
        dropout_rate, deterministic, dtype, num_heads,
    )
    attn = nn.Dropout(dropout_rate, deterministic=deterministic)(attn)
    return apply_add_layernorm(x, attn, scale, bias, 1e-5, jnp.dtype(dtype),
                               train)


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


class TorchEncoderLayer(nn.Module):
    """Post-LN self-attention encoder layer (torch defaults)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        x = _attention_block(
            self, x, x, mask, d_model=self.d_model,
            num_heads=self.num_heads, attn_name="self_attn",
            norm_name="norm1", dropout_rate=self.dropout_rate,
            dtype=self.dtype, train=train,
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

    `stage` factors the layer at the self/cross boundary (exact — the same
    blocks in the same order): "self" runs only the self-attention block,
    "rest" consumes a tgt that already went through it. The first cascade
    layer's self blocks are pure functions of ONE side (the cell's objects /
    the pose's hints), so serving hoists them out of the per-(pose,
    candidate) path — see CrossMatch.cct_obj_pre/cct_hints_pre/cct_tail.
    """

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory=None, tgt_mask=None, memory_mask=None,
                 train: bool = False, stage: str = "full"):
        assert stage in ("full", "self", "rest"), stage
        if stage != "rest":
            tgt = _attention_block(
                self, tgt, tgt, tgt_mask, d_model=self.d_model,
                num_heads=self.num_heads, attn_name="self_attn",
                norm_name="norm1", dropout_rate=self.dropout_rate,
                dtype=self.dtype, train=train,
            )
            if stage == "self":
                return tgt
        tgt = _attention_block(
            self, tgt, memory, memory_mask, d_model=self.d_model,
            num_heads=self.num_heads, attn_name="cross_attn",
            norm_name="norm2", dropout_rate=self.dropout_rate,
            dtype=self.dtype, train=train,
        )
        return _feed_forward(
            tgt, self.d_model, self.dim_feedforward, "norm3",
            self.dropout_rate, self.dtype, train,
        )
