"""Fused multi-head attention block Pallas kernel (post-LN torch layout).

The CCT's per-sample attention at the fine stage's shapes ([B=Q*K, 16, 128]
objects x [B, 6, 128] hints, 4 heads) lowers under XLA to batched
[B, 4, Lq, Lk] matmuls that run latency-bound at MFU ~0.001, and the QKV/out
projections at MFU ~0.19 (BENCHMARKS.md production-path profile; the
reference runs the same shapes through stock torch nn.MultiheadAttention,
models/cross_matcher.py:68-78). This kernel computes the ENTIRE post-LN
attention block of a torch TransformerEncoder/DecoderLayer

    out = LayerNorm(x + MHA(x, kv) @ Wo + bo)

for a group of G samples per grid step, entirely in VMEM:

* QKV projections are full-width [G*L, D] @ [D, D] MXU matmuls.
* Per-head scores use the LANE-MASK trick: zeroing query/value lanes
  outside head h makes the full 128-lane contraction equal the per-head
  dh-lane contraction, so scores/AV stay clean MXU tiles with no sub-128
  lane slicing or relayouts.
* Cross-sample attention is cut by a block-diagonal iota mask (exact: the
  -1e9 logits underflow to weight zero in the f32 softmax) — the same fold
  as models/transformer.grouped_dot_product_attention, but the mask is
  BUILT IN VMEM, which is precisely the overhead that made the XLA-level
  fold a net loss in context (BENCHMARKS.md, grouped attention REJECTED).
* Softmax in f32; matmuls accumulate in f32 (Mosaic rejects bf16
  accumulators); the attention output, the out-projection, the residual
  sum, and the LayerNorm never touch HBM.

Forward/inference only; training keeps stock composable ops (the dropouts
live between attention and the residual there).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _mha_block_kernel(x_ref, m_ref, kb_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                      wv_ref, bv_ref, wo_ref, bo_ref, g_ref, be_ref, o_ref,
                      *, lq: int, lk: int, num_heads: int, eps: float):
    x = x_ref[...]                                   # [G*Lq, D]
    m = m_ref[...]                                   # [G*Lk, D]
    dp = wq_ref.shape[1]                             # H * DH
    dh = dp // num_heads

    # Projections: full-width MXU matmuls, f32 accumulation.
    q = jnp.dot(x, wq_ref[...], preferred_element_type=jnp.float32)
    q = (q + bq_ref[...]) * float(1.0 / math.sqrt(dh))
    k = jnp.dot(m, wk_ref[...], preferred_element_type=jnp.float32)
    k = k + bk_ref[...]
    v = jnp.dot(m, wv_ref[...], preferred_element_type=jnp.float32)
    v = v + bv_ref[...]

    glq, glk = x.shape[0], m.shape[0]
    # Block-diagonal sample mask: query row r belongs to sample r // Lq,
    # key column c to sample c // Lk. int32 iota compares (bf16 vector
    # compares are rejected on this target).
    rows = jax.lax.broadcasted_iota(jnp.int32, (glq, glk), 0) // lq
    cols = jax.lax.broadcasted_iota(jnp.int32, (glq, glk), 1) // lk
    block = rows == cols
    kb = kb_ref[...].reshape(1, glk)                 # [1, G*Lk] f32 additive
    # Head id per lane (for the lane-mask trick).
    head_q = jax.lax.broadcasted_iota(jnp.int32, (1, dp), 1) // dh

    cdt = x.dtype
    kc = k.astype(cdt)
    # dh a lane multiple: per-head slices are layout-clean, so contract only
    # the head's own lanes. Below 128 lanes the slice would relayout, so use
    # the LANE-MASK trick instead (zero the lanes outside head h; the full
    # dp-deep dot then equals the per-head dot — a num_heads x FLOP waste
    # that is irrelevant at dh=32 but dominant at d_model >= 512).
    lane_aligned = dh % 128 == 0
    parts = []
    acc = jnp.zeros((glq, dp), jnp.float32)
    for h in range(num_heads):                       # unrolled: H is tiny
        if lane_aligned:
            qh = q[:, h * dh:(h + 1) * dh].astype(cdt)
            kh = kc[:, h * dh:(h + 1) * dh]
        else:
            qh = jnp.where(head_q == h, q, 0.0).astype(cdt)
            kh = kc
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # [G*Lq, G*Lk]
        # Off-block penalty (-2e9) strictly dominates the key-mask penalty
        # (kb = -1e9): a row whose keys are ALL masked must still attend
        # within its own sample (softmax over its own masked logits), not
        # leak weight onto other samples in the fold whose -1e9 off-block
        # logits would otherwise be comparable.
        s = jnp.where(block, s + kb, -2e9)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if lane_aligned:
            vh = v[:, h * dh:(h + 1) * dh].astype(cdt)
            parts.append(jnp.dot(p.astype(cdt), vh,
                                 preferred_element_type=jnp.float32))
        else:
            vh = jnp.where(head_q == h, v, 0.0).astype(cdt)
            acc = acc + jnp.dot(p.astype(cdt), vh,
                                preferred_element_type=jnp.float32)
    if lane_aligned:
        acc = jnp.concatenate(parts, axis=1)

    out = jnp.dot(acc.astype(cdt), wo_ref[...],
                  preferred_element_type=jnp.float32)
    s2 = x.astype(jnp.float32) + out + bo_ref[...]
    mu = jnp.mean(s2, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s2 - mu), axis=-1, keepdims=True)
    y = (s2 - mu) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...] + be_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


def _group_size(lq: int, lk: int, target_rows: int) -> int:
    """Samples per grid step: G*Lq and G*Lk must both be sublane (8)
    multiples; aim G*max(L) near target_rows to amortize grid overhead
    without inflating the block-diagonal FLOP waste (which grows with G)."""
    step = 1
    while (step * lq) % 8 or (step * lk) % 8:
        step += 1
    g = max(1, round(target_rows / max(lq, lk)))
    return max(step, (g // step) * step)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "eps", "group_rows", "interpret"),
)
def fused_mha_addlayernorm(x, kv, wq, bq, wk, bk, wv, bv, wo, bo, scale,
                           bias, key_mask=None, *, num_heads: int,
                           eps: float = 1e-5, group_rows: int = 512,
                           interpret: bool = False):
    """LayerNorm(x + MHA(x, kv)) in one HBM pass over the rows.

    x: [B, Lq, D]; kv: [B, Lk, D]; key_mask: [B, Lk] bool (True = valid) or
    None. Weights in flax DenseGeneral layout: wq/wk/wv [D, H, DH] with
    biases [H, DH]; wo [H, DH, D] with bias [D]; scale/bias [D] LayerNorm
    params. D = H * DH must be a lane (128) multiple.
    """
    b, lq, d = x.shape
    lk = kv.shape[1]
    dp = num_heads * wq.shape[-1]
    assert dp == d and d % 128 == 0, (d, num_heads, wq.shape)

    g = _group_size(lq, lk, group_rows)
    pad = (-b) % g
    kb = jnp.zeros((b, lk), jnp.float32) if key_mask is None else jnp.where(
        jnp.asarray(key_mask, bool), 0.0, -1e9
    ).astype(jnp.float32)
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        kv = jnp.pad(kv, ((0, pad), (0, 0), (0, 0)))
        kb = jnp.pad(kb, ((0, pad), (0, 0)))
    nb = x.shape[0] // g

    dt = x.dtype
    x2 = x.reshape(nb * g * lq, d)
    m2 = kv.reshape(nb * g * lk, d)
    # 3-D with a unit middle dim: Mosaic requires the LAST TWO block dims to
    # be (8, 128)-divisible or array-equal; a (1, G*Lk) block over
    # [nb, G*Lk] violates the sublane rule, (1, 1, G*Lk) satisfies it.
    kb2 = kb.reshape(nb, 1, g * lk)

    def row(a):
        return jnp.reshape(a, (1, -1)).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_mha_block_kernel, lq=lq, lk=lk,
                          num_heads=num_heads, eps=eps),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((g * lq, d), lambda i: (i, 0)),
            pl.BlockSpec((g * lk, d), lambda i: (i, 0)),
            pl.BlockSpec((1, 1, g * lk), lambda i: (i, 0, 0)),
            pl.BlockSpec((d, dp), lambda i: (0, 0)),
            pl.BlockSpec((1, dp), lambda i: (0, 0)),
            pl.BlockSpec((d, dp), lambda i: (0, 0)),
            pl.BlockSpec((1, dp), lambda i: (0, 0)),
            pl.BlockSpec((d, dp), lambda i: (0, 0)),
            pl.BlockSpec((1, dp), lambda i: (0, 0)),
            pl.BlockSpec((dp, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((g * lq, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nb * g * lq, d), dt),
        interpret=interpret,
    )(
        x2, m2, kb2,
        wq.reshape(d, dp).astype(dt), row(bq),
        wk.reshape(d, dp).astype(dt), row(bk),
        wv.reshape(d, dp).astype(dt), row(bv),
        wo.reshape(dp, d).astype(dt), row(bo),
        row(scale), row(bias),
    )
    out = out.reshape(nb * g, lq, d)
    return out[:b] if pad else out


def mha_addlayernorm_ref(x, kv, wq, bq, wk, bk, wv, bv, wo, bo, scale, bias,
                         key_mask=None, *, num_heads: int, eps: float = 1e-5):
    """Stock-ops twin with the kernel's numerics (f32 softmax/accums)."""
    dt = x.dtype
    b, lq, d = x.shape
    dh = d // num_heads
    q = jnp.einsum("bld,dhk->blhk", x, wq.astype(dt)) + bq.astype(dt)
    k = jnp.einsum("bld,dhk->blhk", kv, wk.astype(dt)) + bk.astype(dt)
    v = jnp.einsum("bld,dhk->blhk", kv, wv.astype(dt)) + bv.astype(dt)
    s = jnp.einsum("bqhk,bmhk->bhqm", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(dh)
    if key_mask is not None:
        s = jnp.where(jnp.asarray(key_mask, bool)[:, None, None, :], s, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqm,bmhk->bqhk", p.astype(dt), v,
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("bqhk,hkd->bqd", o.astype(dt), wo.astype(dt))
    s2 = x.astype(jnp.float32) + out + bo.astype(jnp.float32)
    mu = jnp.mean(s2, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s2 - mu), axis=-1, keepdims=True)
    y = (s2 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(dt)
