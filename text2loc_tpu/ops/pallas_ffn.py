"""Fused feed-forward + residual LayerNorm Pallas kernel.

The CCT decoder cascade is HBM-bandwidth-bound at D=128 (BENCHMARKS.md
roofline): each FFN pair materializes its [R, 4D] intermediate to HBM twice
(write + read) plus the FFN output round trip into the following
residual+LayerNorm. This kernel computes

    out = LayerNorm(x + relu(x @ W1 + b1) @ W2 + b2) * scale + bias

for a row tile entirely in VMEM: HBM traffic collapses to read(x) +
write(out) — the intermediate (4x wider than x) and the pre-norm sum never
exist in HBM. Weights ([D, F] + [F, D]) stay resident per grid step.

Numerics: matmuls accumulate in f32 (Mosaic rejects bf16 accumulators),
LayerNorm statistics in f32, output cast to the input dtype — matching the
stock composable path (transformer layers' feed-forward + AddLayerNorm).
Forward/inference only; training keeps stock ops (dropout lives between the
FFN matmuls there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ffn_addln_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref,
                      o_ref, *, eps: float):
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[...].astype(jnp.float32), 0.0)
    h = jnp.dot(h.astype(x.dtype), w2_ref[...],
                preferred_element_type=jnp.float32)
    s = x.astype(jnp.float32) + h + b2_ref[...].astype(jnp.float32)
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mu), axis=-1, keepdims=True)
    y = (s - mu) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + be_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_ffn_addlayernorm(x, w1, b1, w2, b2, scale, bias, eps: float = 1e-5,
                           interpret: bool = False):
    """LayerNorm(x + relu(x@w1+b1)@w2+b2), one HBM pass over the rows.

    x: [..., D]; w1: [D, F]; w2: [F, D]; b1: [F]; b2, scale, bias: [D].
    D and F must be multiples of 128 lanes.
    """
    orig_shape = x.shape
    d = orig_shape[-1]
    f = w1.shape[1]
    assert d % 128 == 0 and f % 128 == 0, (d, f)
    rows = 1
    for s_ in orig_shape[:-1]:
        rows *= s_
    x2 = x.reshape(rows, d)

    tr = 1024 if rows >= 1024 else max(8, rows)
    pad = (-rows) % tr
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    n = x2.shape[0] // tr

    dt = x.dtype
    out = pl.pallas_call(
        functools.partial(_ffn_addln_kernel, eps=eps),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((tr, d), lambda i: (i, 0)),
            pl.BlockSpec((d, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tr, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, dt),
        interpret=interpret,
    )(x2, w1.astype(dt), b1.reshape(1, f), w2.astype(dt), b2.reshape(1, d),
      scale.reshape(1, d), bias.reshape(1, d))
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape)


def ffn_addlayernorm_reference(x, w1, b1, w2, b2, scale, bias,
                               eps: float = 1e-5):
    """Stock-ops twin (the transformer layers' non-fused eval path)."""
    dt = x.dtype
    h = jnp.maximum(x @ w1.astype(dt) + b1.astype(dt), 0)
    h = h @ w2.astype(dt) + b2.astype(dt)
    s = (x + h).astype(jnp.float32)
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mu), axis=-1, keepdims=True)
    y = (s - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(dt)
