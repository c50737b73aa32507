"""Fused residual-add + LayerNorm Pallas kernel.

The CCT decoder cascade's post-LN chain is its second-largest cost at
production shapes: 12 LayerNorm+residual steps over [40960, 128]-ish rows
measured 2.29 ms as stock XLA ops (scripts/probe_cct_parts.py) — ~10x the
HBM-bandwidth bound, because each LN materializes the f32 sum, mean/var
passes, and the normalized intermediate as separate HBM round trips. This
kernel does read(x, res) -> f32 stats -> scale/bias -> write(out) in ONE VMEM
pass per row tile.

Numerics match `flax.linen.LayerNorm(epsilon=eps)(x + res)` (f32 statistics,
biased variance, output cast to the input dtype). Forward/inference only —
the training path keeps the stock composable ops (no custom VJP needed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _addln_kernel(x_ref, r_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32) + r_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_add_layernorm(x, res, scale, bias, eps: float = 1e-5,
                        interpret: bool = False):
    """LayerNorm(x + res) * scale + bias over the last axis, one HBM pass.

    x, res: [..., D] (same shape/dtype); scale, bias: [D]. D must be a
    multiple of 128 lanes (the model dims here are 128/256/1024).
    """
    orig_shape = x.shape
    d = orig_shape[-1]
    assert d % 128 == 0, d
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    r2 = res.reshape(rows, d)

    tr = 512 if rows >= 512 else max(8, rows)
    pad = (-rows) % tr
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        r2 = jnp.pad(r2, ((0, pad), (0, 0)))
    n = x2.shape[0] // tr

    out = pl.pallas_call(
        functools.partial(_addln_kernel, eps=eps),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((tr, d), lambda i: (i, 0)),
            pl.BlockSpec((tr, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tr, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
    )(x2, r2, scale.reshape(1, d), bias.reshape(1, d))
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape)


def add_layernorm_reference(x, res, scale, bias, eps: float = 1e-5):
    """Stock-ops twin of the kernel (flax LayerNorm numerics)."""
    s = (x + res).astype(jnp.float32)
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mu), axis=-1, keepdims=True)
    y = (s - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)
