#!/usr/bin/env python
"""Time ONE SA level's edge pipeline fwd+bwd: unhoisted vs hoisted first
layer x gather dtype, as pure functions at exact train shapes.

Isolates why the hoisted first layer regressed the full step (see
PROBE_train_step history in BENCHMARKS.md): same masked-BN math, same
neighbor sets (fixed idx/mask inputs), value_and_grad wrt (x, W1, W2).

Usage: python scripts/probe_sa_formulations.py [--n 896] [--iters 20]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=896)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import numpy as np

    # (name, P, S, K, C_in_features, H1, H2) — C_in = x channels (no rel).
    levels = [("sa1", 256, 128, 32, 3, 32, 64),
              ("sa2", 128, 64, 32, 64, 128, 128),
              ("sa3", 64, 32, 32, 128, 256, 256)]

    def masked_bn_relu(h, maskf, scale, bias):
        mf = maskf[..., None]
        count = jnp.maximum(jnp.sum(mf), 1.0)
        mean = jnp.sum(h * mf, axis=(0, 1, 2)) / count
        var = jnp.sum(((h - mean) ** 2) * mf, axis=(0, 1, 2)) / count
        inv = jax.lax.rsqrt(var + 1e-5)
        return jax.nn.relu((h - mean) * (scale * inv) + bias)

    def unhoisted(x, pos, ctr, idx, maskf, w1, b1, w2, b2, s1, be1, s2, be2,
                  gd):
        both = jnp.concatenate([x, pos], axis=-1)
        if gd is not None:
            both = both.astype(gd)
        oh = jax.nn.one_hot(idx.reshape(idx.shape[0], -1), both.shape[1],
                            dtype=both.dtype)
        nbr = jnp.einsum("nqp,npc->nqc", oh, both).astype(jnp.float32)
        nbr = nbr.reshape(idx.shape + (both.shape[-1],))
        nbr_x, nbr_pos = nbr[..., : x.shape[-1]], nbr[..., x.shape[-1]:]
        rel = nbr_pos - ctr[:, :, None, :]
        h = jnp.concatenate([nbr_x, rel], axis=-1)
        h = jnp.dot(h, w1) + b1
        h = masked_bn_relu(h, maskf, s1, be1)
        h = jnp.dot(h, w2) + b2
        h = masked_bn_relu(h, maskf, s2, be2)
        return jnp.max(jnp.where(maskf[..., None] > 0, h, -1e30), axis=2)

    def hoisted(x, pos, ctr, idx, maskf, w1, b1, w2, b2, s1, be1, s2, be2,
                gd):
        both = jnp.concatenate([x, pos], axis=-1)
        u = jnp.dot(both, w1)
        sv = jnp.dot(ctr, w1[x.shape[-1]:])
        if gd is not None:
            u = u.astype(gd)
        oh = jax.nn.one_hot(idx.reshape(idx.shape[0], -1), u.shape[1],
                            dtype=u.dtype)
        g = jnp.einsum("nqp,npc->nqc", oh, u).astype(jnp.float32)
        h = g.reshape(idx.shape + (u.shape[-1],)) - sv[:, :, None, :] + b1
        h = masked_bn_relu(h, maskf, s1, be1)
        h = jnp.dot(h, w2) + b2
        h = masked_bn_relu(h, maskf, s2, be2)
        return jnp.max(jnp.where(maskf[..., None] > 0, h, -1e30), axis=2)

    rng = np.random.default_rng(0)
    out = {}
    for name, p, s, k, c, h1, h2 in levels:
        n = args.n
        x = jnp.asarray(rng.standard_normal((n, p, c)), jnp.float32)
        pos = jnp.asarray(rng.random((n, p, 3)), jnp.float32)
        ctr = jnp.asarray(rng.random((n, s, 3)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, p, (n, s, k)), jnp.int32)
        maskf = jnp.asarray(rng.random((n, s, k)) < 0.9, jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((c + 3, h1)) * 0.1, jnp.float32)
        b1 = jnp.zeros((h1,), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((h1, h2)) * 0.1, jnp.float32)
        b2 = jnp.zeros((h2,), jnp.float32)
        s1 = jnp.ones((h1,)); be1 = jnp.zeros((h1,))
        s2 = jnp.ones((h2,)); be2 = jnp.zeros((h2,))

        row = {}
        for label, fn, gd in (
            ("unhoist_f32", unhoisted, None),
            ("unhoist_bf16", unhoisted, jnp.bfloat16),
            ("hoist_f32", hoisted, None),
            ("hoist_bf16", hoisted, jnp.bfloat16),
        ):
            def loss(x_, w1_, w2_, fn=fn, gd=gd):
                o = fn(x_, pos, ctr, idx, maskf, w1_, b1, w2_, b2,
                       s1, be1, s2, be2, gd)
                return jnp.sum(o * o)

            f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
            v, g = f(x, w1, w2)
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                v, g = f(x, w1, w2)
            _ = float(np.asarray(v))
            row[label] = round((time.perf_counter() - t0) / args.iters * 1e3, 2)
        out[name] = row
        print(f"{name}: {row}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
