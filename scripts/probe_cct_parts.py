#!/usr/bin/env python
"""Sub-op breakdown of the CCT decoder cascade at production shapes.

probe_cct.py measured cct alone at 6.53 ms / MFU 0.048 while its pure-matmul
twin runs 2.99 ms — where do the other 3.5 ms go? This times each op family
of the cascade (2 paired TorchDecoderLayers at B=2560, obj L=16, hint M=6,
D=128, H=4) as separate jitted programs:

  * all linear projections (the twin, proper row counts per side)
  * batched tiny attention (scores+softmax+weighted-sum, [B,4,16,16]/[B,4,16,6])
  * the layernorm+residual+dropout-free elementwise chain
  * a block-diagonal reformulation of the tiny attention (heads folded into
    one dense matmul per GROUP of samples, block mask in the softmax) — the
    candidate fix if batched-tiny attention dominates.
"""
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

B, O, S, D, H = 2560, 16, 6, 128, 4
DH = D // H
FF = 4 * D
ITERS, GROUP = 3, 20


def drain(x):
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(name, fn, *args, flops=None):
    out = fn(*args)
    drain(out)
    best = 1e9
    for _ in range(ITERS):
        t0 = time.perf_counter()
        for _ in range(GROUP):
            out = fn(*args)
        drain(out)
        best = min(best, (time.perf_counter() - t0) / GROUP)
    extra = ""
    if flops:
        extra = f"  {flops / best / 1e12:6.1f} TF/s  mfu={flops / best / 197e12:.3f}"
    print(f"{name:46s} {best * 1e3:8.2f} ms{extra}", flush=True)
    return best


def cost_flops(jfn, *args):
    try:
        c = jfn.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0)) or None
    except Exception:
        return None


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    obj = jax.device_put(jnp.asarray(rng.standard_normal((B, O, D)), dt))
    hints = jax.device_put(jnp.asarray(rng.standard_normal((B, S, D)), dt))
    w = jax.device_put(jnp.asarray(rng.standard_normal((D, D)) * 0.05, dt))
    wff1 = jax.device_put(jnp.asarray(rng.standard_normal((D, FF)) * 0.05, dt))
    wff2 = jax.device_put(jnp.asarray(rng.standard_normal((FF, D)) * 0.05, dt))

    # --- 1. projections with the real row counts --------------------------
    @jax.jit
    def projections(obj, hints, w, wff1, wff2):
        o = obj.reshape(B * O, D)
        h = hints.reshape(B * S, D)
        for _ in range(2):                     # 2 layer-pairs
            for _ in range(4):                 # obj self qkv+o
                o = o @ w
            o = o @ w                          # obj cross q
            for _ in range(2):                 # cross k,v from hints
                h = h @ w
            o = o @ w                          # cross out
            o = jnp.maximum(o @ wff1, 0) @ wff2
            for _ in range(4):                 # hint-side self
                h = h @ w
            h = h @ w                          # hint cross q
            for _ in range(2):                 # k,v from obj
                o = o @ w
            h = h @ w
            h = jnp.maximum(h @ wff1, 0) @ wff2
        return o, h

    f = cost_flops(projections, obj, hints, w, wff1, wff2)
    timeit("projections (real row counts)", projections, obj, hints, w,
           wff1, wff2, flops=f)

    # --- 2. batched tiny attention ---------------------------------------
    q = jax.device_put(jnp.asarray(rng.standard_normal((B, H, O, DH)), dt))
    k = jax.device_put(jnp.asarray(rng.standard_normal((B, H, O, DH)), dt))
    v = jax.device_put(jnp.asarray(rng.standard_normal((B, H, O, DH)), dt))
    km = jax.device_put(jnp.asarray(rng.standard_normal((B, H, S, DH)), dt))
    vm = jax.device_put(jnp.asarray(rng.standard_normal((B, H, S, DH)), dt))

    @jax.jit
    def tiny_attn(q, k, v, km, vm):
        out = []
        for kk, vv in ((k, v), (km, vm)) * 2:  # 2 self + 2 cross per pass
            s = jnp.einsum("bhqd,bhkd->bhqk", q, kk,
                           preferred_element_type=jnp.float32) / np.sqrt(DH)
            a = jax.nn.softmax(s, axis=-1).astype(dt)
            out.append(jnp.einsum("bhqk,bhkd->bhqd", a, vv))
        return sum(out)

    f = cost_flops(tiny_attn, q, k, v, km, vm)
    timeit("batched tiny attention x4 (2 layers)", tiny_attn, q, k, v, km, vm,
           flops=f)

    # --- 3. elementwise chain (LN + residual) ----------------------------
    g = jax.device_put(jnp.ones((D,), dt))
    b_ = jax.device_put(jnp.zeros((D,), dt))

    @jax.jit
    def ln_chain(obj, hints, g, b_):
        def ln(x):
            mu = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
            var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
            return ((x - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype) * g + b_
        for _ in range(6):                     # 3 LNs x 2 layers per side
            obj = ln(obj + obj)
            hints = ln(hints + hints)
        return obj, hints

    timeit("layernorm+residual chain (12 LNs)", ln_chain, obj, hints, g, b_)

    # --- 4. block-diagonal attention reformulation -----------------------
    # Fold G samples into one [G*O, G*O] dense score matrix per head with a
    # block mask; MXU sees [G*O, DH] x [DH, G*O] dense matmuls instead of G
    # tiny ones. FLOP cost x G over the useful work — profitable only if the
    # batched-tiny path is latency-bound, which is what we're testing.
    G = 8
    nb = B // G
    qg = q.reshape(nb, G * O, H, DH).transpose(0, 2, 1, 3)  # [nb, H, G*O, DH]
    kg = k.reshape(nb, G * O, H, DH).transpose(0, 2, 1, 3)
    vg = v.reshape(nb, G * O, H, DH).transpose(0, 2, 1, 3)
    blk = np.kron(np.eye(G, dtype=np.float32), np.ones((O, O), np.float32))
    mask_bias = jax.device_put(jnp.asarray((1.0 - blk) * -1e9, jnp.float32))

    @jax.jit
    def blockdiag_attn(qg, kg, vg, mask_bias):
        out = []
        for _ in range(4):
            s = jnp.einsum("nhqd,nhkd->nhqk", qg, kg,
                           preferred_element_type=jnp.float32) / np.sqrt(DH)
            a = jax.nn.softmax(s + mask_bias, axis=-1).astype(dt)
            out.append(jnp.einsum("nhqk,nhkd->nhqd", a, vg))
        return sum(out)

    f = cost_flops(blockdiag_attn, qg, kg, vg, mask_bias)
    timeit(f"block-diag attention x4 (G={G})", blockdiag_attn, qg, kg, vg,
           mask_bias, flops=f)

    G = 32
    nb = B // G
    qg = q.reshape(nb, G * O, H, DH).transpose(0, 2, 1, 3)
    kg = k.reshape(nb, G * O, H, DH).transpose(0, 2, 1, 3)
    vg = v.reshape(nb, G * O, H, DH).transpose(0, 2, 1, 3)
    blk = np.kron(np.eye(G, dtype=np.float32), np.ones((O, O), np.float32))
    mask_bias = jax.device_put(jnp.asarray((1.0 - blk) * -1e9, jnp.float32))
    f = cost_flops(blockdiag_attn, qg, kg, vg, mask_bias)
    timeit(f"block-diag attention x4 (G={G})", blockdiag_attn, qg, kg, vg,
           mask_bias, flops=f)

    # --- 5. fori_loop-free full-layer estimate ---------------------------
    # flash-style combined: projections + tiny attention + LN in ONE program
    # (what the real cct does, minus masks) to see XLA's fusion behavior.
    @jax.jit
    def combined(obj, hints, w, wff1, wff2, g, b_):
        def ln(x):
            mu = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
            var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
            return ((x - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype) * g + b_
        def attn(x, mem):
            qq = (x @ w).reshape(B, -1, H, DH).transpose(0, 2, 1, 3)
            kk = (mem @ w).reshape(B, -1, H, DH).transpose(0, 2, 1, 3)
            vv = (mem @ w).reshape(B, -1, H, DH).transpose(0, 2, 1, 3)
            s = jnp.einsum("bhqd,bhkd->bhqk", qq, kk,
                           preferred_element_type=jnp.float32) / np.sqrt(DH)
            a = jax.nn.softmax(s, axis=-1).astype(dt)
            o = jnp.einsum("bhqk,bhkd->bhqd", a, vv)
            o = o.transpose(0, 2, 1, 3).reshape(x.shape)
            return o @ w
        for _ in range(2):
            obj = ln(obj + attn(obj, obj))
            obj = ln(obj + attn(obj, hints))
            obj = ln(obj + (jnp.maximum(obj @ wff1, 0) @ wff2))
            hints = ln(hints + attn(hints, hints))
            hints = ln(hints + attn(hints, obj))
            hints = ln(hints + (jnp.maximum(hints @ wff1, 0) @ wff2))
        return obj, hints

    f = cost_flops(combined, obj, hints, w, wff1, wff2, g, b_)
    timeit("combined full-cascade (XLA, no masks)", combined, obj, hints, w,
           wff1, wff2, g, b_, flops=f)


if __name__ == "__main__":
    sys.exit(main())
