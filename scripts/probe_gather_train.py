#!/usr/bin/env python
"""A/B the neighbor-gather formulations at TRAINING shapes (fwd + bwd).

The XLA training path's one-hot gather materializes [N, S*K, P] selection
tensors in HBM (SA1 at batch 32: ~3.8 GB, read in forward AND rebuilt in
backward). Candidates, each timed as value_and_grad of sum(gather(u, idx)):

* onehot_f32   — current: jax.nn.one_hot + einsum (ops.ballquery)
* onehot_bf16  — same but values+one-hot in bf16 (halves HBM traffic;
                 training would pay a precision cast on the gathered rows)
* row_take     — flatten to [N*P, C] + axis-0 jnp.take (fast fwd per
                 CLAUDE.md probe); backward is XLA's scatter-add
* pallas       — per-cloud VMEM one-hot matmul, multi-cloud tiled, custom
                 VJP (transposed VMEM one-hot matmul) — ops.pallas_gather

Usage: python scripts/probe_gather_train.py [--n 896] [--iters 20]
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=896)   # 32 poses x 28 objects
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import numpy as np

    from text2loc_tpu.ops.ballquery import onehot_gather

    # (level, P, S, K, H1) — hoisted path gathers H1 channels.
    levels = [("sa1", 256, 128, 32, 32), ("sa2", 128, 64, 32, 128),
              ("sa3", 64, 32, 32, 256)]

    def time_fn(fn, *a):
        f = jax.jit(fn)
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*a)
        _ = float(np.asarray(jnp.sum(out[1] if isinstance(out, tuple) else out)))
        return (time.perf_counter() - t0) / args.iters * 1e3

    results = {}
    rng = np.random.default_rng(0)
    for name, p, s, k, c in levels:
        n, q = args.n, s * k
        u = jnp.asarray(rng.standard_normal((n, p, c)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, p, (n, s, k)), jnp.int32)

        def grad_of(gather):
            def loss(u):
                return jnp.sum(gather(u, idx) ** 2)
            return jax.value_and_grad(loss)

        row = {}
        row["onehot_f32"] = time_fn(grad_of(onehot_gather), u)

        def bf16_gather(u, idx):
            return onehot_gather(u.astype(jnp.bfloat16), idx).astype(jnp.float32)
        row["onehot_bf16"] = time_fn(grad_of(bf16_gather), u)

        def row_take(u, idx):
            flat = idx.reshape(n, -1) + (jnp.arange(n) * p)[:, None]
            return jnp.take(u.reshape(n * p, c), flat.reshape(-1), axis=0
                            ).reshape(n, s, k, c)
        row["row_take"] = time_fn(grad_of(row_take), u)

        try:
            from text2loc_tpu.ops.pallas_gather import gather_rows_grad

            def pallas(u, idx):
                return gather_rows_grad(u, idx.reshape(n, -1)).reshape(n, s, k, c)
            row["pallas"] = time_fn(grad_of(pallas), u)
        except ImportError:
            row["pallas"] = None
        results[name] = {k2: (round(v, 2) if v else v) for k2, v in row.items()}
        print(f"{name}: {results[name]}", file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
