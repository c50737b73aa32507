#!/usr/bin/env python
"""A/B `lax.top_k` vs TPU `approx_max_k` for full-gallery retrieval.

The coarse stage's only gallery-size-dependent cost is top-k over the
[Q, C] score matrix (BENCHMARKS log #20: C 4,096 -> 65,536 adds +2.5 ms per
1024-query batch while the matmul itself is ~0.2 ms of MXU). TPU XLA ships
`jax.lax.approx_max_k` (Chern et al. 2022) precisely for this shape of
problem; this probe measures, at several C:

  * exact_ms / approx_ms — min-of-groups time of score-matmul + selection
    (the `evaluation.retrieval.topk_retrieval` program, both variants);
  * top1_agree / top10_overlap — retrieval agreement of approx vs exact on
    the SAME scores (random unit gallery + unit queries, the towers'
    L2-normalized geometry).

The knob under test is `TEXT2LOC_APPROX_TOPK=1` (default off — exact
selection is the reference protocol; evaluation/retrieval.py:_approx_topk).

Usage: python scripts/probe_approx_topk.py [--cells 4096 16384 65536]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q = 1024
D = 256
K = 10
GROUP = 20
ITERS = 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, nargs="*",
                    default=[4096, 16384, 65536])
    args = ap.parse_args()

    from text2loc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from text2loc_tpu.evaluation.retrieval import _topk_impl

    def unit_rows(rng, n):
        x = rng.normal(size=(n, D)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    host = np.random.default_rng(0)
    queries = jax.device_put(jnp.asarray(unit_rows(host, Q)))

    def drain(x):
        np.asarray(jnp.sum(x[0].astype(jnp.float32)))

    out = []
    for c in args.cells:
        gallery = jax.device_put(jnp.asarray(unit_rows(host, c)))
        row = {"cells": c, "q": Q, "k": K}
        res = {}
        for name, approx in (("exact", False), ("approx", True)):
            fn = lambda: _topk_impl(gallery, queries, K, approx)
            drain(fn())  # compile + settle
            groups = []
            for _ in range(ITERS):
                t0 = time.perf_counter()
                for _ in range(GROUP):
                    r = fn()
                drain(r)
                groups.append((time.perf_counter() - t0) / GROUP * 1e3)
            row[f"{name}_ms"] = round(min(groups), 3)
            res[name] = np.asarray(jax.device_get(fn()[1]))
        ex, ap_ = res["exact"], res["approx"]
        row["top1_agree"] = float((ex[:, 0] == ap_[:, 0]).mean())
        row["top10_overlap"] = float(np.mean([
            len(set(ex[i]) & set(ap_[i])) / K for i in range(Q)
        ]))
        row["speedup"] = round(row["exact_ms"] / row["approx_ms"], 2)
        out.append(row)
        print(json.dumps(row), flush=True)
    return out


if __name__ == "__main__":
    main()
