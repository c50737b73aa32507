#!/usr/bin/env python
"""Relay-congestion sanity probe — run BEFORE any measurement session.

The TPU relay's congestion varies by ORDERS on bad days (identical cached
train-step programs measured 53 ms one day, 165 ms another — CLAUDE.md).
This probe times a tiny cached program (50 chained 1024^3 bf16 matmuls,
~0.55 ms of MXU work at the 197 TFLOP/s v5e peak) with the standard
scalar-readback drain, and compares min-of-groups against the known-good
reference of ~30-40 ms (the relay round-trip floor dominates a healthy
reading). Verdict:

  ok       < 2x the floor — record numbers normally
  drifted  >= 2x — defer the measurement session (CLAUDE.md rule)

Exit code 0 on ok, 2 on drifted, so scripts can gate on it.
"""
from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

# Healthy reading on this relay: the ~30 ms round trip + ~1 ms device work.
FLOOR_MS = 40.0
CHAIN = 50
DIM = 1024
GROUPS = 5


def main():
    @jax.jit
    def chain(x):
        def body(_, a):
            return a @ a * (1.0 / DIM)  # keep magnitudes bounded

        return jax.lax.fori_loop(0, CHAIN, body, x)

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(DIM, DIM)), jnp.bfloat16
    )
    out = chain(x)
    np.asarray(jnp.sum(out.astype(jnp.float32)))  # compile + settle
    times = []
    for _ in range(GROUPS):
        t0 = time.perf_counter()
        np.asarray(jnp.sum(chain(x).astype(jnp.float32)))
        times.append((time.perf_counter() - t0) * 1e3)
    ms = min(times)
    verdict = "ok" if ms < 2 * FLOOR_MS else "drifted"
    print(json.dumps({
        "probe": "relay_drift", "ms_min": round(ms, 1),
        "groups_ms": [round(t, 1) for t in times],
        "floor_ms": FLOOR_MS, "verdict": verdict,
    }))
    sys.exit(0 if verdict == "ok" else 2)


if __name__ == "__main__":
    main()
