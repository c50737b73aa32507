#!/usr/bin/env python
"""Per-SA-level kernel timings on the real chip (full vs all vs gather).

Reference ladder shapes at serving batch (2048 clouds): SA1 [256->128, 6->32
->64], SA2 [128->64, 67->128->128], SA3 [64->32, 131->256->256]. Pinpoints
which level holds the remaining time and which aggregation strategy wins
per level.
"""
import functools
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from text2loc_tpu.ops.ballquery import ball_query_knn
from text2loc_tpu.ops.pallas_pointconv import (
    fused_sa_gather,
    fused_sa_select,
    fused_set_abstraction,
)

N = 2048
# 64 iterations per timing group: at ITERS=8 the per-group readback +
# per-dispatch relay overhead adds ~3.3 ms/iter (calibrated against a trivial
# jitted op — BENCHMARKS.md "Probe-harness calibration"); at 64 it is
# ~0.6 ms/iter. Numbers remain comparable within one setting only.
ITERS = 64
LEVELS = [
    ("SA1", 256, 128, 6, 32, 64, 0.2),
    ("SA2", 128, 64, 64, 128, 128, 0.3),
    ("SA3", 64, 32, 128, 256, 256, 0.4),
]
K = 32


def drain(x):
    np.asarray(jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args):
    out = fn(*args)
    drain(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        drain(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:28s} {best * 1e3:8.2f} ms", flush=True)
    return best


rng = np.random.default_rng(0)
for name, p, s, c, h1, h2, r in LEVELS:
    cin = c + 3
    x = jax.device_put(jnp.asarray(rng.random((N, p, c)), jnp.bfloat16))
    pos = jax.device_put(jnp.asarray(rng.random((N, p, 3)) * 2 - 1, jnp.float32))
    ctr = pos[:, :s]
    feat = jnp.concatenate([x, pos.astype(jnp.bfloat16)], axis=-1)
    w1 = jax.device_put(jnp.asarray(rng.random((cin, h1)) * 0.1, jnp.bfloat16))
    wp = w1[c:]
    ab1 = jax.device_put(jnp.asarray(rng.random((2, h1)), jnp.float32))
    w2 = jax.device_put(jnp.asarray(rng.random((h1, h2)) * 0.1, jnp.bfloat16))
    ab2 = jax.device_put(jnp.asarray(rng.random((2, h2)), jnp.float32))

    f_full = jax.jit(functools.partial(
        fused_sa_select, radius=r, k=K, bisect_iters=12))
    timeit(f"{name} full(it12)", f_full, feat, pos, ctr, w1, wp, ab1, w2, ab2)


    f_all = jax.jit(functools.partial(
        fused_set_abstraction, radius=r, k=K, select_k=False))
    timeit(f"{name} all", f_all, x, pos, ctr, w1[:c], wp, ab1, w2, ab2)

    idx, msk = ball_query_knn(pos, ctr, r, K, approx=True)
    idx = jax.device_put(idx)
    msk = jax.device_put(msk)
    timeit(f"{name} gather(sel outside)", fused_sa_gather,
           feat, ctr, idx, msk, w1, wp, ab1, w2, ab2)

    sel = jax.jit(functools.partial(ball_query_knn, radius=r, k=K, approx=True))
    timeit(f"{name} outside selection", lambda a, b: sel(a, b)[0], pos, ctr)
