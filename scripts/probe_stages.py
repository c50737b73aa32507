#!/usr/bin/env python
"""Stage-level timing of the PointNet serving path on the real chip.

Times, at serving shapes (2048 clouds x 256 pts, bf16):
  * FPS alone (3 chained levels)
  * ball-query selection alone (approx + exact)
  * PointNet2 forward under each fused mode (off/gather/full variants)
"""
import functools
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from text2loc_tpu.config import ModelConfig
from text2loc_tpu.models.pointnet2 import PointNet2
from text2loc_tpu.ops.ballquery import ball_query_knn
from text2loc_tpu.ops.fps import fps_gather

N, P = 2048, 256
# 64 iterations per timing group: at ITERS=8 the per-group readback +
# per-dispatch relay overhead adds ~3.3 ms/iter (calibrated against a trivial
# jitted op — BENCHMARKS.md "Probe-harness calibration"); at 64 it is
# ~0.6 ms/iter. Numbers remain comparable within one setting only.
ITERS = 64

cfg = ModelConfig()
pn = cfg.pointnet
rng = np.random.default_rng(0)
xyz = jax.device_put(jnp.asarray(rng.random((N, P, 3)) * 2 - 1, jnp.float32))
rgb = jax.device_put(jnp.asarray(rng.random((N, P, 3)), jnp.bfloat16))


def drain(x):
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


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
    print(f"{name:34s} {best * 1e3:8.2f} ms", flush=True)
    return best


@jax.jit
def fps_all(pos):
    outs = []
    for s in pn.sa_num_points:
        pos, _, _ = fps_gather(pos, None, s)
        outs.append(pos)
    return outs


@functools.partial(jax.jit, static_argnames=("approx",))
def select_all(pos, approx):
    outs = []
    for s, r in zip(pn.sa_num_points, pn.sa_radii):
        ctr, _, _ = fps_gather(pos, None, s)
        idx, msk = ball_query_knn(pos, ctr, r, pn.sa_max_neighbors,
                                  approx=approx)
        outs.append((idx, msk))
        pos = ctr
    return outs


from text2loc_tpu.ops.pallas_fps import farthest_point_sampling_pallas

for tile in (64, 128, 256):
    f = jax.jit(functools.partial(
        farthest_point_sampling_pallas, num_samples=128, tile_n=tile))
    timeit(f"fps(256->128) tile={tile}", f, xyz)
timeit("fps + select(approx) x3", lambda p: select_all(p, True), xyz)
timeit("fps + select(exact) x3", lambda p: select_all(p, False), xyz)

model = PointNet2(cfg.pointnet, num_classes=23, num_colors=9,
                  dtype=jnp.bfloat16)
variables = jax.jit(functools.partial(model.init, train=False))(
    jax.random.PRNGKey(0), xyz, rgb
)

for mode, env in [
    ("off", {"TEXT2LOC_FUSED_SA": "off"}),
    ("gather+approx", {"TEXT2LOC_FUSED_SA": "gather",
                       "TEXT2LOC_APPROX_NEIGHBORS": "1"}),
    ("full it12", {"TEXT2LOC_FUSED_SA": "full", "TEXT2LOC_BISECT_ITERS": "12"}),
    ("full it10", {"TEXT2LOC_FUSED_SA": "full", "TEXT2LOC_BISECT_ITERS": "10"}),
    ("full it8", {"TEXT2LOC_FUSED_SA": "full", "TEXT2LOC_BISECT_ITERS": "8"}),
    ("all", {"TEXT2LOC_FUSED_SA": "all"}),
    ("first", {"TEXT2LOC_FUSED_SA": "first"}),
    ("first,first,all", {"TEXT2LOC_FUSED_SA": "first,first,all"}),
    ("full,full,all (cur default)", {"TEXT2LOC_FUSED_SA": "full,full,all"}),
]:
    for k in ("TEXT2LOC_FUSED_SA", "TEXT2LOC_APPROX_NEIGHBORS",
              "TEXT2LOC_BISECT_ITERS"):
        os.environ.pop(k, None)
    os.environ.update(env)

    def fwd(x, r, _m=model, _v=variables):
        return _m.apply(_v, x, r, train=False).features2

    f = jax.jit(fwd)
    timeit(f"pointnet fwd [{mode}]", f, xyz, rgb)
