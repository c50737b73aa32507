#!/usr/bin/env python
"""Refresh BENCHMARKS.md's stage-timings table on the real chip.

Measures steady-state (min over groups, scalar-readback drained):
  * coarse contrastive train step, f32 and mixed-precision body
  * fine train step
  * gallery cell encoding (batch 32)
  * retrieval: 1000 queries x 50k-cell gallery, top-10
  * cached-gallery fine refine: 128 pose-candidate pairs
"""
from __future__ import annotations

import dataclasses
import functools
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from text2loc_tpu.config import Config, ModelConfig, TrainConfig
from text2loc_tpu.data.arrays import MultiSceneArrays
from text2loc_tpu.data.synthetic import make_scene
from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
from text2loc_tpu.models.cross_matcher import CrossMatch
from text2loc_tpu.models.text_embedding import HintTextEmbedder
from text2loc_tpu.evaluation.retrieval import make_coarse_encoders, topk_retrieval
from text2loc_tpu.training import steps as steps_lib


def drain(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args, iters=8, unit_items=None):
    out = fn(*args)
    drain(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        drain(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    rate = f"  ({unit_items / best:,.0f}/s)" if unit_items else ""
    print(f"{name:52s} {best * 1e3:8.2f} ms{rate}", flush=True)
    return best


B = 32
cfg = Config(model=ModelConfig(), train=TrainConfig(batch_size=B)).validate()
m = cfg.model
scene = make_scene(
    scene_name="0000", num_cells=64, num_poses=256,
    object_slots=m.object_size, num_points=m.pointnet.num_points,
    num_mentioned=m.num_mentioned, seed=0,
)
data = MultiSceneArrays([scene])
embedder = HintTextEmbedder.compositional(
    embed_dim=m.text_embed_dim, max_tokens=m.max_hint_tokens
)
rng = jax.random.PRNGKey(0)

# ---- train steps ----
for label, body in (("f32", None), ("mixed bf16-body", "bfloat16")):
    tcfg = cfg.replace(model=dataclasses.replace(
        m, dtype=m.train_dtype, body_dtype=body))
    model = CellRetrievalNetwork(tcfg.model)
    opt = steps_lib.make_optimizer(tcfg, steps_per_epoch=8)
    batch = jax.device_put(data.gather_coarse(np.arange(B), m.object_size))
    objects, text = steps_lib.prepare_coarse_batch(
        batch, embedder, tcfg, rng, train=False)
    state = steps_lib.init_train_state(model, opt, rng, objects, text)
    step = jax.jit(steps_lib.make_coarse_train_step(model, embedder, tcfg, opt))

    def run(state=state, step=step, batch=batch):
        s, mtr = step(state, batch, rng)
        return mtr["loss"]

    timeit(f"coarse train step {label} (B={B})", run, unit_items=B)

tcfg = cfg.replace(model=dataclasses.replace(m, dtype=m.train_dtype))
fine_model = CrossMatch(tcfg.model)
opt = steps_lib.make_optimizer(tcfg, steps_per_epoch=8)
fbatch = jax.device_put(data.gather_fine(np.arange(B), m.pad_size))
fb = steps_lib.prepare_fine_batch(fbatch, embedder, tcfg, rng, train=False)
fstate = steps_lib.init_train_state(fine_model, opt, rng, fb.objects, fb.text)
fstep = jax.jit(steps_lib.make_fine_train_step(fine_model, embedder, tcfg, opt))
timeit(f"fine train step f32 (B={B})",
       lambda: fstep(fstate, fbatch, rng)[1]["loss"], unit_items=B)

# ---- serving-side stages (bf16 inference models) ----
coarse_model = CellRetrievalNetwork(m)
cbatch = data.gather_coarse(np.arange(B), m.object_size)
objects, text = steps_lib.prepare_coarse_batch(cbatch, embedder, cfg, rng,
                                               train=False)
variables = jax.jit(functools.partial(coarse_model.init, train=False))(
    {"params": rng, "dropout": rng}, objects, text)
cparams = variables["params"]
cstats = variables.get("batch_stats", {})
encode_cells, encode_text = make_coarse_encoders(coarse_model, embedder, cfg)
cell_batch = jax.device_put(dict(cbatch))
timeit(f"gallery cell encoding (batch {B})",
       lambda: encode_cells(cparams, cstats, cell_batch, rng),
       unit_items=B)

gal = jnp.asarray(np.random.default_rng(0).random((50_000, m.coarse_embed_dim)),
                  jnp.bfloat16)
q = jnp.asarray(np.random.default_rng(1).random((1000, m.coarse_embed_dim)),
                jnp.bfloat16)
timeit("retrieval 1000q x 50k gallery top-10",
       lambda: topk_retrieval(gal, q, 10)[1], unit_items=1000)

# cached fine refine: 128 pairs
fwd = steps_lib.make_fine_split_forwards(CrossMatch(m), embedder, cfg)
fvars = jax.jit(functools.partial(CrossMatch(m).init, train=False))(
    {"params": rng, "dropout": rng}, fb.objects, fb.text)
femb, fmask = steps_lib.encode_fine_gallery(
    fwd, data, fvars["params"], fvars.get("batch_stats", {}), m.pad_size, rng,
    chunk=128)
pid = np.arange(128) % 256
textb = jax.device_put({
    "hint_dir": data.hint_dir[pid], "hint_color": data.hint_color[pid],
    "hint_label": data.hint_label[pid], "sentence_mask": data.hint_mask[pid]})
hints = fwd.encode_text(fvars["params"], fvars.get("batch_stats", {}), textb)
cells = jax.device_put(femb[np.arange(128) % data.num_cells])
masks = jax.device_put(fmask[np.arange(128) % data.num_cells])
smask = jnp.asarray(data.hint_mask[pid])
timeit("fine refine (cached gallery): 128 pairs",
       lambda: fwd.cct(fvars["params"], fvars.get("batch_stats", {}),
                       cells, masks, hints, smask), unit_items=128)
