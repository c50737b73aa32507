#!/usr/bin/env python
"""Decompose the coarse train step's time: object tower vs text tower vs
whole step, each as value_and_grad at the real training shapes.

Motivation: the gather-strategy microbenchmark (probe_gather_train.py) said
the SA gathers cost ~60 ms fwd+bwd in f32, yet making them ~6x cheaper did
not speed the step up — so the step is dominated elsewhere. This probe
times each piece in isolation (separate jitted programs, scalar readback).

Usage: python scripts/probe_step_parts.py [--batch 32] [--iters 20]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import numpy as np

    from text2loc_tpu.config import Config, ModelConfig, TrainConfig
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.text_embedding import HintTextEmbedder
    from text2loc_tpu.training import steps as steps_lib

    cfg = Config(model=ModelConfig(), train=TrainConfig(batch_size=args.batch)).validate()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, dtype=cfg.model.train_dtype))
    scene = make_scene(
        scene_name="0000", num_cells=64, num_poses=512,
        object_slots=cfg.model.object_size,
        num_points=cfg.model.pointnet.num_points,
        num_mentioned=cfg.model.num_mentioned, seed=0,
    )
    data = MultiSceneArrays([scene])
    model = CellRetrievalNetwork(cfg.model)
    embedder = HintTextEmbedder.compositional(
        embed_dim=cfg.model.text_embed_dim, max_tokens=cfg.model.max_hint_tokens
    )
    rng = jax.random.PRNGKey(0)
    opt = steps_lib.make_optimizer(cfg, steps_per_epoch=100)
    batch0 = data.gather_coarse(np.arange(args.batch), cfg.model.object_size)
    objects, text = steps_lib.prepare_coarse_batch(batch0, embedder, cfg, rng, train=False)
    state = steps_lib.init_train_state(model, opt, rng, objects, text)

    kd = jax.random.PRNGKey(7)

    def timed(name, fn, *a):
        f = jax.jit(fn)
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(np.asarray(jnp.sum(leaf)))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name}: {ms:.2f} ms", file=sys.stderr, flush=True)
        return round(ms, 2)

    res = {}

    def obj_loss(params):
        emb, upd = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            objects, train=True, mutable=["batch_stats"],
            rngs={"dropout": kd}, method=model.encode_objects,
        )
        return jnp.sum(emb * emb)

    res["objects_fwdbwd"] = timed(
        "objects_fwdbwd", lambda p: jax.value_and_grad(obj_loss)(p), state.params
    )

    def obj_fwd(params):
        emb, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            objects, train=True, mutable=["batch_stats"],
            rngs={"dropout": kd}, method=model.encode_objects,
        )
        return emb

    res["objects_fwd"] = timed("objects_fwd", obj_fwd, state.params)

    def txt_loss(params):
        emb, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            text, train=True, mutable=["batch_stats"],
            rngs={"dropout": kd}, method=model.encode_text,
        )
        return jnp.sum(emb * emb)

    res["text_fwdbwd"] = timed(
        "text_fwdbwd", lambda p: jax.value_and_grad(txt_loss)(p), state.params
    )

    step = jax.jit(steps_lib.make_coarse_train_step(model, embedder, cfg, opt))
    sb = data.gather_coarse(np.arange(args.batch), cfg.model.object_size)
    s2, m = step(state, sb, rng)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    cur = state
    for _ in range(args.iters):
        cur, m = step(cur, sb, rng)
    _ = float(np.asarray(m["loss"]))
    res["full_step"] = round((time.perf_counter() - t0) / args.iters * 1e3, 2)
    print(f"full_step: {res['full_step']} ms", file=sys.stderr, flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
