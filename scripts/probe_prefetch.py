#!/usr/bin/env python
"""A/B the trainers' prefetched input pipeline against the serial loop.

Three timings of the SAME jitted train step over the SAME batch sequence:

  serial     gather -> step(state, host_batch)        (pre-prefetch trainers)
  prefetch   data.prefetch worker gathers + device_puts 2 batches ahead
             (the trainer loop since round 5)
  floor      every batch device-staged before the timer (pure step compute —
             the best any input pipeline can do)

The prefetch win is (serial - prefetch); (prefetch - floor) is residual
input cost the worker could not hide. On the remote-TPU tunnel the upload is
huge (BENCHMARKS log #18) so the win is large; on locally-attached TPU it
still hides the host gather + copy.

Usage: python scripts/probe_prefetch.py [--stage coarse|fine] [--steps 24]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Runtime insert (NOT PYTHONPATH: pre-startup path changes break the axon
# site hook's backend registration on this stack).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--stage", default="coarse", choices=("coarse", "fine"))
    ap.add_argument("--depth", type=int, default=2)
    args = ap.parse_args()

    import jax

    from text2loc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import dataclasses

    import numpy as np

    from text2loc_tpu.config import Config, ModelConfig, TrainConfig
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.prefetch import prefetch
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.cross_matcher import CrossMatch
    from text2loc_tpu.models.text_embedding import HintTextEmbedder
    from text2loc_tpu.training import steps as steps_lib

    cfg = Config(
        model=ModelConfig(), train=TrainConfig(batch_size=args.batch)
    ).validate()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, dtype=cfg.model.train_dtype)
    )
    scene = make_scene(
        scene_name="0000", num_cells=64, num_poses=512,
        object_slots=cfg.model.object_size,
        num_points=cfg.model.pointnet.num_points,
        num_mentioned=cfg.model.num_mentioned, seed=0,
    )
    data = MultiSceneArrays([scene])
    embedder = HintTextEmbedder.compositional(
        embed_dim=cfg.model.text_embed_dim,
        max_tokens=cfg.model.max_hint_tokens,
    )
    rng = jax.random.PRNGKey(0)
    opt = steps_lib.make_optimizer(cfg, steps_per_epoch=100)

    if args.stage == "coarse":
        model = CellRetrievalNetwork(cfg.model)
        b0 = data.gather_coarse(np.arange(args.batch), cfg.model.object_size)
        objects, text = steps_lib.prepare_coarse_batch(
            b0, embedder, cfg, rng, train=False
        )
        state = steps_lib.init_train_state(model, opt, rng, objects, text)
        step = jax.jit(
            steps_lib.make_coarse_train_step(model, embedder, cfg, opt),
            donate_argnums=(0,),
        )
        gather = lambda i: data.gather_coarse(i, cfg.model.object_size)
    else:
        model = CrossMatch(cfg.model)
        b0 = data.gather_fine(np.arange(args.batch), cfg.model.pad_size)
        fb = steps_lib.prepare_fine_batch(b0, embedder, cfg, rng, train=False)
        state = steps_lib.init_train_state(model, opt, rng, fb.objects,
                                           fb.text)
        step = jax.jit(
            steps_lib.make_fine_train_step(model, embedder, cfg, opt),
            donate_argnums=(0,),
        )
        gather = lambda i: data.gather_fine(i, cfg.model.pad_size)

    idx = [
        np.random.default_rng(100 + s).choice(
            data.num_poses, args.batch, replace=False
        )
        for s in range(args.steps)
    ]

    state, m = step(state, gather(idx[0]), rng)    # compile
    float(jax.device_get(m["loss"]))

    def drain(metric):
        # Force a scalar readback: block_until_ready on queued work can
        # return before remote execution finishes (CLAUDE.md).
        float(jax.device_get(metric))

    def run_serial():
        nonlocal state, rng
        for i in idx:
            rng, srng = jax.random.split(rng)
            state, m = step(state, gather(i), srng)
        drain(m["loss"])

    def run_prefetch():
        nonlocal state, rng
        it = prefetch((gather(i) for i in idx), put=jax.device_put,
                      depth=args.depth)
        for b in it:
            rng, srng = jax.random.split(rng)
            state, m = step(state, b, srng)
        drain(m["loss"])

    staged = [jax.device_put(gather(i)) for i in idx]
    jax.block_until_ready(staged)

    def run_floor():
        nonlocal state, rng
        for b in staged:
            rng, srng = jax.random.split(rng)
            state, m = step(state, b, srng)
        drain(m["loss"])

    def timed(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, (time.perf_counter() - t0) / args.steps * 1e3)
        return best

    floor_ms = timed(run_floor)       # warm everything first
    serial_ms = timed(run_serial)
    prefetch_ms = timed(run_prefetch)

    print(json.dumps({
        "stage": args.stage, "batch": args.batch, "steps": args.steps,
        "depth": args.depth,
        "serial_ms": round(serial_ms, 1),
        "prefetch_ms": round(prefetch_ms, 1),
        "floor_ms": round(floor_ms, 1),
        "win_pct": round(100 * (serial_ms - prefetch_ms) / serial_ms, 1),
        "residual_ms": round(prefetch_ms - floor_ms, 1),
    }))


if __name__ == "__main__":
    main()
