#!/usr/bin/env python
"""Split train-step time into device compute vs host->device input transfer.

Round-4's driver fragment and the round-5 bench both read coarse ~268 ms /
fine ~116 ms per step on HEALTHY drift days, vs the 84.3/53.1 ms pinned
mid-round-4 — a 2.3-3.2x gap that drift cannot explain. Hypothesis: the
timed loop feeds HOST numpy batches, so every step re-uploads ~6 MB through
the relay tunnel, and the tunnel's UPLOAD bandwidth (unlike its round-trip
latency, which the drift probe does measure) changed between sessions.

This probe times the SAME jitted step three ways:
  host     gather -> step(state, host_numpy_batch)   (the bench's loop)
  device   batches jax.device_put AHEAD of the timer (pure step compute)
  upload   jax.device_put alone, drained             (the transfer itself)

Usage: python scripts/probe_train_input.py [--stage coarse|fine] [--steps 12]
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
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--stage", default="coarse", choices=("coarse", "fine"))
    args = ap.parse_args()

    import jax

    from text2loc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import dataclasses

    import numpy as np

    from text2loc_tpu.config import Config, ModelConfig, TrainConfig
    from text2loc_tpu.data.arrays import MultiSceneArrays
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

    order = np.random.default_rng(1)
    batches = [
        gather(order.choice(data.num_poses, args.batch, replace=False))
        for _ in range(args.steps)
    ]
    nbytes = sum(a.nbytes for a in jax.tree_util.tree_leaves(batches[0])
                 if hasattr(a, "nbytes"))

    state, m = step(state, batches[0], rng)    # compile
    float(jax.device_get(m["loss"]))

    def timed(run_batches, tag):
        nonlocal state, rng
        groups = []
        for i in range(0, len(run_batches), 4):
            t0 = time.perf_counter()
            for b in run_batches[i:i + 4]:
                rng, srng = jax.random.split(rng)
                state, m = step(state, b, srng)
            float(jax.device_get(m["loss"]))
            groups.append((time.perf_counter() - t0) / 4 * 1e3)
        print(f"{tag}: {min(groups):.1f} ms/step (groups "
              f"{[round(g, 1) for g in groups]})", file=sys.stderr, flush=True)
        return min(groups)

    host_ms = timed(batches, "host-fed")
    dev_batches = [jax.device_put(b) for b in batches]
    jax.block_until_ready(dev_batches)
    dev_ms = timed(dev_batches, "device-staged")

    # Upload alone: device_put the same host batches, drained per group.
    import jax.numpy as jnp

    up_groups = []
    for i in range(0, len(batches), 4):
        t0 = time.perf_counter()
        outs = [jax.device_put(b) for b in batches[i:i + 4]]
        np.asarray(jnp.sum(jax.tree_util.tree_leaves(outs[-1])[0]))
        up_groups.append((time.perf_counter() - t0) / 4 * 1e3)
    up_ms = min(up_groups)

    print(json.dumps({
        "stage": args.stage, "batch": args.batch,
        "batch_mb": round(nbytes / 1e6, 2),
        "host_fed_ms": round(host_ms, 1),
        "device_staged_ms": round(dev_ms, 1),
        "upload_only_ms": round(up_ms, 1),
        "upload_gbps": round(nbytes / (up_ms / 1e3) / 1e9, 3),
    }))


if __name__ == "__main__":
    main()
