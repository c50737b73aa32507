#!/usr/bin/env python
"""Train-step batch-size scaling, drift-cancelled, on-chip.

Contrastive retrieval wants the largest batch the chip can hold (more
in-batch negatives — and the DP all-gather InfoNCE extends that across
chips), so the framework's scaling story needs measured per-batch step
times, not just the reference's batch-32/64 recipe points. The relay's
congestion drifts by far more than the effect size across processes
(CLAUDE.md), so ALL batch sizes are timed in ONE process with their timing
groups INTERLEAVED round-robin: every size samples the same congestion
weather, and min-of-groups per size cancels the drift like an A/B.

Usage: python scripts/probe_batch_scaling.py [--stage coarse|fine]
       [--batches 32,64,128,256] [--rounds 4] [--group 6]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="coarse", choices=("coarse", "fine"))
    ap.add_argument("--batches", default="32,64,128,256")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--group", type=int, default=6,
                    help="steps per timed group (one drain per group)")
    ap.add_argument("--body_dtype", default=None)
    args = ap.parse_args()
    sizes = [int(b) for b in args.batches.split(",")]

    from text2loc_tpu.config import Config, ModelConfig, TrainConfig
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.cross_matcher import CrossMatch
    from text2loc_tpu.models.text_embedding import HintTextEmbedder
    from text2loc_tpu.training import steps as steps_lib

    base = Config(model=ModelConfig(), train=TrainConfig()).validate()
    base = base.replace(
        model=dataclasses.replace(
            base.model, dtype=base.model.train_dtype,
            body_dtype=args.body_dtype,
        )
    )
    scene = make_scene(
        scene_name="0000", num_cells=64, num_poses=max(512, 2 * max(sizes)),
        object_slots=base.model.object_size,
        num_points=base.model.pointnet.num_points,
        num_mentioned=base.model.num_mentioned, seed=0,
    )
    data = MultiSceneArrays([scene])
    embedder = HintTextEmbedder.compositional(
        embed_dim=base.model.text_embed_dim,
        max_tokens=base.model.max_hint_tokens,
    )
    rng = jax.random.PRNGKey(0)
    order = np.random.default_rng(1)

    # Per-size step/state/batches. States are donated per call, so each size
    # owns its own live state; batches are pre-gathered host arrays.
    runs = {}
    for b in sizes:
        cfg = base.replace(
            train=dataclasses.replace(base.train, batch_size=b)
        )
        opt = steps_lib.make_optimizer(cfg, steps_per_epoch=100)
        if args.stage == "coarse":
            model = CellRetrievalNetwork(cfg.model)
            batch0 = data.gather_coarse(np.arange(b), cfg.model.object_size)
            objects, text = steps_lib.prepare_coarse_batch(
                batch0, embedder, cfg, rng, train=False
            )
            state = steps_lib.init_train_state(model, opt, rng, objects, text)
            step = jax.jit(
                steps_lib.make_coarse_train_step(model, embedder, cfg, opt),
                donate_argnums=(0,),
            )
            gather = lambda idx, c=cfg: data.gather_coarse(
                idx, c.model.object_size
            )
        else:
            model = CrossMatch(cfg.model)
            batch0 = data.gather_fine(np.arange(b), cfg.model.pad_size)
            fb = steps_lib.prepare_fine_batch(
                batch0, embedder, cfg, rng, train=False
            )
            state = steps_lib.init_train_state(
                model, opt, rng, fb.objects, fb.text
            )
            step = jax.jit(
                steps_lib.make_fine_train_step(model, embedder, cfg, opt),
                donate_argnums=(0,),
            )
            gather = lambda idx, c=cfg: data.gather_fine(idx, c.model.pad_size)
        t0 = time.perf_counter()
        state, metrics = step(
            state, gather(order.choice(data.num_poses, b, replace=False)), rng
        )
        print(f"[{args.stage} b={b}] loss0 "
              f"{float(jax.device_get(metrics['loss'])):.4f} compile "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
        batches = [
            gather(order.choice(data.num_poses, b, replace=False))
            for _ in range(args.group)
        ]
        runs[b] = {"step": step, "state": state, "batches": batches,
                   "groups_ms": []}

    for _ in range(args.rounds):
        for b in sizes:
            r = runs[b]
            t0 = time.perf_counter()
            for batch in r["batches"]:
                rng, srng = jax.random.split(rng)
                r["state"], metrics = r["step"](r["state"], batch, srng)
            float(jax.device_get(metrics["loss"]))  # full drain
            r["groups_ms"].append(
                (time.perf_counter() - t0) / args.group * 1e3
            )

    out = {"stage": args.stage, "body_dtype": args.body_dtype or "float32",
           "rounds": args.rounds, "group": args.group, "per_batch": {}}
    for b in sizes:
        ms = min(runs[b]["groups_ms"])
        out["per_batch"][b] = {
            "ms_min_group": round(ms, 2),
            "groups": [round(g, 2) for g in runs[b]["groups_ms"]],
            "samples_per_s": round(b / ms * 1e3, 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
