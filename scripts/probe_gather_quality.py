#!/usr/bin/env python
"""Learning-quality A/B of TEXT2LOC_TRAIN_GATHER=f32 vs bf16 (vs split).

The bf16 one-hot gather rounds the gathered first-layer rows (pre-BatchNorm)
to bf16 during TRAINING; this probe trains the full-size coarse tower once
per mode on identical synthetic data (same seeds, same batch order) and
reports loss trajectories, early grad norms and train recall@1 — the same
promotion standard as the mixed-precision A/B (scripts/probe_mixed_train.py).

Each mode runs in its OWN subprocess: the knob is read at trace time, so one
process would silently reuse the first mode's compiled step.

Usage: python scripts/probe_gather_quality.py [--steps 150] [--batch 32]
       [--modes f32,bf16,split]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def inner(steps: int, batch: int) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import dataclasses

    import numpy as np

    from text2loc_tpu.config import Config, ModelConfig, TrainConfig
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.evaluation.retrieval import eval_retrieval
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.text_embedding import HintTextEmbedder
    from text2loc_tpu.training import steps as steps_lib

    cfg = Config(model=ModelConfig(), train=TrainConfig(batch_size=batch)).validate()
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
    model = CellRetrievalNetwork(cfg.model)
    embedder = HintTextEmbedder.compositional(
        embed_dim=cfg.model.text_embed_dim, max_tokens=cfg.model.max_hint_tokens
    )
    rng = jax.random.PRNGKey(0)
    opt = steps_lib.make_optimizer(cfg, steps_per_epoch=max(steps, 1))
    batch0 = data.gather_coarse(np.arange(batch), cfg.model.object_size)
    objects, text = steps_lib.prepare_coarse_batch(
        batch0, embedder, cfg, rng, train=False
    )
    state = steps_lib.init_train_state(model, opt, rng, objects, text)
    step = jax.jit(
        steps_lib.make_coarse_train_step(model, embedder, cfg, opt),
        donate_argnums=(0,),
    )

    # First-step grad norm (separate trace; promotion evidence for the
    # backward path, same standard as probe_mixed_train).
    loss_fn = steps_lib.make_coarse_train_step(model, embedder, cfg, opt)
    order = np.random.default_rng(1)
    losses, gnorm = [], None
    t0 = time.perf_counter()
    for i in range(steps):
        rng, srng = jax.random.split(rng)
        idx = order.choice(data.num_poses, batch, replace=False)
        state, metrics = step(
            state, data.gather_coarse(idx, cfg.model.object_size), srng
        )
        if i % 25 == 0 or i == steps - 1:
            loss = float(jax.device_get(metrics["loss"]))
            losses.append(round(loss, 4))
            print(f"  step {i}: loss {loss:.4f}", file=sys.stderr, flush=True)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / steps

    serve_cfg = Config(
        model=dataclasses.replace(ModelConfig(), dtype="bfloat16"),
        train=TrainConfig(batch_size=batch),
    ).validate()
    recall_k, _, _ = eval_retrieval(
        data, state, CellRetrievalNetwork(serve_cfg.model), embedder, serve_cfg,
        top_k=(1, 3, 5),
    )
    print(json.dumps({
        "mode": os.environ.get("TEXT2LOC_TRAIN_GATHER", "bf16"),
        "ms_per_step": round(dt * 1e3, 1),
        "losses": losses,
        "train_recall": {int(k): round(float(v), 4) for k, v in recall_k.items()},
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--modes", default="f32,bf16")
    ap.add_argument("--inner", action="store_true")
    args = ap.parse_args()
    if args.inner:
        inner(args.steps, args.batch)
        return
    out = []
    for mode in args.modes.split(","):
        env = dict(os.environ, TEXT2LOC_TRAIN_GATHER=mode)
        r = subprocess.run(
            [sys.executable, __file__, "--inner", "--steps", str(args.steps),
             "--batch", str(args.batch)],
            env=env, capture_output=True, text=True,
        )
        sys.stderr.write(r.stderr[-2000:])
        if r.returncode:
            print(f"mode {mode} FAILED", file=sys.stderr)
            continue
        out.append(json.loads(r.stdout.strip().splitlines()[-1]))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
