#!/usr/bin/env python
"""On-chip A/B: f32 training vs mixed-precision (bf16 object body, f32 tail).

The full-bf16 backward miscompiles on this stack (exactly-zero grads through
the transformer->masked_max->l2_normalize tail — BENCHMARKS.md). The tail is
NOT where the FLOPs are: the PointNet/ObjectEncoder body is. This probe
trains the full-size coarse tower twice on the same synthetic data —
train_dtype f32 (baseline) and ModelConfig.body_dtype="bfloat16" — and
reports per-step time, loss trajectory, early-grad norms and train recall@1,
so the mixed mode can be promoted (or rejected) on evidence.

Usage: python scripts/probe_mixed_train.py [--steps 150] [--batch 32]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def run(body_dtype, steps, batch, data, cfg0):
    import jax
    import numpy as np

    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.text_embedding import HintTextEmbedder
    from text2loc_tpu.training import steps as steps_lib
    from text2loc_tpu.evaluation.retrieval import eval_retrieval

    cfg = cfg0.replace(
        model=dataclasses.replace(
            cfg0.model, dtype=cfg0.model.train_dtype, body_dtype=body_dtype
        )
    )
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
    order = np.random.default_rng(1)
    losses = []
    t_compile = time.perf_counter()
    idx = order.choice(data.num_poses, batch, replace=False)
    state, metrics = step(state, data.gather_coarse(idx, cfg.model.object_size), rng)
    jax.block_until_ready(metrics)
    print(f"  [{body_dtype or 'f32'}] compiled in "
          f"{time.perf_counter() - t_compile:.1f}s", file=sys.stderr, flush=True)

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
            print(f"  [{body_dtype or 'f32'}] step {i}: loss {loss:.4f}",
                  file=sys.stderr, flush=True)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / steps

    # Train-split retrieval recall with the trained params (bf16 serving model).
    serve_cfg = cfg0.replace(
        model=dataclasses.replace(cfg0.model, dtype="bfloat16", body_dtype=None)
    )
    serve_model = CellRetrievalNetwork(serve_cfg.model)
    recall_k, _, _ = eval_retrieval(
        data, state, serve_model, embedder, serve_cfg, top_k=(1, 3, 5)
    )
    recall = {int(k): round(float(v), 4) for k, v in recall_k.items()}
    return {
        "body_dtype": body_dtype or "float32",
        "ms_per_step": round(dt * 1e3, 1),
        "losses": losses,
        "train_recall": recall,
    }


def run_fine(body_dtype, steps, batch, data, cfg0):
    """Fine-stage A/B: same pattern over CrossMatch + MSE (fine.py:65-68);
    quality metric = mean train pose-offset error with the bf16 serving
    model (lower is better)."""
    import jax
    import numpy as np

    from text2loc_tpu.models.cross_matcher import CrossMatch
    from text2loc_tpu.models.text_embedding import HintTextEmbedder
    from text2loc_tpu.training import steps as steps_lib
    from text2loc_tpu.training.fine import eval_fine

    cfg = cfg0.replace(
        model=dataclasses.replace(
            cfg0.model, dtype=cfg0.model.train_dtype, body_dtype=body_dtype
        )
    )
    model = CrossMatch(cfg.model)
    embedder = HintTextEmbedder.compositional(
        embed_dim=cfg.model.text_embed_dim, max_tokens=cfg.model.max_hint_tokens
    )
    rng = jax.random.PRNGKey(0)
    opt = steps_lib.make_optimizer(cfg, steps_per_epoch=max(steps, 1))
    batch0 = data.gather_fine(np.arange(batch), cfg.model.pad_size)
    fb = steps_lib.prepare_fine_batch(batch0, embedder, cfg, rng, train=False)
    state = steps_lib.init_train_state(model, opt, rng, fb.objects, fb.text)

    step = jax.jit(
        steps_lib.make_fine_train_step(model, embedder, cfg, opt),
        donate_argnums=(0,),
    )
    order = np.random.default_rng(1)
    losses = []
    t_compile = time.perf_counter()
    idx = order.choice(data.num_poses, batch, replace=False)
    state, metrics = step(state, data.gather_fine(idx, cfg.model.pad_size), rng)
    jax.block_until_ready(metrics)
    print(f"  [fine {body_dtype or 'f32'}] compiled in "
          f"{time.perf_counter() - t_compile:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for i in range(steps):
        rng, srng = jax.random.split(rng)
        idx = order.choice(data.num_poses, batch, replace=False)
        state, metrics = step(
            state, data.gather_fine(idx, cfg.model.pad_size), srng
        )
        if i % 25 == 0 or i == steps - 1:
            loss = float(jax.device_get(metrics["loss"]))
            losses.append(round(loss, 4))
            print(f"  [fine {body_dtype or 'f32'}] step {i}: loss {loss:.4f}",
                  file=sys.stderr, flush=True)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / steps

    serve_cfg = cfg0.replace(
        model=dataclasses.replace(cfg0.model, dtype="bfloat16", body_dtype=None)
    )
    err = eval_fine(data, state, CrossMatch(serve_cfg.model), embedder, serve_cfg)
    return {
        "stage": "fine",
        "body_dtype": body_dtype or "float32",
        "ms_per_step": round(dt * 1e3, 1),
        "losses": losses,
        "train_pose_error": round(err, 5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--stage", default="coarse", choices=("coarse", "fine"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from text2loc_tpu.config import Config, ModelConfig, TrainConfig
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene

    cfg = Config(
        model=ModelConfig(), train=TrainConfig(batch_size=args.batch)
    ).validate()
    scene = make_scene(
        scene_name="0000", num_cells=64, num_poses=512,
        object_slots=cfg.model.object_size,
        num_points=cfg.model.pointnet.num_points,
        num_mentioned=cfg.model.num_mentioned, seed=0,
    )
    data = MultiSceneArrays([scene])

    runner = run_fine if args.stage == "fine" else run
    out = [
        runner(None, args.steps, args.batch, data, cfg),
        runner("bfloat16", args.steps, args.batch, data, cfg),
    ]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
