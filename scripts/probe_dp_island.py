#!/usr/bin/env python
"""On-chip A/B for the fused-SA DP default (VERDICT r3 next #4).

The fused TRAINING SA kernels (Mosaic custom calls) cannot be partitioned
by GSPMD, so DP steps either (a) fall back to the XLA SA path or (b) run
the kernel inside a shard_map island with psum'd BN statistics
(`TEXT2LOC_FUSED_SA_TRAIN_DP`). Island==XLA loss equality is proven on the
8-device CPU mesh (tests/test_parallel.py) and in dryrun_multichip; what
was missing is a real-chip TIMING showing what the island costs. Only a
1-device mesh exists on this hardware — that measures the island's
mechanical overhead (shard_map region entry, psum lowering on a trivial
axis, kernel-vs-XLA inside a GSPMD program) but NOT multi-chip collective
behavior; the decision extrapolates the overhead, not the win.

Times, per stage: the plain single-chip jitted step (context), the DP step
with the island OFF (GSPMD/XLA SA path), and the DP step with the island ON
(stage-aware fused-auto inside shard_map). min-of-groups statistics (relay
drift, CLAUDE.md).

Usage: python scripts/probe_dp_island.py [--steps 24] [--batch 32]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time


def _time_step(step, state, batches, rng, steps):
    import jax

    group = max(1, steps // 4)
    group_ms = []
    for i in range(0, len(batches), group):
        chunk = batches[i:i + group]
        t0 = time.perf_counter()
        for b in chunk:
            rng, srng = jax.random.split(rng)
            state, metrics = step(state, b, srng)
        loss = float(jax.device_get(metrics["loss"]))
        group_ms.append((time.perf_counter() - t0) / len(chunk) * 1e3)
    return min(group_ms), [round(g, 2) for g in group_ms], loss, state


def run_stage(stage, args, cfg, data, embedder):
    import jax
    import numpy as np

    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.cross_matcher import CrossMatch
    from text2loc_tpu.parallel import train as ptrain
    from text2loc_tpu.parallel.mesh import make_mesh, shard_batch
    from text2loc_tpu.training import steps as steps_lib

    rng = jax.random.PRNGKey(0)
    opt = steps_lib.make_optimizer(cfg, steps_per_epoch=100)
    if stage == "coarse":
        model = CellRetrievalNetwork(cfg.model)
        batch0 = data.gather_coarse(np.arange(args.batch), cfg.model.object_size)
        objects, text = steps_lib.prepare_coarse_batch(
            batch0, embedder, cfg, rng, train=False)
        state0 = steps_lib.init_train_state(model, opt, rng, objects, text)
        make_single = steps_lib.make_coarse_train_step
        make_dp = ptrain.make_dp_coarse_train_step
        gather = lambda idx: data.gather_coarse(idx, cfg.model.object_size)
    else:
        model = CrossMatch(cfg.model)
        batch0 = data.gather_fine(np.arange(args.batch), cfg.model.pad_size)
        fb = steps_lib.prepare_fine_batch(batch0, embedder, cfg, rng, train=False)
        state0 = steps_lib.init_train_state(model, opt, rng, fb.objects, fb.text)
        make_single = steps_lib.make_fine_train_step
        make_dp = ptrain.make_dp_fine_train_step
        gather = lambda idx: data.gather_fine(idx, cfg.model.pad_size)

    # Host-resident template: the DP step donates its state, and
    # replicate_state's device_put can alias a device-resident source
    # buffer — the second variant's re-replication would then read deleted
    # arrays.
    state0 = jax.device_get(state0)
    order = np.random.default_rng(1)
    host_batches = [
        gather(order.choice(data.num_poses, args.batch, replace=False))
        for _ in range(args.steps)
    ]
    mesh = make_mesh()
    out = {}

    # single-chip context
    step = jax.jit(make_single(model, embedder, cfg, opt))
    state = state0
    state, _ = step(state, host_batches[0], rng)        # compile
    ms, groups, loss, _ = _time_step(step, state, host_batches, rng, args.steps)
    out["single"] = {"ms_min_group": round(ms, 2), "groups": groups,
                     "loss": round(loss, 4)}
    print(f"  [{stage}] single-chip {ms:.1f} ms/step", file=sys.stderr)

    for mode, env in (("dp_xla", "0"), ("dp_island", "1")):
        os.environ["TEXT2LOC_FUSED_SA_TRAIN_DP"] = env
        dstep = make_dp(model, embedder, cfg, opt, mesh)   # binds env NOW
        dbatches = [shard_batch(b, mesh) for b in host_batches]
        state = ptrain.replicate_state(state0, mesh)
        state, m = dstep(state, dbatches[0], rng)          # compile
        l0 = float(jax.device_get(m["loss"]))
        t0 = time.perf_counter()
        ms, groups, loss, _ = _time_step(dstep, state, dbatches, rng,
                                         args.steps)
        out[mode] = {"ms_min_group": round(ms, 2), "groups": groups,
                     "loss": round(loss, 4), "loss0": round(l0, 4)}
        print(f"  [{stage}] {mode} {ms:.1f} ms/step", file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--stage", default="both",
                    choices=("coarse", "fine", "both"))
    args = ap.parse_args()

    import jax

    from text2loc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import numpy as np  # noqa: F401

    from text2loc_tpu.config import Config, ModelConfig, TrainConfig
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.models.text_embedding import HintTextEmbedder

    cfg = Config(
        model=ModelConfig(), train=TrainConfig(batch_size=args.batch)
    ).validate()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, dtype=cfg.model.train_dtype)
    )
    data = MultiSceneArrays([make_scene(
        scene_name="0000", num_cells=64, num_poses=512,
        object_slots=cfg.model.object_size,
        num_points=cfg.model.pointnet.num_points,
        num_mentioned=cfg.model.num_mentioned, seed=0,
    )])
    embedder = HintTextEmbedder.compositional(
        embed_dim=cfg.model.text_embed_dim, max_tokens=cfg.model.max_hint_tokens
    )
    results = {"devices": len(jax.devices())}
    stages = ("coarse", "fine") if args.stage == "both" else (args.stage,)
    for stage in stages:
        results[stage] = run_stage(stage, args, cfg, data, embedder)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
