#!/usr/bin/env python
"""On-chip A/B: fine-stage pose-flip augmentation ON vs OFF.

The reference fine recipe trains WITHOUT flips
(/root/reference/training/fine.py:168 builds its dataset with
flip_pose=False); rounds 1-2 here flipped by default — an undocumented recipe
deviation (VERDICT r2 weak #2). `TrainConfig.fine_flip_poses` now defaults
False (the reference recipe); this probe trains the full-size CrossMatch both
ways on the same synthetic data and compares HELD-OUT pose error (unseen
poses over the same map, `make_scene(pose_seed=...)`), so the default is
evidence-backed rather than assumed.

Usage: python scripts/probe_fine_flip.py [--steps 400] [--batch 32]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def run(flip: bool, steps, batch, train_data, val_data, cfg0):
    import jax
    import numpy as np

    from text2loc_tpu.models.cross_matcher import CrossMatch
    from text2loc_tpu.models.text_embedding import HintTextEmbedder
    from text2loc_tpu.training import steps as steps_lib
    from text2loc_tpu.training.fine import eval_fine

    cfg = cfg0.replace(
        model=dataclasses.replace(cfg0.model, dtype=cfg0.model.train_dtype),
        train=dataclasses.replace(cfg0.train, fine_flip_poses=flip),
    )
    model = CrossMatch(cfg.model)
    embedder = HintTextEmbedder.compositional(
        embed_dim=cfg.model.text_embed_dim,
        max_tokens=cfg.model.max_hint_tokens,
    )
    rng = jax.random.PRNGKey(0)
    opt = steps_lib.make_optimizer(cfg, steps_per_epoch=max(steps, 1))
    batch0 = train_data.gather_fine(np.arange(batch), cfg.model.pad_size)
    fb = steps_lib.prepare_fine_batch(batch0, embedder, cfg, rng, train=False)
    state = steps_lib.init_train_state(model, opt, rng, fb.objects, fb.text)

    step = jax.jit(
        steps_lib.make_fine_train_step(model, embedder, cfg, opt),
        donate_argnums=(0,),
    )
    order = np.random.default_rng(1)
    t_compile = time.perf_counter()
    idx = order.choice(train_data.num_poses, batch, replace=False)
    state, metrics = step(
        state, train_data.gather_fine(idx, cfg.model.pad_size), rng
    )
    jax.block_until_ready(metrics)
    print(f"  [flip={flip}] compiled in {time.perf_counter() - t_compile:.1f}s",
          file=sys.stderr, flush=True)

    losses = []
    t0 = time.perf_counter()
    for i in range(steps):
        rng, srng = jax.random.split(rng)
        idx = order.choice(train_data.num_poses, batch, replace=False)
        state, metrics = step(
            state, train_data.gather_fine(idx, cfg.model.pad_size), srng
        )
        if i % 50 == 0 or i == steps - 1:
            loss = float(jax.device_get(metrics["loss"]))
            losses.append(round(loss, 4))
            print(f"  [flip={flip}] step {i}: loss {loss:.4f}",
                  file=sys.stderr, flush=True)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / steps

    train_err = eval_fine(train_data, state, model, embedder, cfg)
    val_err = eval_fine(val_data, state, model, embedder, cfg)
    return {
        "fine_flip_poses": flip,
        "ms_per_step": round(dt * 1e3, 1),
        "losses": losses,
        "train_pose_error": round(train_err, 4),
        "heldout_pose_error": round(val_err, 4),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from text2loc_tpu.config import Config
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene

    cfg = Config().validate()
    m = cfg.model
    mk = lambda poses, pose_seed=None: MultiSceneArrays([make_scene(
        "0000", num_cells=64, num_poses=poses,
        object_slots=max(m.object_size, m.pad_size),
        num_points=m.pointnet.num_points, num_mentioned=m.num_mentioned,
        seed=0, pose_seed=pose_seed,
    )])
    train_data = mk(512)
    val_data = mk(256, pose_seed=7)   # unseen poses, same map

    results = [run(False, args.steps, args.batch, train_data, val_data, cfg),
               run(True, args.steps, args.batch, train_data, val_data, cfg)]
    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
