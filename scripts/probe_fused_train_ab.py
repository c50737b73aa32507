#!/usr/bin/env python
"""On-chip learning A/B: fused training SA kernel vs the XLA edge path.

The fused kernel's gradients match XLA's to the shared precision class
(scripts/probe_sa_train.py), but masked-max winner flips make elementwise
equality chaotic — so the promotion evidence is end-to-end: train the
full-size coarse tower twice on identical synthetic data (f32, batch 32),
toggling only TEXT2LOC_FUSED_SA_TRAIN, and compare loss trajectory +
train-split recall. Reuses probe_mixed_train.run.

Usage: python scripts/probe_fused_train_ab.py [--steps 150] [--batch 32]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--configs", nargs="*", default=["0", "1"],
                    help="TEXT2LOC_FUSED_SA_TRAIN values to compare "
                         "(e.g. 0 auto 0,0,1)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from probe_mixed_train import run

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

    out = []
    for env in args.configs:
        os.environ["TEXT2LOC_FUSED_SA_TRAIN"] = env
        r = run(None, args.steps, args.batch, data, cfg)
        r["sa_train"] = env
        out.append(r)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
