#!/usr/bin/env python
"""Re-probe the full-bf16 backward miscompile (BENCHMARKS.md "bf16 backward
miscompilation"): on this stack the bf16 BACKWARD of the coarse tower's
transformer -> masked_max -> l2_normalize tail produces EXACTLY-ZERO grads
(forward fine, f32 fine, CPU fine). Training therefore runs f32 bodies
(ModelConfig.train_dtype) with the opt-in bf16-body mixed mode.

Run once per round (VERDICT r4 #10): if a stack update fixes it, full-bf16
training is a free ~1.4x on both train steps. Verdict rule: a leaf-wise grad
sweep of ONE coarse train-step backward at small size —

  fixed          bf16 zero-leaf set == f32 zero-leaf set (and loss finite)
  still_broken   bf16 has exactly-zero grad leaves that f32 does not

Exit 0 on fixed, 3 on still_broken (so round scripts can notice a flip).

Usage: python scripts/probe_bf16_backward.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def grad_zero_leaves(dtype_name):
    import jax
    import numpy as np

    from text2loc_tpu.config import small_test_config
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.text_embedding import HintTextEmbedder
    from text2loc_tpu.training import losses, steps as steps_lib

    cfg = small_test_config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, dtype=dtype_name,
                                                train_dtype=dtype_name))
    data = MultiSceneArrays([make_scene(
        "0000", num_cells=6, num_poses=16,
        object_slots=cfg.model.object_size,
        num_points=cfg.model.pointnet.num_points,
        num_mentioned=cfg.model.num_mentioned, seed=0,
    )])
    embedder = HintTextEmbedder.compositional(
        embed_dim=cfg.model.text_embed_dim,
        max_tokens=cfg.model.max_hint_tokens,
    )
    model = CellRetrievalNetwork(cfg.model)
    rng = jax.random.PRNGKey(0)
    batch = data.gather_coarse(np.arange(cfg.train.batch_size),
                               cfg.model.object_size)
    objects, text = steps_lib.prepare_coarse_batch(batch, embedder, cfg, rng,
                                                   train=False)
    opt = steps_lib.make_optimizer(cfg, steps_per_epoch=8)
    state = steps_lib.init_train_state(model, opt, rng, objects, text)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        text_enc, vs1 = model.apply(
            variables, text, train=True, method=model.encode_text,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        cell_enc, _ = model.apply(
            variables, objects, train=True, method=model.encode_objects,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        return losses.contrastive_loss(
            text_enc.astype("float32"), cell_enc.astype("float32"),
            temperature=cfg.train.loss.temperature,
        )

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(state.params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    zero = sorted(
        str(path) for path, g in flat
        if float(np.max(np.abs(np.asarray(jax.device_get(g), np.float32))))
        == 0.0
    )
    return float(jax.device_get(loss)), zero, len(flat)


def main():
    import jax

    from text2loc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    f32_loss, f32_zero, n = grad_zero_leaves("float32")
    bf_loss, bf_zero, _ = grad_zero_leaves("bfloat16")
    extra = sorted(set(bf_zero) - set(f32_zero))
    verdict = "fixed" if not extra else "still_broken"
    print(json.dumps({
        "probe": "bf16_backward",
        "backend": jax.default_backend(),
        "n_leaves": n,
        "f32_loss": round(f32_loss, 4),
        "bf16_loss": round(bf_loss, 4),
        "f32_zero_leaves": len(f32_zero),
        "bf16_zero_leaves": len(bf_zero),
        "bf16_only_zero_leaves": extra[:8],
        "verdict": verdict,
    }))
    return 0 if verdict == "fixed" else 3


if __name__ == "__main__":
    sys.exit(main())
