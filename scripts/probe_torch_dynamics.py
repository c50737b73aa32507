#!/usr/bin/env python
"""Learning-curve A/B: our train steps vs a torch reference training loop.

tests/test_training_dynamics.py proves STEP-level parity (losses, per-leaf
gradients, Adam updates, BN stats over 4 steps). This probe answers the
longer-horizon question: trained for hundreds of steps from converted-
identical init on IDENTICAL synthetic batches, do the two frameworks reach
the same place? The torch side reproduces the reference recipe verbatim
(ContrastiveLoss + Adam for coarse, /root/reference/training/coarse.py:32-60;
offset_lambda * MSELoss + Adam for fine, training/fine.py:39-100) on
reference-SHAPED towers (tests/test_full_model_convert.py fixtures); both
sides run in reference-attention mode (mask_padded=False) with dropout 0 and
augmentation off so every step consumes bit-identical inputs. Final metrics
are computed by OUR evaluator on both weight sets (conversion equality is
separately proven, so the evaluator is a fair shared oracle).

CPU-only (the torch side has no TPU); run from the repo root:
    python scripts/probe_torch_dynamics.py [--steps 300] [--batch 16]
Emits per-phase loss curves + final recall / pose-error with PASS/FAIL
verdicts; the expectation is agreement within a few percent (f32 trajectory
chaos grows with steps; the dynamics are identical, not the bit patterns).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def build_data(cfg, num_cells=10, num_poses=48, seed=0):
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene

    return MultiSceneArrays([
        make_scene(
            scene_name="0000", num_cells=num_cells, num_poses=num_poses,
            object_slots=cfg.model.object_size,
            num_points=cfg.model.pointnet.num_points,
            num_mentioned=cfg.model.num_mentioned, seed=seed,
        )
    ])


def embed_batches(data, embedder, cfg, steps, batch, fine, seed=1):
    """Pre-gather every training batch ONCE and inject the embedded text so
    torch and jax consume bit-identical inputs (the token_embeds passthrough
    in steps.embed_text_batch)."""
    import numpy as np

    order = np.random.default_rng(seed)
    out = []
    for _ in range(steps):
        idx = order.choice(data.num_poses, batch, replace=False)
        b = (
            data.gather_fine(idx, cfg.model.pad_size)
            if fine else data.gather_coarse(idx, cfg.model.object_size)
        )
        text = embedder.embed(
            b["hint_dir"], b["hint_color"], b["hint_label"],
            sentence_mask=b.get("sentence_mask"),
        )
        b["token_embeds"] = np.asarray(text.token_embeds, np.float32)
        b["token_mask"] = np.asarray(text.token_mask)
        out.append(b)
    return out


def run_coarse(args, cfg, data, embedder, ref, convert, model):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_training_dynamics import ref_contrastive

    from text2loc_tpu.evaluation.retrieval import eval_retrieval
    from text2loc_tpu.models import torch_convert as tc
    from text2loc_tpu.training import steps as steps_lib

    batches = embed_batches(data, embedder, cfg, args.steps, args.batch,
                            fine=False)
    params, stats = convert(tc.to_numpy(ref.state_dict()), cfg.model)
    params = jax.tree_util.tree_map(np.copy, params)
    stats = jax.tree_util.tree_map(np.copy, stats)
    optimizer = steps_lib.make_optimizer(cfg, steps_per_epoch=args.steps,
                                         lr=cfg.train.learning_rate)
    state = steps_lib.TrainState(
        jax.tree_util.tree_map(jnp.asarray, params),
        jax.tree_util.tree_map(jnp.asarray, stats),
        optimizer.init(jax.tree_util.tree_map(jnp.asarray, params)),
        jnp.zeros((), jnp.int32),
    )
    step = jax.jit(steps_lib.make_coarse_train_step(model, embedder, cfg,
                                                    optimizer))
    opt = torch.optim.Adam(ref.parameters(), lr=cfg.train.learning_rate)
    temp = cfg.train.loss.temperature
    rng = jax.random.PRNGKey(0)
    tl, jl = [], []
    t0 = time.perf_counter()
    for b in batches:
        opt.zero_grad()
        anchor = ref.encode_text(torch.as_tensor(b["token_embeds"]))
        positive = ref.encode_objects(
            torch.as_tensor(b["class_idx"], dtype=torch.long),
            torch.as_tensor(b["color"]), torch.as_tensor(b["center"]),
            torch.as_tensor(b["num_points"]),
        )
        loss = ref_contrastive(anchor, positive, temp)
        loss.backward()
        opt.step()
        tl.append(float(loss.detach()))
        state, m = step(state, b, rng)
        jl.append(float(m["loss"]))
    print(f"  [coarse] {args.steps} steps x2 in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # Shared-oracle eval: our evaluator on both weight sets.
    ref.eval()
    tp, ts = convert(tc.to_numpy(ref.state_dict()), cfg.model)
    tstate = steps_lib.TrainState(
        jax.tree_util.tree_map(jnp.asarray, tp),
        jax.tree_util.tree_map(jnp.asarray, ts), None, jnp.zeros((), jnp.int32),
    )
    acc_j, close_j, _ = eval_retrieval(data, state, model, embedder, cfg)
    acc_t, close_t, _ = eval_retrieval(data, tstate, model, embedder, cfg)
    return dict(
        loss_torch=tl, loss_jax=jl,
        recall_torch={k: float(v) for k, v in acc_t.items()},
        recall_jax={k: float(v) for k, v in acc_j.items()},
    )


def run_fine(args, cfg, data, embedder, ref, convert, model):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from text2loc_tpu.models import torch_convert as tc
    from text2loc_tpu.training import steps as steps_lib
    from text2loc_tpu.training.losses import pose_error

    batches = embed_batches(data, embedder, cfg, args.steps, args.batch,
                            fine=True)
    eval_b = embed_batches(data, embedder, cfg, 1, min(48, data.num_poses),
                           fine=True, seed=99)[0]
    params, stats = convert(tc.to_numpy(ref.state_dict()), cfg.model)
    params = jax.tree_util.tree_map(np.copy, params)
    stats = jax.tree_util.tree_map(np.copy, stats)
    optimizer = steps_lib.make_optimizer(cfg, steps_per_epoch=args.steps,
                                         lr=cfg.train.learning_rate)
    state = steps_lib.TrainState(
        jax.tree_util.tree_map(jnp.asarray, params),
        jax.tree_util.tree_map(jnp.asarray, stats),
        optimizer.init(jax.tree_util.tree_map(jnp.asarray, params)),
        jnp.zeros((), jnp.int32),
    )
    step = jax.jit(steps_lib.make_fine_train_step(model, embedder, cfg,
                                                  optimizer))
    fwd = steps_lib.make_fine_forward(model, embedder, cfg)
    opt = torch.optim.Adam(ref.parameters(), lr=cfg.train.learning_rate)
    lam = cfg.train.offset_lambda
    rng = jax.random.PRNGKey(0)
    tl, jl = [], []
    t0 = time.perf_counter()
    for b in batches:
        opt.zero_grad()
        pred = ref(
            torch.as_tensor(b["class_idx"], dtype=torch.long),
            torch.as_tensor(b["color"]), torch.as_tensor(b["center"]),
            torch.as_tensor(b["num_points"]),
            torch.as_tensor(b["token_embeds"]),
        )
        loss = lam * torch.nn.functional.mse_loss(
            pred, torch.as_tensor(b["target"])
        )
        loss.backward()
        opt.step()
        tl.append(float(loss.detach()))
        state, m = step(state, b, rng)
        jl.append(float(m["loss"]))
    print(f"  [fine] {args.steps} steps x2 in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    ref.eval()
    with torch.no_grad():
        pred_t = ref(
            torch.as_tensor(eval_b["class_idx"], dtype=torch.long),
            torch.as_tensor(eval_b["color"]),
            torch.as_tensor(eval_b["center"]),
            torch.as_tensor(eval_b["num_points"]),
            torch.as_tensor(eval_b["token_embeds"]),
        ).numpy()
    pred_j = np.asarray(fwd(state.params, state.batch_stats, eval_b, rng))
    tgt = jnp.asarray(eval_b["target"])
    return dict(
        loss_torch=tl, loss_jax=jl,
        pose_error_torch=float(pose_error(jnp.asarray(pred_t), tgt)),
        pose_error_jax=float(pose_error(jnp.asarray(pred_j), tgt)),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--stage", choices=("coarse", "fine", "both"),
                    default="both")
    ap.add_argument("--recall_tol", type=float, default=0.08,
                    help="max |recall@k| gap at every k")
    ap.add_argument("--pose_tol", type=float, default=0.03,
                    help="max pose-error gap (normalized cell units)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    from text2loc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import dataclasses

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_full_model_convert import (
        RefCellRetrieval,
        RefCrossMatch,
        _model_cfg,
    )
    from test_training_dynamics import _zero_dropout

    from text2loc_tpu.config import Config, EvalConfig, TrainConfig
    from text2loc_tpu.models import torch_convert as tc
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.cross_matcher import CrossMatch
    from text2loc_tpu.models.text_embedding import HintTextEmbedder

    mcfg = dataclasses.replace(_model_cfg(), dropout_rate=0.0,
                               mask_padded=False)
    cfg = Config(
        model=mcfg,
        train=TrainConfig(
            batch_size=args.batch, lr_gamma=1.0, learning_rate=1e-3,
            flip_poses=False, shuffle_hints=False, pc_augment=False,
            fine_flip_poses=False, top_k=(1, 2, 3),
        ),
        eval=EvalConfig(top_k=(1, 2, 3)),
    ).validate()
    data = build_data(cfg)
    embedder = HintTextEmbedder.compositional(
        cfg.model.text_embed_dim, cfg.model.max_hint_tokens
    )

    results = {}
    ok = True
    if args.stage in ("coarse", "both"):
        torch.manual_seed(3)
        ref = RefCellRetrieval()
        _zero_dropout(ref)
        ref.train()
        r = run_coarse(args, cfg, data, embedder, ref,
                       tc.convert_cell_retrieval_checkpoint,
                       CellRetrievalNetwork(cfg.model))
        gaps = {k: abs(r["recall_jax"][k] - r["recall_torch"][k])
                for k in r["recall_jax"]}
        r["recall_gap_max"] = max(gaps.values())
        r["pass"] = r["recall_gap_max"] <= args.recall_tol
        ok &= r["pass"]
        print(f"[coarse] final loss torch={r['loss_torch'][-1]:.4f} "
              f"jax={r['loss_jax'][-1]:.4f}")
        print(f"[coarse] recall torch={r['recall_torch']} "
              f"jax={r['recall_jax']} -> max gap {r['recall_gap_max']:.3f} "
              f"{'PASS' if r['pass'] else 'FAIL'}")
        r["loss_torch"] = r["loss_torch"][::10]
        r["loss_jax"] = r["loss_jax"][::10]
        results["coarse"] = r
    if args.stage in ("fine", "both"):
        torch.manual_seed(4)
        ref = RefCrossMatch()
        _zero_dropout(ref)
        ref.train()
        r = run_fine(args, cfg, data, embedder, ref,
                     tc.convert_cross_matcher_checkpoint,
                     CrossMatch(cfg.model))
        r["pose_gap"] = abs(r["pose_error_jax"] - r["pose_error_torch"])
        r["pass"] = r["pose_gap"] <= args.pose_tol
        ok &= r["pass"]
        print(f"[fine] final loss torch={r['loss_torch'][-1]:.4f} "
              f"jax={r['loss_jax'][-1]:.4f}")
        print(f"[fine] pose error torch={r['pose_error_torch']:.4f} "
              f"jax={r['pose_error_jax']:.4f} -> gap {r['pose_gap']:.4f} "
              f"{'PASS' if r['pass'] else 'FAIL'}")
        r["loss_torch"] = r["loss_torch"][::10]
        r["loss_jax"] = r["loss_jax"][::10]
        results["fine"] = r
    print(json.dumps(results))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
