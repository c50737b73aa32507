#!/usr/bin/env python
"""Accuracy-validate the fast kernel variants against the exact path (on TPU).

The serving stack has three opt-in speedups whose numerics differ from the
default exact path (BENCHMARKS.md): the fused Pallas SA kernel in "all" mode
(aggregates over ALL in-radius neighbors instead of the K nearest),
its "exact" in-kernel K-selection mode, and `approx_max_k` neighbor selection.
The reference's own neighborhoods are arbitrary insertion-ordered <=K subsets
(torch-cluster `gnn.radius`, models/pointcloud/pointnet2.py:28-34), so none of
these is a semantics downgrade a priori — but "within noise" must be measured,
not asserted.

Protocol: train coarse + fine at FULL reference shapes on synthetic scenes
(the synthetic hints carry real signal), then evaluate the SAME trained
weights under every kernel mode on a held-out synthetic scene. Kernel modes
only affect inference (training always uses the XLA exact path), so this
isolates the serving-numerics question. Reports per mode:

* coarse retrieval recall@k,
* end-to-end localization recall k x thresh (top-1 row),
* fine throughput,
* agreement vs the exact path: top-1 retrieval agreement and mean |delta
  position| in meters on poses where the retrieval agrees.

Usage:  python scripts/validate_kernels.py [--steps 200] [--out results.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time


def _train(cfg, data, mode, steps, seed=0):
    import jax
    import numpy as np

    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.cross_matcher import CrossMatch
    from text2loc_tpu.models.text_embedding import HintTextEmbedder
    from text2loc_tpu.training import steps as steps_lib

    embedder = HintTextEmbedder.compositional(
        embed_dim=cfg.model.text_embed_dim, max_tokens=cfg.model.max_hint_tokens
    )
    rng = jax.random.PRNGKey(seed)
    opt = steps_lib.make_optimizer(cfg, steps_per_epoch=max(steps, 1))
    order = np.random.default_rng(seed)
    b = cfg.train.batch_size

    if mode == "coarse":
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
        gather = lambda idx: data.gather_coarse(idx, cfg.model.object_size)
    else:
        model = CrossMatch(cfg.model)
        batch0 = data.gather_fine(np.arange(b), cfg.model.pad_size)
        fb = steps_lib.prepare_fine_batch(batch0, embedder, cfg, rng, train=False)
        state = steps_lib.init_train_state(model, opt, rng, fb.objects, fb.text)
        step = jax.jit(
            steps_lib.make_fine_train_step(model, embedder, cfg, opt),
            donate_argnums=(0,),
        )
        gather = lambda idx: data.gather_fine(idx, cfg.model.pad_size)

    loss = float("nan")
    for i in range(steps):
        idx = order.choice(data.num_poses, b, replace=False)
        rng, srng = jax.random.split(rng)
        state, metrics = step(state, gather(idx), srng)
        if i % 50 == 0 or i == steps - 1:
            loss = float(metrics["loss"])
            print(f"  {mode} step {i}: loss {loss:.4f}", file=sys.stderr, flush=True)
    return model, state, embedder, loss


MODES = {
    # Baseline: one-hot XLA + exact KNN (TEXT2LOC_FUSED_SA defaults to
    # "first" on TPU, so the exact mode must pin it off).
    "exact": {"TEXT2LOC_FUSED_SA": "off"},
    # The fused gather kernel with EXACT top_k selection (isolates the
    # kernel numerics from the selection approximation).
    "gather_exact": {"TEXT2LOC_FUSED_SA": "gather",
                     "TEXT2LOC_APPROX_NEIGHBORS": "0"},
    # Gather kernel + approx_max_k selection.
    "gather_approx": {"TEXT2LOC_FUSED_SA": "gather",
                      "TEXT2LOC_APPROX_NEIGHBORS": "1"},
    # Fully-fused kernel: in-kernel bisection selection + compaction gather.
    "fused_full": {"TEXT2LOC_FUSED_SA": "full"},
    # Per-level strategy: full at SA1/SA2, all-pairs at SA3 (probe_levels.py).
    "fused_mixed": {"TEXT2LOC_FUSED_SA": "full,full,all"},
    "fused_all": {"TEXT2LOC_FUSED_SA": "all"},
    # Fully-fused kernel with insertion-order (first <=K in-radius)
    # selection — the reference's own torch-cluster radius() semantics.
    "fused_first": {"TEXT2LOC_FUSED_SA": "first"},
    "fused_first_mixed": {"TEXT2LOC_FUSED_SA": "first,first,all"},
    "fused_exact": {"TEXT2LOC_FUSED_SA": "1"},
    "approx_knn": {"TEXT2LOC_FUSED_SA": "off",
                   "TEXT2LOC_APPROX_NEIGHBORS": "1"},
}
_MODE_VARS = sorted({k for env in MODES.values() for k in env})


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--modes", nargs="*", default=list(MODES),
                    choices=list(MODES))
    args = ap.parse_args(argv)
    # Agreement numbers are defined AGAINST THE EXACT BASELINE: always run
    # it first, whatever --modes asked for (without this, the first listed
    # mode silently became the baseline and was reported with
    # top1_agreement 1.0).
    modes = ["exact"] + [m for m in args.modes if m != "exact"]

    from text2loc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import numpy as np

    from text2loc_tpu.config import Config
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.evaluation.pipeline import run_pipeline

    backend = jax.default_backend()
    if backend in ("cpu", "gpu"):
        print(f"warning: backend={backend}; fused modes fall back to the "
              "exact path there (results only meaningful on TPU)",
              file=sys.stderr)

    cfg = Config().validate()
    cfg = cfg.replace(
        # Train in f32 (ModelConfig.train_dtype rationale; bf16 backward is
        # broken on this stack). Eval sweeps below run the bf16 model.
        model=dataclasses.replace(cfg.model, dtype="float32"),
        train=dataclasses.replace(cfg.train, learning_rate=args.lr),
        eval=dataclasses.replace(cfg.eval, top_k=(1, 3, 5, 10)),
    )
    m = cfg.model

    mk = lambda name, cells, poses, seed, pose_seed=None: make_scene(
        scene_name=name, num_cells=cells, num_poses=poses,
        object_slots=max(m.object_size, m.pad_size),
        num_points=m.pointnet.num_points,
        num_mentioned=m.num_mentioned, seed=seed, pose_seed=pose_seed,
    )
    train_data = MultiSceneArrays([mk("0000", 64, 512, 0)])
    # Held-out split: UNSEEN poses over the SAME trained map (random synthetic
    # scenes share no cross-scene structure, so an unseen-scene split would
    # pin recall at chance and mask kernel-mode deltas).
    val_data = MultiSceneArrays([mk("0000", 64, 256, 0, pose_seed=7)])

    for v in _MODE_VARS:
        os.environ.pop(v, None)
    os.environ["TEXT2LOC_FUSED_SA"] = "off"   # training/eval-in-train path
    t0 = time.perf_counter()
    coarse_model, coarse_state, embedder, closs = _train(
        cfg, train_data, "coarse", args.steps
    )
    fine_model, fine_state, _, floss = _train(cfg, train_data, "fine", args.steps)
    print(f"trained in {time.perf_counter() - t0:.0f}s "
          f"(coarse loss {closs:.3f}, fine loss {floss:.3f})",
          file=sys.stderr, flush=True)

    # Kernel-mode sweep runs the bf16 inference model (the serving config);
    # params are f32 regardless of compute dtype, so the trained states drop
    # straight into freshly-built bf16 towers.
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.cross_matcher import CrossMatch

    cfg = cfg.replace(model=dataclasses.replace(cfg.model, dtype="bfloat16"))
    coarse_model = CellRetrievalNetwork(cfg.model)
    fine_model = CrossMatch(cfg.model)
    results = {}
    base = None
    saved_env = {v: os.environ.get(v) for v in _MODE_VARS}
    for mode in modes:
        env = MODES[mode]
        for v in _MODE_VARS:
            os.environ.pop(v, None)
        os.environ.update(env)
        t0 = time.perf_counter()
        r = run_pipeline(val_data, coarse_state, coarse_model,
                         fine_state, fine_model, embedder, cfg, verbose=False)
        dt = time.perf_counter() - t0

        entry = {
            "coarse_recall": {k: r["coarse"][k][cfg.eval.threshs[0]]
                              for k in cfg.eval.top_k},
            "loc_recall_top1": {t: r["fine"][1][t] for t in cfg.eval.threshs},
            "fine_qps": round(r["fine_qps"], 1),
            "eval_seconds": round(dt, 1),
        }
        if base is None:
            base = r
            entry["top1_agreement"] = 1.0
            entry["mean_abs_dpos_m"] = 0.0
        else:
            agree = base["retrievals"][:, 0] == r["retrievals"][:, 0]
            entry["top1_agreement"] = float(agree.mean())
            same = base["retrievals"] == r["retrievals"]
            if same.any():
                d = np.linalg.norm(
                    (base["pos_in_cells"] - r["pos_in_cells"])[same], axis=-1
                )
                sizes = np.broadcast_to(
                    val_data.cell_size[r["retrievals"]], same.shape
                )[same]
                entry["mean_abs_dpos_m"] = float((d * sizes).mean())
            else:
                # None, not NaN: bare NaN makes the JSON report unreadable
                # for strict parsers.
                entry["mean_abs_dpos_m"] = None
        results[mode] = entry
        print(json.dumps({mode: entry}), flush=True)

    # Restore the caller's env pins (importable library entry point).
    for v, val in saved_env.items():
        if val is None:
            os.environ.pop(v, None)
        else:
            os.environ[v] = val
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    main()
