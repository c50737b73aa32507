"""Coarse retrieval training — the `training.coarse` entry point.

Rebuild of /root/reference/training/coarse.py:160-345 as a library function +
CLI. Differences by design (TPU-native):

* the per-batch Python loop body (encode both towers, loss, backward, step,
  empty_cache — reference :32-60) is ONE jitted XLA program including the
  on-device augmentations (flip/shuffle/point transforms);
* with a mesh, the same step runs data-parallel with global-batch InfoNCE
  (text2loc_tpu.parallel.train) — capability the reference lacks;
* eval_epoch (:63-157) is the on-device gallery matmul + top-k of
  text2loc_tpu.evaluation.retrieval;
* best-val checkpoints go through Orbax with full TrainState (true resume),
  keeping the reference's best-gating policy (:317-345).

CLI:
    python -m text2loc_tpu.training.coarse --base_path DATA [--workdir W] ...
    python -m text2loc_tpu.training.coarse --synthetic      # smoke run
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np

from text2loc_tpu.config import Config
from text2loc_tpu.data.arrays import MultiSceneArrays
from text2loc_tpu.data.prefetch import maybe_prefetch
from text2loc_tpu.evaluation.retrieval import eval_retrieval
from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
from text2loc_tpu.models.text_embedding import HintTextEmbedder
from text2loc_tpu.training import steps as steps_lib
from text2loc_tpu.utils.logging import MetricLogger
from text2loc_tpu.utils.profiling import StageTimer, block_on


def train_coarse(
    cfg: Config,
    data_train: MultiSceneArrays,
    data_val: Optional[MultiSceneArrays],
    embedder: HintTextEmbedder,
    workdir: Optional[str] = None,
    mesh=None,
    eval_every: int = 1,
    resume: bool = False,
    data_test: Optional[MultiSceneArrays] = None,
    pointnet_ckpt: Optional[str] = None,
    eval_train: bool = False,
) -> Tuple[steps_lib.TrainState, CellRetrievalNetwork, MetricLogger]:
    """Train the retrieval towers; returns (best-or-final state, model, log).

    `data_test`, when given, is evaluated once with the final best state (the
    reference evaluates test every epoch, coarse.py:283-287; a single final
    eval avoids leaking test signal into any decision).

    `eval_train`: also run per-epoch retrieval eval on the TRAIN split — the
    overfitting signal the reference logs every epoch (coarse.py:283-287).
    Off by default (it costs a full gallery+query encode per epoch).

    `pointnet_ckpt`: optional published PointNet .pth to graft into the
    object tower before training — the reference's default flow
    (args.py:51-54 --pointnet_path + object_encoder.py:47-50); combine with
    `cfg.model.pointnet.freeze` for the reference's --pointnet_freeze."""
    t = cfg.train
    # Train-time compute dtype (see ModelConfig.train_dtype): params stay
    # f32, so the returned state drives bf16 serving models unchanged.
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, dtype=cfg.model.train_dtype)
    )
    model = CellRetrievalNetwork(cfg.model)
    n_train = data_train.num_poses
    steps_per_epoch = max(n_train // t.batch_size, 1)
    optimizer = steps_lib.make_optimizer(cfg, steps_per_epoch)

    rng = jax.random.PRNGKey(t.seed)
    rng, init_rng = jax.random.split(rng)
    init_batch = data_train.gather_coarse(
        np.arange(t.batch_size) % n_train, cfg.model.object_size
    )
    objects, text = steps_lib.prepare_coarse_batch(
        init_batch, embedder, cfg, init_rng, train=False
    )
    state = steps_lib.init_train_state(model, optimizer, init_rng, objects, text)
    if pointnet_ckpt:
        from text2loc_tpu.models.torch_convert import load_pretrained_pointnet

        p, s = load_pretrained_pointnet(
            state.params, state.batch_stats, pointnet_ckpt
        )
        state = state._replace(params=p, batch_stats=s)
        print(f"grafted pretrained PointNet from {pointnet_ckpt}", flush=True)

    if mesh is not None:
        from text2loc_tpu.parallel.train import (
            make_dp_coarse_train_step,
            replicate_state,
        )
        from text2loc_tpu.parallel.mesh import shard_batch

        step_fn = make_dp_coarse_train_step(model, embedder, cfg, optimizer, mesh)
        state = replicate_state(state, mesh)
        put = lambda b: shard_batch(b, mesh)
    else:
        step_fn = jax.jit(
            steps_lib.make_coarse_train_step(model, embedder, cfg, optimizer),
            donate_argnums=(0,),
        )
        # Device-stage inputs: uploading inside the jitted call serializes the
        # host->device copy with the step (BENCHMARKS log #18 — the copy can
        # cost more than the step). The prefetcher below calls this off-thread.
        put = jax.device_put

    logger = MetricLogger(f"{workdir}/coarse_metrics.jsonl" if workdir else None)
    ckpt = None
    start_epoch = 0
    resumed_best = None
    if workdir is not None:
        from text2loc_tpu.utils.checkpoint import CheckpointManager

        ckpt = CheckpointManager(f"{workdir}/coarse_ckpt", mode="max")
        if resume and ckpt.latest_step() is not None:
            # True resume (params + opt_state + step); the reference restarts
            # optimization from weights only (coarse.py:256-258).
            start_epoch = int(ckpt.latest_step()) + 1
            state = ckpt.restore(state)
            # Restore the best-val gate too (CheckpointManager recovers the
            # saved metric): a post-resume eval must beat the
            # PRE-preemption best to checkpoint or to become best_state.
            resumed_best = ckpt.best_metric
            print(f"resumed from epoch {start_epoch - 1}", flush=True)

    timer = StageTimer()
    order_rng = np.random.default_rng(t.seed)
    close_rng = np.random.default_rng(t.seed + 7) if t.sample_close_cell else None
    # Triplet training draws one random non-matching gallery cell per sample
    # (working version of the reference's dead negative_cells branch,
    # training/coarse.py:47-50).
    neg_rng = (
        np.random.default_rng(t.seed + 13)
        if t.loss.ranking_loss == "triplet" else None
    )
    best_state = state
    best_val = -np.inf if resumed_best is None else float(resumed_best)
    if resumed_best is not None:
        # The restored state IS the pre-preemption best (saves are gated on
        # improvement, so latest == best).
        best_state = jax.device_get(state)
    # One pair of jitted eval encoders for every epoch + final test eval.
    eval_encoders = steps_lib.make_coarse_encoders(model, embedder, cfg)
    for epoch in range(start_epoch, t.epochs):
        perm = order_rng.permutation(n_train)[: steps_per_epoch * t.batch_size]
        losses = []

        def epoch_batches(perm=perm):
            # Runs on the prefetch worker thread, IN ORDER — the host RNG
            # streams (close/negative draws) advance exactly as in a serial
            # loop, so prefetched training is bitwise-identical
            # (tests/test_prefetch.py).
            for bstart in range(0, len(perm), t.batch_size):
                idx = perm[bstart : bstart + t.batch_size]
                yield data_train.gather_coarse(
                    idx, cfg.model.object_size, sample_close_rng=close_rng,
                    negative_rng=neg_rng,
                )

        with timer.stage("train_epoch"):
            for batch in maybe_prefetch(epoch_batches(), put=put):
                rng, srng = jax.random.split(rng)
                state, metrics = step_fn(state, batch, srng)
                losses.append(metrics["loss"])
        block_on(losses[-1] if losses else None)
        # One device->host transfer, not one ~30 ms relay round trip per step.
        mean_loss = float(jax.numpy.stack(losses).mean())

        row = {"loss": mean_loss}
        if eval_train and (epoch + 1) % eval_every == 0:
            with timer.stage("eval_train"):
                tr_acc, _, _ = eval_retrieval(
                    data_train, state, model, embedder, cfg,
                    encoders=eval_encoders,
                )
            row.update({f"train_recall@{k}": v for k, v in tr_acc.items()})
        if data_val is not None and (epoch + 1) % eval_every == 0:
            with timer.stage("eval_val"):
                acc, acc_close, _ = eval_retrieval(
                    data_val, state, model, embedder, cfg,
                    encoders=eval_encoders,
                )
            # Best gating: mean recall over the configured k values, the
            # reference's val top-k criterion (coarse.py:317-319).
            val_acc = float(np.mean(list(acc.values())))
            row.update({f"val_recall@{k}": v for k, v in acc.items()})
            row["val_acc"] = val_acc
            if val_acc > best_val:
                best_val = val_acc
                # Host copy: the train step donates its input state buffers,
                # so a live device reference would be invalidated next step.
                best_state = jax.device_get(state)
                if ckpt is not None:
                    ckpt.save(epoch, state, val_acc)
        logger.log(epoch, **row)

    print(timer.report(), flush=True)
    if not np.isfinite(best_val):
        best_state = jax.device_get(state)  # no val eval ran: return final
    if data_test is not None:
        acc, acc_close, _ = eval_retrieval(
            data_test, best_state, model, embedder, cfg,
            encoders=eval_encoders,
        )
        print(
            "test recall: "
            + "  ".join(f"R@{k}={v:0.4f}" for k, v in acc.items())
            + "  close: "
            + "  ".join(f"@{k}={v:0.4f}" for k, v in acc_close.items()),
            flush=True,
        )
    if workdir is not None:
        logger.plot(f"{workdir}/coarse_metrics.png")
        if ckpt is not None:
            ckpt.close()
    return best_state, model, logger


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base_path", default=None, help="KITTI360Pose pickle root")
    ap.add_argument("--array_cache", default=None, help="npz cache dir for ingest")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--learning_rate", type=float, default=None)
    ap.add_argument("--dp", type=int, default=0, help="data-parallel devices (0=off)")
    ap.add_argument("--synthetic", action="store_true", help="smoke-run on synthetic scenes")
    ap.add_argument("--debug_nans", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest checkpoint in --workdir")
    ap.add_argument("--eval_train", action="store_true",
                    help="also evaluate train-split recall every epoch "
                         "(reference coarse.py:283-287); expensive")
    ap.add_argument("--text_table", default=None,
                    help="frozen T5 table .npz (scripts/build_t5_table.py); "
                         "default: compositional stand-in")
    ap.add_argument("--pointnet_ckpt", default=None,
                    help="published PointNet .pth to graft before training "
                         "(reference --pointnet_path); combine with "
                         "cfg.model.pointnet.freeze for --pointnet_freeze")
    ap.add_argument("--body_dtype", default=None,
                    choices=("float32", "bfloat16"),
                    help="compute dtype of the ObjectEncoder/PointNet body "
                         "(the tail stays f32 — the full-bf16 backward "
                         "miscompiles on this stack, BENCHMARKS.md). "
                         "TPU default: bfloat16 for the COARSE trainer "
                         "(400-step full-size A/B: 1.2x/step, equal "
                         "recall) and float32 for the FINE trainer (bf16 "
                         "body measured slightly worse pose error for only "
                         "1.06x — scripts/probe_mixed_train.py --stage "
                         "fine). Pass a value to override either way")
    return ap


def _apply_overrides(cfg: Config, args,
                     tpu_default_body: Optional[str] = "bfloat16") -> Config:
    train = cfg.train
    for name in ("epochs", "batch_size", "learning_rate"):
        v = getattr(args, name)
        if v is not None:
            train = dataclasses.replace(train, **{name: v})
    cfg = cfg.replace(train=train)
    body = getattr(args, "body_dtype", None)
    if body is None and jax.default_backend() not in ("cpu", "gpu"):
        # TPU coarse-trainer default: mixed-precision body (bf16 body, f32
        # tail), validated by a 400-step full-size A/B (equal-or-better
        # recall at 1.2x/step — BENCHMARKS.md). The fine trainer passes
        # tpu_default_body=None: its A/B measured slightly WORSE pose error
        # for only 1.06x, so it stays f32 unless the user opts in.
        body = tpu_default_body
    if body:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, body_dtype=body)
        )
    return cfg


def _load_data(cfg: Config, args,
               tpu_default_body: Optional[str] = "bfloat16"):
    if args.synthetic:
        from text2loc_tpu.config import small_test_config
        from text2loc_tpu.data.synthetic import make_scene

        cfg = small_test_config()
        cfg = _apply_overrides(cfg, args, tpu_default_body=tpu_default_body)
        mk = lambda seed: MultiSceneArrays([
            make_scene(
                scene_name=f"{seed:04d}", num_cells=8, num_poses=32,
                object_slots=cfg.model.object_size,
                num_points=cfg.model.pointnet.num_points,
                num_mentioned=cfg.model.num_mentioned, seed=seed,
            )
        ])
        return cfg, mk(0), mk(1), mk(2)
    assert args.base_path, "--base_path or --synthetic required"
    from text2loc_tpu.data.ingest import load_dataset

    data_train = load_dataset(args.base_path, "train", out_dir=args.array_cache)
    data_val = load_dataset(args.base_path, "val", out_dir=args.array_cache)
    data_test = load_dataset(args.base_path, "test", out_dir=args.array_cache)
    return cfg, data_train, data_val, data_test


def main(argv=None):
    from text2loc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    args = build_argparser().parse_args(argv)
    cfg = Config().validate()
    cfg = _apply_overrides(cfg, args)
    if args.debug_nans:
        from text2loc_tpu.utils.debug import enable_nan_debugging

        enable_nan_debugging()
    cfg, data_train, data_val, data_test = _load_data(cfg, args)
    from text2loc_tpu.models.text_embedding import make_embedder

    cfg, embedder = make_embedder(cfg, args.text_table)
    mesh = None
    if args.dp:
        from text2loc_tpu.parallel import make_mesh

        mesh = make_mesh(args.dp)
    train_coarse(
        cfg, data_train, data_val, embedder,
        workdir=args.workdir, mesh=mesh, resume=args.resume,
        data_test=data_test, pointnet_ckpt=args.pointnet_ckpt,
        eval_train=args.eval_train,
    )


if __name__ == "__main__":
    main()
