"""Fine position-regressor training — the `training.fine` entry point.

Rebuild of /root/reference/training/fine.py:133-290:

* loss = offset_lambda (=5) x MSE(pred, target) (:65-68, 220) — inside the
  jitted step (training/steps.py);
* 3-epoch warm-up at lr=1e-5 before the real optimizer/scheduler (:222-235) —
  expressed as one optax.join_schedules schedule, so the optimizer state never
  has to be rebuilt mid-training;
* Prototype-based Map Cloning: the reference re-derives candidate validity and
  hint re-matching inside __getitem__ (poses.py:403-516); here the tables are
  precomputed (text2loc_tpu.data.pmc) and the per-batch draw is a cheap
  host-side categorical + integer gather;
* best-val gating by mean pose offset error (:266-267), Orbax checkpoints.

CLI:
    python -m text2loc_tpu.training.fine --base_path DATA [--workdir W] ...
    python -m text2loc_tpu.training.fine --synthetic
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np
import optax

from text2loc_tpu.config import Config
from text2loc_tpu.data.arrays import MultiSceneArrays
from text2loc_tpu.data.pmc import sample_pmc
from text2loc_tpu.data.prefetch import maybe_prefetch
from text2loc_tpu.models.cross_matcher import CrossMatch
from text2loc_tpu.models.text_embedding import HintTextEmbedder
from text2loc_tpu.training import steps as steps_lib
from text2loc_tpu.utils.logging import MetricLogger
from text2loc_tpu.utils.profiling import StageTimer, block_on


def make_fine_optimizer(cfg: Config, steps_per_epoch: int):
    """Warm-up then the configured schedule (reference fine.py:222-235)."""
    t = cfg.train
    main = steps_lib.make_lr_schedule(cfg, steps_per_epoch)
    warm_steps = t.warmup_epochs * steps_per_epoch
    if warm_steps <= 0:
        return optax.adam(main)
    sched = optax.join_schedules(
        [optax.constant_schedule(t.warmup_lr), main], [warm_steps]
    )
    return optax.adam(sched)


def eval_fine(
    data: MultiSceneArrays,
    state: steps_lib.TrainState,
    model: CrossMatch,
    embedder: HintTextEmbedder,
    cfg: Config,
    batch_size: int = 64,
    forward=None,
) -> float:
    """Mean pose-offset error on a split (reference fine.py:103-130):
    each pose against its gt best cell, L2 in normalized cell units.

    Pass a prebuilt `forward` (make_fine_forward) when calling in a loop:
    each fresh build is a new jit wrapper whose first call retraces and
    recompiles — minutes per epoch over the remote-compile tunnel."""
    if forward is None:
        forward = steps_lib.make_fine_forward(model, embedder, cfg)
    rng = jax.random.PRNGKey(0)
    n = data.num_poses
    errs = []
    for s in range(0, n, batch_size):
        idx = np.arange(s, min(s + batch_size, n))
        full = np.resize(idx, batch_size)
        batch = data.gather_fine(full, cfg.model.pad_size)
        pred = np.asarray(forward(state.params, state.batch_stats, batch, rng))
        gt = batch["target"]
        errs.extend(np.linalg.norm(pred - gt, axis=-1)[: len(idx)])
    return float(np.mean(errs))


def train_fine(
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
) -> Tuple[steps_lib.TrainState, CrossMatch, MetricLogger]:
    t = cfg.train
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, dtype=cfg.model.train_dtype)
    )
    model = CrossMatch(cfg.model)
    n_train = data_train.num_poses
    steps_per_epoch = max(n_train // t.batch_size, 1)
    optimizer = make_fine_optimizer(cfg, steps_per_epoch)

    rng = jax.random.PRNGKey(t.seed)
    rng, init_rng = jax.random.split(rng)
    init_batch = data_train.gather_fine(
        np.arange(t.batch_size) % n_train, cfg.model.pad_size
    )
    fb = steps_lib.prepare_fine_batch(init_batch, embedder, cfg, init_rng, train=False)
    state = steps_lib.init_train_state(model, optimizer, init_rng, fb.objects, fb.text)
    if pointnet_ckpt:
        # Reference flow: object_encoder.py:47-50 loads the published
        # PointNet into BOTH towers' encoders before training.
        from text2loc_tpu.models.torch_convert import load_pretrained_pointnet

        p, s = load_pretrained_pointnet(
            state.params, state.batch_stats, pointnet_ckpt
        )
        state = state._replace(params=p, batch_stats=s)
        print(f"grafted pretrained PointNet from {pointnet_ckpt}", flush=True)

    if mesh is not None:
        from text2loc_tpu.parallel.mesh import shard_batch
        from text2loc_tpu.parallel.train import (
            make_dp_fine_train_step,
            replicate_state,
        )

        step_fn = make_dp_fine_train_step(model, embedder, cfg, optimizer, mesh)
        state = replicate_state(state, mesh)
        put = lambda b: shard_batch(b, mesh)
    else:
        step_fn = jax.jit(
            steps_lib.make_fine_train_step(model, embedder, cfg, optimizer),
            donate_argnums=(0,),
        )
        # Device-stage inputs off-thread (see training/coarse.py + log #18).
        put = jax.device_put

    logger = MetricLogger(f"{workdir}/fine_metrics.jsonl" if workdir else None)
    ckpt = None
    start_epoch = 0
    resumed_best = None
    if workdir is not None:
        from text2loc_tpu.utils.checkpoint import CheckpointManager

        ckpt = CheckpointManager(f"{workdir}/fine_ckpt", mode="min")
        if resume and ckpt.latest_step() is not None:
            start_epoch = int(ckpt.latest_step()) + 1
            state = ckpt.restore(state)
            # Restore the best-val gate (see training/coarse.py): the first
            # post-resume eval must beat the pre-preemption best pose error.
            resumed_best = ckpt.best_metric
            print(f"resumed from epoch {start_epoch - 1}", flush=True)

    timer = StageTimer()
    order_rng = np.random.default_rng(t.seed + 1)
    best_state = state
    best_val = np.inf if resumed_best is None else float(resumed_best)
    if resumed_best is not None:
        best_state = jax.device_get(state)  # latest == best (gated saves)
    # One jitted eval forward for every epoch eval + the final test eval.
    eval_forward = steps_lib.make_fine_forward(model, embedder, cfg)
    for epoch in range(start_epoch, t.epochs):
        perm = order_rng.permutation(n_train)[: steps_per_epoch * t.batch_size]
        losses, errors = [], []

        def epoch_batches(perm=perm):
            # Prefetch-worker generator; order_rng's PMC draws advance in
            # serial-loop order (single worker — see data/prefetch.py). The
            # epoch's perm was already drawn above, and the next epoch's perm
            # is not drawn until this generator is fully consumed.
            for bstart in range(0, len(perm), t.batch_size):
                idx = perm[bstart : bstart + t.batch_size]
                # PMC draw (no-op when tables are absent or pmc_prob == 0).
                cell_idx, hint_obj = sample_pmc(
                    data_train, idx, order_rng, t.pmc_prob
                )
                yield data_train.gather_fine(
                    idx, cfg.model.pad_size,
                    cell_indices=cell_idx, hint_obj_idx=hint_obj,
                )

        with timer.stage("train_epoch"):
            for batch in maybe_prefetch(epoch_batches(), put=put):
                rng, srng = jax.random.split(rng)
                state, metrics = step_fn(state, batch, srng)
                losses.append(metrics["loss"])
                errors.append(metrics["pose_error"])
        block_on(losses[-1] if losses else None)
        # One device->host transfer per epoch: per-scalar float() readbacks
        # pay the ~30 ms relay round trip EACH (~10 s/epoch at 350 steps).
        row = {
            "loss": float(jax.numpy.stack(losses).mean()),
            "pose_error": float(jax.numpy.stack(errors).mean()),
        }

        if data_val is not None and (epoch + 1) % eval_every == 0:
            with timer.stage("eval_val"):
                val_err = eval_fine(data_val, state, model, embedder, cfg,
                                    forward=eval_forward)
            row["val_pose_error"] = val_err
            if val_err < best_val:
                best_val = val_err
                best_state = jax.device_get(state)  # donation-safe copy
                if ckpt is not None:
                    ckpt.save(epoch, state, val_err)
        logger.log(epoch, **row)

    print(timer.report(), flush=True)
    if not np.isfinite(best_val):
        best_state = jax.device_get(state)
    if data_test is not None:
        test_err = eval_fine(data_test, best_state, model, embedder, cfg,
                             forward=eval_forward)
        print(f"test pose_error: {test_err:0.4f}", flush=True)
    if workdir is not None:
        logger.plot(f"{workdir}/fine_metrics.png")
        if ckpt is not None:
            ckpt.close()
    return best_state, model, logger


def main(argv=None):
    from text2loc_tpu.training.coarse import (
        _apply_overrides,
        _load_data,
        build_argparser,
    )

    from text2loc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = build_argparser()
    ap.add_argument("--pmc_prob", type=float, default=None)
    ap.add_argument("--fine_flip_poses", choices=("on", "off"), default=None,
                    help="pose-flip augmentation for the fine stage. Default "
                         "on: a 400-step on-chip A/B measured better "
                         "held-out pose error with flips (BENCHMARKS.md). "
                         "'off' reproduces the exact reference recipe "
                         "(fine.py:168 flip_pose=False)")
    args = ap.parse_args(argv)
    cfg = Config().validate()
    # Fine keeps an f32 body by default: the mixed-body A/B measured
    # slightly worse pose error for only 1.06x/step (BENCHMARKS.md).
    cfg = _apply_overrides(cfg, args, tpu_default_body=None)
    if args.debug_nans:
        from text2loc_tpu.utils.debug import enable_nan_debugging

        enable_nan_debugging()
    cfg, data_train, data_val, data_test = _load_data(
        cfg, args, tpu_default_body=None
    )
    # Fine-specific overrides AFTER _load_data: the --synthetic branch
    # rebuilds cfg from small_test_config (+ the shared overrides only), so
    # applying these earlier would silently discard them on smoke runs.
    import dataclasses

    if args.pmc_prob is not None:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, pmc_prob=args.pmc_prob))
    if args.fine_flip_poses is not None:
        cfg = cfg.replace(
            train=dataclasses.replace(
                cfg.train, fine_flip_poses=args.fine_flip_poses == "on"
            )
        )
    from text2loc_tpu.models.text_embedding import make_embedder

    cfg, embedder = make_embedder(cfg, args.text_table)
    mesh = None
    if args.dp:
        from text2loc_tpu.parallel import make_mesh

        mesh = make_mesh(args.dp)
    train_fine(
        cfg, data_train, data_val, embedder,
        workdir=args.workdir, mesh=mesh, resume=args.resume,
        data_test=data_test, pointnet_ckpt=args.pointnet_ckpt,
    )


if __name__ == "__main__":
    main()
