"""Data-parallel train steps over a device mesh.

The TPU-native equivalent of DDP+NCCL that the reference never had
(SURVEY.md section 2.6). Strategy: GSPMD, not hand-written collectives —

* params / opt_state replicated, batch sharded over the `dp` axis;
* the whole single-chip step function is jitted with those shardings;
* the InfoNCE similarity matrix [B_global, B_global] forces XLA to all-gather
  both towers' [B_local, D] embeddings over ICI — a few hundred KB — instead
  of any per-chip gradient ring; gradients of replicated params come out of
  the backward pass already psum'd by GSPMD.
* MaskedBatchNorm statistics are jnp reductions over the sharded batch axis,
  which under GSPMD are global — cross-replica-synced BN for free (the
  reference's BatchNorm1d sees the whole single-GPU batch; this keeps the same
  statistics at any mesh size).

This file deliberately contains no model math: it reuses the single-chip step
factories from text2loc_tpu.training.steps and only binds shardings.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from text2loc_tpu.config import Config
from text2loc_tpu.models import pointnet2
from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
from text2loc_tpu.models.cross_matcher import CrossMatch
from text2loc_tpu.models.text_embedding import HintTextEmbedder
from text2loc_tpu.training import steps as steps_lib
from text2loc_tpu.training.steps import TrainState


def _bind(step: Callable, mesh: Mesh, axis_name: str) -> Callable:
    """Jit a (state, batch, rng) -> (state, metrics) step with DP shardings."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    # Replicated state, sharded batch dict, replicated rng.
    jitted = jax.jit(
        step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )

    import os

    # The fused TRAINING SA kernel (a Mosaic custom call) cannot be
    # auto-partitioned by GSPMD, so DP steps either fall back to the XLA SA
    # path or run the kernel as a shard_map ISLAND inside the jitted step
    # (object batch sharded over the dp axis, BN statistics psum'd —
    # global-batch semantics identical to GSPMD; equality tested on the
    # virtual CPU mesh in tests/test_parallel.py and in dryrun_multichip).
    #
    # DEFAULT: the island. Real-chip A/B on a 1-device mesh
    # (scripts/probe_dp_island.py, BENCHMARKS.md log #15): island vs XLA-DP
    # is coarse 81.8 vs 115.1 ms/step, fine 50.8 vs 72.0 (-29% both) — the
    # island recovers the single-chip fused-auto speed, so a multi-chip
    # user no longer pays the XLA path by default. Only the 1-device mesh
    # is measurable on this hardware; the island's cross-chip additions are
    # the tiny [8, H] BN-stat psums over ICI. TEXT2LOC_FUSED_SA_TRAIN_DP=0
    # restores the XLA fallback. The island only changes the program where
    # the fused TRAIN kernel is active at all (TPU f32 bodies, or
    # "interpret"-mode tests) — elsewhere the context is inert.
    #
    # Read ONCE at bind time: the context managers only matter during
    # tracing, and `jitted` caches its first trace — re-reading the env per
    # call would LOOK like a live knob while silently reusing the first
    # call's program (the stale-trace footgun CLAUDE.md documents for
    # env-knob A/Bs). Rebuild the step to change modes.
    fused_dp = os.environ.get("TEXT2LOC_FUSED_SA_TRAIN_DP", "1") != "0"

    def run(state, batch, rng):
        if fused_dp:
            with pointnet2.fused_train_mesh(mesh, axis_name):
                return jitted(state, batch, rng)
        with pointnet2.suppress_fused_train():
            return jitted(state, batch, rng)

    return run


def make_dp_coarse_train_step(
    model: CellRetrievalNetwork,
    embedder: HintTextEmbedder,
    cfg: Config,
    optimizer,
    mesh: Mesh,
    axis_name: str = "dp",
) -> Callable:
    """DP version of the coarse contrastive train step.

    Call with `state` replicated (see `replicate_state`) and `batch` sharded
    via `mesh.shard_batch`. Global-batch InfoNCE (the working equivalent of the
    reference's dead NT_Xent/GatherLayer, losses.py:358-402) holds because the
    similarity matrix spans the full sharded batch.
    """
    step = steps_lib.make_coarse_train_step(
        model, embedder, cfg, optimizer, n_shards=mesh.shape[axis_name]
    )
    return _bind(step, mesh, axis_name)


def make_dp_fine_train_step(
    model: CrossMatch,
    embedder: HintTextEmbedder,
    cfg: Config,
    optimizer,
    mesh: Mesh,
    axis_name: str = "dp",
) -> Callable:
    """DP version of the fine offset-regression train step (pure DP: the MSE
    loss is a mean over the sharded batch, psum'd by GSPMD)."""
    step = steps_lib.make_fine_train_step(
        model, embedder, cfg, optimizer, n_shards=mesh.shape[axis_name]
    )
    return _bind(step, mesh, axis_name)


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Device-put the train state fully replicated over the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)
