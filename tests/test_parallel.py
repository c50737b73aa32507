"""Multi-chip paths on the virtual 8-device CPU mesh (SURVEY.md section 4c).

Validates:
* sharded-gallery top-k == dense single-chip top-k (score-exact);
* the DP coarse train step runs on a mesh and produces the SAME loss as the
  single-chip step on the same batch (global-batch InfoNCE + synced BN under
  GSPMD are bitwise-equivalent reductions, modulo float reassociation).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2loc_tpu.parallel import make_mesh, shard_batch
from text2loc_tpu.parallel.retrieval import sharded_topk_retrieval
from text2loc_tpu.parallel.train import make_dp_coarse_train_step, replicate_state
from text2loc_tpu.training import steps as steps_lib


def test_sharded_topk_matches_dense(monkeypatch):
    from text2loc_tpu.evaluation.retrieval import topk_retrieval

    # The dense reference must be the EXACT selection this test's contract
    # (and parallel/retrieval.py's docstring) assume, knob or no knob.
    monkeypatch.delenv("TEXT2LOC_APPROX_TOPK", raising=False)
    rng = np.random.default_rng(0)
    cells = rng.standard_normal((37, 16)).astype(np.float32)
    cells /= np.linalg.norm(cells, axis=1, keepdims=True)
    texts = rng.standard_normal((5, 16)).astype(np.float32)
    texts /= np.linalg.norm(texts, axis=1, keepdims=True)

    k = 4
    dense_s, dense_i = topk_retrieval(jnp.asarray(cells), jnp.asarray(texts), k)
    mesh = make_mesh(8)
    shard_s, shard_i = sharded_topk_retrieval(cells, texts, k, mesh)

    np.testing.assert_allclose(
        np.asarray(shard_s), np.asarray(dense_s), rtol=1e-5, atol=1e-6
    )
    # Indices can differ only where scores tie exactly.
    same = np.asarray(shard_i) == np.asarray(dense_i)
    ties = np.isclose(np.asarray(shard_s), np.asarray(dense_s), atol=1e-6)
    assert np.all(same | ties)


def test_approx_topk_knob(monkeypatch):
    """TEXT2LOC_APPROX_TOPK=1 routes topk_retrieval through approx_max_k
    (measured on-chip in BENCHMARKS log #21; exact selection stays the
    default). The env is read per call (static jit key), so flipping it
    without rebuilding callers' closures only works for direct calls like
    this one — jit-embedding callers must rebuild (CLAUDE.md)."""
    from text2loc_tpu.evaluation.retrieval import topk_retrieval

    rng = np.random.default_rng(1)
    cells = rng.standard_normal((128, 16)).astype(np.float32)
    cells /= np.linalg.norm(cells, axis=1, keepdims=True)
    texts = rng.standard_normal((9, 16)).astype(np.float32)
    texts /= np.linalg.norm(texts, axis=1, keepdims=True)

    k = 5
    # Pin the baseline to exact even if the knob leaked in from the caller's
    # environment (otherwise this A/B compares approx with itself).
    monkeypatch.delenv("TEXT2LOC_APPROX_TOPK", raising=False)
    ex_s, ex_i = topk_retrieval(jnp.asarray(cells), jnp.asarray(texts), k)
    monkeypatch.setenv("TEXT2LOC_APPROX_TOPK", "1")
    ap_s, ap_i = topk_retrieval(jnp.asarray(cells), jnp.asarray(texts), k)
    assert ap_s.shape == (9, k) and ap_i.shape == (9, k)
    # Scores descend, and the top-1 (the exact max — no approximation can
    # rank below a larger score on the CPU fallback) agrees with exact.
    assert np.all(np.diff(np.asarray(ap_s), axis=1) <= 1e-6)
    np.testing.assert_array_equal(
        np.asarray(ap_i[:, 0]), np.asarray(ex_i[:, 0])
    )


def test_merge_shard_topk_payloads():
    """The shared per-shard top-k + candidate merge helpers directly: 2-D
    (ids) and 3-D (positions) payloads ride along and land at the slots the
    dense argsort would pick."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from text2loc_tpu.parallel.retrieval import (
        merge_shard_topk,
        shard_local_topk,
    )

    rng = np.random.default_rng(3)
    n, q, d, k, c = 8, 3, 16, 4, 40  # c divisible by n
    cells = rng.standard_normal((c, d)).astype(np.float32)
    texts = rng.standard_normal((q, d)).astype(np.float32)
    pos = rng.standard_normal((c, 2)).astype(np.float32)  # per-cell payload

    mesh = make_mesh(n)

    def run(cells_sh, texts_r, pos_sh):
        s_loc, i_loc, g_loc = shard_local_topk(cells_sh, texts_r, k, c, "dp")
        w_loc = pos_sh[i_loc]  # local per-candidate payload [Q, kl, 2]
        return merge_shard_topk(s_loc, (g_loc, w_loc), k, n, "dp")

    fn = shard_map(run, mesh=mesh, in_specs=(P("dp"), P(), P("dp")),
                   out_specs=(P(), (P(), P())), check_vma=False)
    s_top, (g_top, w_top) = jax.jit(fn)(cells, texts, pos)

    scores = texts @ cells.T
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    np.testing.assert_allclose(
        np.asarray(s_top), np.take_along_axis(scores, order, 1), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(g_top), order)
    np.testing.assert_allclose(np.asarray(w_top), pos[order], atol=1e-6)


def test_dp_coarse_step_matches_single_chip(small_cfg, small_embedder, small_data):
    n_dev = 8
    cfg = small_cfg.replace(
        train=dataclasses.replace(small_cfg.train, batch_size=n_dev * 2)
    )
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork

    model = CellRetrievalNetwork(cfg.model)
    optimizer = steps_lib.make_optimizer(cfg, steps_per_epoch=1)

    rng = jax.random.PRNGKey(1)
    batch = small_data.gather_coarse(
        np.arange(cfg.train.batch_size) % small_data.num_poses,
        cfg.model.object_size,
    )
    objects, text = steps_lib.prepare_coarse_batch(
        batch, small_embedder, cfg, rng, train=False
    )
    state = steps_lib.init_train_state(model, optimizer, rng, objects, text)

    # Single-chip step first (DP step donates its state).
    single_step = jax.jit(
        steps_lib.make_coarse_train_step(model, small_embedder, cfg, optimizer)
    )
    _, single_metrics = single_step(state, batch, rng)
    single_loss = float(single_metrics["loss"])

    mesh = make_mesh(n_dev)
    dp_step = make_dp_coarse_train_step(model, small_embedder, cfg, optimizer, mesh)
    dp_state = replicate_state(state, mesh)
    sharded = shard_batch(batch, mesh)
    new_state, metrics = dp_step(dp_state, sharded, rng)
    dp_loss = float(metrics["loss"])

    assert np.isfinite(dp_loss)
    assert abs(dp_loss - single_loss) < 1e-4, (dp_loss, single_loss)
    # Params actually moved.
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_dp_coarse_step_with_fused_sa_island(
    small_cfg, small_embedder, small_data, monkeypatch
):
    """TEXT2LOC_FUSED_SA_TRAIN_DP=1: the DP step runs the fused training SA
    kernel as a shard_map island (BN stats psum'd over the dp axis) inside
    the GSPMD-jitted program. Loss must match the single-chip FUSED step on
    the same batch ("interpret" forces the kernels on the CPU backend).

    Runs in a SUBPROCESS with the persistent compilation cache DISABLED:
    reloading this serialized program from the cache aborts the interpreter
    (flaky, roughly 3-of-5 warm-cache runs in the round-4 measurement) —
    the poisoned-CPU-AOT-cache issue, see conftest.run_cacheless_child."""
    from conftest import run_cacheless_child

    if not run_cacheless_child(__file__, "fused_sa_island"):
        return

    monkeypatch.setenv("TEXT2LOC_FUSED_SA_TRAIN", "interpret")
    monkeypatch.setenv("TEXT2LOC_FUSED_SA_TRAIN_DP", "1")
    _run_fused_island_body(small_cfg, small_embedder, small_data)


def _run_fused_island_body(small_cfg, small_embedder, small_data):

    n_dev = 8
    cfg = small_cfg.replace(
        train=dataclasses.replace(small_cfg.train, batch_size=n_dev * 2)
    )
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork

    model = CellRetrievalNetwork(cfg.model)
    optimizer = steps_lib.make_optimizer(cfg, steps_per_epoch=1)

    rng = jax.random.PRNGKey(1)
    batch = small_data.gather_coarse(
        np.arange(cfg.train.batch_size) % small_data.num_poses,
        cfg.model.object_size,
    )
    objects, text = steps_lib.prepare_coarse_batch(
        batch, small_embedder, cfg, rng, train=False
    )
    state = steps_lib.init_train_state(model, optimizer, rng, objects, text)

    single_step = jax.jit(
        steps_lib.make_coarse_train_step(model, small_embedder, cfg, optimizer)
    )
    _, single_metrics = single_step(state, batch, rng)
    single_loss = float(single_metrics["loss"])

    mesh = make_mesh(n_dev)
    dp_step = make_dp_coarse_train_step(model, small_embedder, cfg, optimizer, mesh)
    dp_state = replicate_state(state, mesh)
    sharded = shard_batch(batch, mesh)
    new_state, metrics = dp_step(dp_state, sharded, rng)
    dp_loss = float(metrics["loss"])

    assert np.isfinite(dp_loss)
    assert abs(dp_loss - single_loss) < 1e-4, (dp_loss, single_loss)
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_shard_batch_multihost_single_process(small_data, small_cfg):
    from text2loc_tpu.parallel.mesh import shard_batch_multihost

    mesh = make_mesh(8)
    batch = small_data.gather_coarse(np.arange(8), small_cfg.model.object_size)
    global_batch = shard_batch_multihost(batch, mesh)
    np.testing.assert_array_equal(
        np.asarray(global_batch["hint_dir"]), batch["hint_dir"]
    )
    assert global_batch["xyz"].sharding.spec == jax.sharding.PartitionSpec("dp")


def test_eval_retrieval_with_mesh(small_cfg, small_embedder, small_data):
    """eval_retrieval routed through the sharded gallery matches dense."""
    from text2loc_tpu.evaluation.retrieval import eval_retrieval
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork

    cfg = small_cfg
    model = CellRetrievalNetwork(cfg.model)
    optimizer = steps_lib.make_optimizer(cfg, 1)
    rng = jax.random.PRNGKey(0)
    batch = small_data.gather_coarse(np.arange(4), cfg.model.object_size)
    objects, text = steps_lib.prepare_coarse_batch(
        batch, small_embedder, cfg, rng, train=False
    )
    state = steps_lib.init_train_state(model, optimizer, rng, objects, text)

    acc_d, close_d, idx_d = eval_retrieval(
        small_data, state, model, small_embedder, cfg
    )
    mesh = make_mesh(8)
    acc_s, close_s, idx_s = eval_retrieval(
        small_data, state, model, small_embedder, cfg, mesh=mesh
    )
    assert acc_d == acc_s and close_d == close_s
    np.testing.assert_array_equal(idx_d, idx_s)


def test_dp_fine_step_matches_single_chip(small_cfg, small_embedder, small_data):
    from text2loc_tpu.models.cross_matcher import CrossMatch
    from text2loc_tpu.parallel.train import make_dp_fine_train_step
    from text2loc_tpu.parallel.train import replicate_state as repl_state

    n_dev = 4
    cfg = small_cfg.replace(
        train=dataclasses.replace(small_cfg.train, batch_size=n_dev * 2)
    )
    model = CrossMatch(cfg.model)
    optimizer = steps_lib.make_optimizer(cfg, 1)
    rng = jax.random.PRNGKey(2)
    batch = small_data.gather_fine(
        np.arange(cfg.train.batch_size) % small_data.num_poses, cfg.model.pad_size
    )
    fb = steps_lib.prepare_fine_batch(batch, small_embedder, cfg, rng, train=False)
    state = steps_lib.init_train_state(model, optimizer, rng, fb.objects, fb.text)

    single = jax.jit(
        steps_lib.make_fine_train_step(model, small_embedder, cfg, optimizer)
    )
    _, m1 = single(state, batch, rng)

    mesh = make_mesh(n_dev)
    dp = make_dp_fine_train_step(model, small_embedder, cfg, optimizer, mesh)
    _, m2 = dp(repl_state(state, mesh), shard_batch(batch, mesh), rng)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
    assert abs(float(m1["pose_error"]) - float(m2["pose_error"])) < 1e-4
