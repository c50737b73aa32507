#!/usr/bin/env python
"""On-chip A/B of the CCT layer-0 self-attention hoisting (cct_tail).

The cascade's first self-attention blocks are pure functions of one side
(cell objects / pose hints), so serving precomputes the object block per
gallery cell and the hint block once per query (CrossMatch.cct_obj_pre /
cct_hints_pre / cct_tail, tests/test_cct_factored.py). This probe measures
the production serve epoch (sentence-table text path, 256 poses x top-10)
full vs factored, interleaved min-of-groups, with the comparative accuracy
gate (factored bf16 must sit no farther from the f32 full oracle than full
bf16 does).

Run: python scripts/probe_cct_factored.py        (real chip)
"""
import dataclasses
import functools
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from text2loc_tpu import constants as C
from text2loc_tpu.config import Config, ModelConfig, TrainConfig
from text2loc_tpu.data.arrays import MultiSceneArrays
from text2loc_tpu.data.synthetic import make_scene
from text2loc_tpu.evaluation.retrieval import build_vocab_sentence_table
from text2loc_tpu.models.cross_matcher import CrossMatch
from text2loc_tpu.models.text_embedding import HintTextEmbedder
from text2loc_tpu.training import steps as steps_lib

NUM_POSES = 256
TOP_K = 10
ITERS = 3
GROUP = 20


def drain(x):
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def best_ms_once(fn, args):
    t0 = time.perf_counter()
    for _ in range(GROUP):
        out = fn(*args)
    drain(out)
    return (time.perf_counter() - t0) / GROUP * 1e3


def build(cfg, embedder, data, params, batch_stats, cell_idx, pose_idx):
    m = cfg.model
    model = CrossMatch(m)
    fwd = steps_lib.make_fine_split_forwards(model, embedder, cfg)
    rng = jax.random.PRNGKey(0)
    emb, mask = steps_lib.encode_fine_gallery(
        fwd, data, params, batch_stats, m.pad_size, rng, chunk=128
    )
    emb1, _ = steps_lib.encode_fine_gallery(
        fwd, data, params, batch_stats, m.pad_size, rng, chunk=128,
        obj_pre=True,
    )
    ftbl = build_vocab_sentence_table(
        model, embedder, params, batch_stats, model.encode_hints
    )
    ids = jax.device_put(jnp.asarray(C.hint_id(
        data.hint_dir[:NUM_POSES], data.hint_color[:NUM_POSES],
        data.hint_label[:NUM_POSES],
    )))
    sent = jnp.asarray(data.hint_mask[:NUM_POSES])
    emb_all = jax.device_put(jnp.asarray(emb)[cell_idx])
    emb1_all = jax.device_put(jnp.asarray(emb1)[cell_idx])
    mask_all = jax.device_put(jnp.asarray(mask)[cell_idx])
    pid = jax.device_put(pose_idx.astype(np.int32))

    @jax.jit
    def serve_full(params, batch_stats, ftbl, ids, emb_all, mask_all, pid):
        hints = jnp.take(ftbl, ids, axis=0)
        return fwd.cct(
            params, batch_stats, emb_all, mask_all,
            jnp.take(hints, pid, axis=0), jnp.take(sent, pid, axis=0),
        )

    @jax.jit
    def serve_fact(params, batch_stats, ftbl, ids, emb1_all, mask_all, pid):
        hints = jnp.take(ftbl, ids, axis=0)
        hints1 = fwd.hints_pre(params, batch_stats, hints, sent)
        return fwd.cct_tail(
            params, batch_stats, emb1_all, mask_all,
            jnp.take(hints, pid, axis=0), jnp.take(hints1, pid, axis=0),
            jnp.take(sent, pid, axis=0),
        )

    full_args = (params, batch_stats, ftbl, ids, emb_all, mask_all, pid)
    fact_args = (params, batch_stats, ftbl, ids, emb1_all, mask_all, pid)
    return serve_full, full_args, serve_fact, fact_args


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    cfg = Config(model=ModelConfig(), train=TrainConfig()).validate()
    m = cfg.model
    embedder = HintTextEmbedder.compositional(
        embed_dim=m.text_embed_dim, max_tokens=m.max_hint_tokens
    )
    scene = make_scene(
        "0000", num_cells=64, num_poses=NUM_POSES,
        object_slots=max(m.object_size, m.pad_size),
        num_points=m.pointnet.num_points, num_mentioned=m.num_mentioned,
        seed=0,
    )
    data = MultiSceneArrays([scene])
    rng = jax.random.PRNGKey(0)
    pose_idx = np.repeat(np.arange(NUM_POSES), TOP_K)
    cell_idx = np.asarray(
        (data.pose_cell_idx[pose_idx] + np.tile(np.arange(TOP_K), NUM_POSES))
        % data.num_cells, dtype=np.int64,
    )

    model = CrossMatch(m)
    chunk0 = jax.device_put(
        data.gather_fine(pose_idx[:128], m.pad_size, cell_indices=cell_idx[:128])
    )
    fb0 = steps_lib.prepare_fine_batch(chunk0, embedder, cfg, rng, train=False)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, fb0.objects, fb0.text
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    serve_full, full_args, serve_fact, fact_args = build(
        cfg, embedder, data, params, batch_stats, cell_idx, pose_idx
    )
    out_full = np.asarray(serve_full(*full_args), np.float32)
    out_fact = np.asarray(serve_fact(*fact_args), np.float32)

    # f32 oracle (full path, f32 body): the comparative standard — bf16
    # rounding dominates any path difference, so gate factored-vs-oracle
    # against full-vs-oracle rather than factored-vs-full directly.
    cfg32 = cfg.replace(model=dataclasses.replace(m, dtype="float32"))
    sf32, fa32, _, _ = build(
        cfg32, embedder, data, params, batch_stats, cell_idx, pose_idx
    )
    oracle = np.asarray(sf32(*fa32), np.float32)
    scale = np.abs(oracle).max()
    dev_full = np.abs(out_full - oracle).max() / scale
    dev_fact = np.abs(out_fact - oracle).max() / scale
    print(f"serve rel-to-peak vs f32 oracle: full-bf16 {dev_full:.2e} "
          f"factored-bf16 {dev_fact:.2e}", flush=True)
    assert dev_fact < max(3.0 * dev_full, 1e-3), (dev_fact, dev_full)

    results = {"full": 1e9, "factored": 1e9}
    for _ in range(ITERS):
        results["full"] = min(results["full"], best_ms_once(serve_full, full_args))
        results["factored"] = min(results["factored"],
                                  best_ms_once(serve_fact, fact_args))
    for name, ms in results.items():
        print(f"{name:9s} serve {ms:6.2f} ms ({NUM_POSES / ms * 1e3:,.0f} q/s)",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
