#!/usr/bin/env python
"""On-chip A/B of the fused attention-block Pallas kernel (ops/pallas_mha).

Measures the production CCT (Q*K = 2560 rows of [16 obj] x [6 hints] paired
decoder cascade) and the full serve program with TEXT2LOC_FUSED_ATTN off/on
across sample-fold tile sizes, interleaved min-of-groups (the relay shows
5-7%% process-to-process drift; see CLAUDE.md). Also asserts fused == stock
outputs on chip at bf16 tolerance.

Run: python scripts/probe_fused_attn.py        (real chip)
"""
import functools
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from text2loc_tpu.config import Config, ModelConfig, TrainConfig
from text2loc_tpu.data.arrays import MultiSceneArrays
from text2loc_tpu.data.synthetic import make_scene
from text2loc_tpu.models.cross_matcher import CrossMatch
from text2loc_tpu.models.text_embedding import HintTextEmbedder
from text2loc_tpu.training import steps as steps_lib

NUM_POSES = 256
TOP_K = 10
ITERS = 3
GROUP = 20


def drain(x):
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    cfg = Config(model=ModelConfig(), train=TrainConfig()).validate()
    m = cfg.model
    model = CrossMatch(m)
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

    chunk0 = jax.device_put(
        data.gather_fine(pose_idx[:128], m.pad_size, cell_indices=cell_idx[:128])
    )
    fb0 = steps_lib.prepare_fine_batch(chunk0, embedder, cfg, rng, train=False)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, fb0.objects, fb0.text
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    fwd = steps_lib.make_fine_split_forwards(model, embedder, cfg)

    cell_emb, cell_mask = steps_lib.encode_fine_gallery(
        fwd, data, params, batch_stats, m.pad_size, rng, chunk=128
    )
    text_all = jax.device_put({
        "hint_dir": data.hint_dir[:NUM_POSES],
        "hint_color": data.hint_color[:NUM_POSES],
        "hint_label": data.hint_label[:NUM_POSES],
        "sentence_mask": data.hint_mask[:NUM_POSES],
    })
    sent_all = jnp.asarray(data.hint_mask[:NUM_POSES])
    emb_all = jax.device_put(cell_emb[cell_idx])
    mask_all = jax.device_put(cell_mask[cell_idx])
    pid_all = jax.device_put(pose_idx.astype(np.int32))

    hints_all = jax.jit(lambda p, s, t: fwd.encode_text(p, s, t))(
        params, batch_stats, text_all
    )
    hints_rep = jax.device_put(jnp.take(hints_all, pid_all, axis=0))
    sent_rep = jax.device_put(jnp.take(sent_all, pid_all, axis=0))

    def build_fns():
        # Fresh split-forwards per env setting: the gates are read at trace
        # time, and make_fine_split_forwards returns ALREADY-jitted fns
        # whose first trace would otherwise be reused across variants.
        f = steps_lib.make_fine_split_forwards(model, embedder, cfg)

        @jax.jit
        def serve_epoch(params, batch_stats, text_all, emb_all, mask_all,
                        pid_all):
            hints_all = f.encode_text(params, batch_stats, text_all)
            return f.cct(
                params, batch_stats, emb_all, mask_all,
                jnp.take(hints_all, pid_all, axis=0),
                jnp.take(sent_all, pid_all, axis=0),
            )
        return f.cct, serve_epoch

    cct_args = (params, batch_stats, emb_all, mask_all, hints_rep, sent_rep)
    serve_args = (params, batch_stats, text_all, emb_all, mask_all, pid_all)

    variants = [("off", {"TEXT2LOC_FUSED_ATTN": "0"})]
    for rows in (128, 256, 512):
        variants.append((f"rows={rows}", {"TEXT2LOC_FUSED_ATTN": "1",
                                          "TEXT2LOC_FUSED_ATTN_ROWS": str(rows)}))
    # "all" additionally fuses the E=1024 intra stack inside encode_text —
    # only the full-trunk serve number can move (the cct is fused at 256
    # rows in both).
    for rows in (256, 512):
        variants.append((f"all-{rows}", {"TEXT2LOC_FUSED_ATTN": "all",
                                         "TEXT2LOC_FUSED_ATTN_ROWS": str(rows)}))

    def leaf0(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0], np.float32)

    fns = {}
    outs = {}
    outs_serve = {}
    for name, env in variants:
        os.environ.update(env)
        fns[name] = build_fns()
        outs[name] = np.asarray(fns[name][0](*cct_args), np.float32)
        outs_serve[name] = leaf0(fns[name][1](*serve_args))  # compile + warm

    # Accuracy gate is COMPARATIVE (the probe_sa_train standard): the fused
    # kernel runs its softmax in f32 where stock flax attention at dtype=bf16
    # keeps bf16, so fused-vs-stock deviation is dominated by STOCK's own
    # rounding. Build an f32 stock oracle and require the fused bf16 path to
    # sit no farther from it than the stock bf16 path does (3x slack).
    import dataclasses

    # The oracle must be STOCK f32: build it with the fused path disabled
    # (the variant loop leaves its last env setting behind, and a fused-f32
    # trunk at E=1024 exceeds the 16 MB scoped-VMEM limit anyway).
    os.environ["TEXT2LOC_FUSED_ATTN"] = "0"
    cfg32 = cfg.replace(model=dataclasses.replace(m, dtype="float32"))
    fwd32 = steps_lib.make_fine_split_forwards(
        CrossMatch(cfg32.model), embedder, cfg32
    )
    oracle = np.asarray(fwd32.cct(
        params, batch_stats, jnp.asarray(emb_all, jnp.float32), mask_all,
        jnp.asarray(hints_rep, jnp.float32), sent_rep,
    ), np.float32)
    scale = np.abs(oracle).max()
    dev_stock = np.abs(outs["off"] - oracle).max() / scale
    print(f"cct rel-to-peak vs f32 oracle: stock-bf16 {dev_stock:.2e}",
          flush=True)
    for name, _ in variants[1:]:
        dev = np.abs(outs[name] - oracle).max() / scale
        print(f"cct rel-to-peak vs f32 oracle: fused {name}: {dev:.2e}",
              flush=True)
        assert dev < max(3.0 * dev_stock, 1e-3), (name, dev, dev_stock)

    # Whole-serve gate (covers the E=1024 intra stack under "all"): same
    # comparative standard against an f32 full-trunk oracle.
    @jax.jit
    def serve32(params, batch_stats, text_all, emb_all, mask_all, pid_all):
        hints_all = fwd32.encode_text(params, batch_stats, text_all)
        return fwd32.cct(
            params, batch_stats, jnp.asarray(emb_all, jnp.float32), mask_all,
            jnp.take(hints_all, pid_all, axis=0),
            jnp.take(sent_all, pid_all, axis=0),
        )

    soracle = leaf0(serve32(*serve_args))
    sscale = np.abs(soracle).max()
    sdev_stock = np.abs(outs_serve["off"] - soracle).max() / sscale
    print(f"serve rel-to-peak vs f32 oracle: stock-bf16 {sdev_stock:.2e}",
          flush=True)
    for name, _ in variants[1:]:
        sdev = np.abs(outs_serve[name] - soracle).max() / sscale
        print(f"serve rel-to-peak vs f32 oracle: fused {name}: {sdev:.2e}",
              flush=True)
        assert sdev < max(3.0 * sdev_stock, 1e-3), (name, sdev, sdev_stock)

    # Interleaved min-of-groups timing.
    results = {name: [1e9, 1e9] for name, _ in variants}
    for _ in range(ITERS):
        for name, _ in variants:
            c, s = fns[name]
            results[name][0] = min(results[name][0], best_ms_once(c, cct_args))
            results[name][1] = min(results[name][1],
                                   best_ms_once(s, serve_args))
    for name, _ in variants:
        cms, sms = results[name]
        print(f"{name:10s} cct {cms:6.2f} ms   serve {sms:6.2f} ms "
              f"({NUM_POSES / sms * 1e3:,.0f} q/s)", flush=True)


def best_ms_once(fn, args):
    t0 = time.perf_counter()
    for _ in range(GROUP):
        out = fn(*args)
    drain(out)
    return (time.perf_counter() - t0) / GROUP * 1e3


if __name__ == "__main__":
    sys.exit(main())
