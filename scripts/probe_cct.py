#!/usr/bin/env python
"""Stage-level profile of the PRODUCTION serve path (bench.py's serve_epoch).

The production path at bench shapes (Q=256 poses x K=10 candidates, cached
fine gallery) is encode_text + cct in one program, measured at prod MFU 0.324
in round 2 with no breakdown. This probe answers VERDICT r2 weak #4 / next #6:
WHERE does the time go, and does a layout/kernel change move it?

Measures, on the real chip:
  1. serve_epoch (fused, the bench number's program)
  2. encode_text alone           (intra stack at E=1024 + inter_mlp, Q rows)
  3. cct alone                   (2 paired decoder layers + mlp_offsets,
                                  Q*K rows of [16 obj] x [6 hints] at D=128)
  4. cct sub-stages: one decoder layer pair, mlp_offsets
  5. matmul roofline twins: back-to-back dense matmuls with the SAME
     (M, K, N) shapes as (2) and (3)'s projections — what the MXU could do
     if the programs were pure matmul.
  6. variants: f32 CCT (dtype effect), BENCH-style whole-epoch at 2x batch
     (dispatch amortization), single-dispatch repeat scan (overhead bound).

Run: python scripts/probe_cct.py        (real chip; ~2 min warm cache)
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
GROUP = 10


def drain(x):
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(name, fn, *args, group=GROUP, flops=None):
    out = fn(*args)
    drain(out)
    best = 1e9
    for _ in range(ITERS):
        t0 = time.perf_counter()
        for _ in range(group):
            out = fn(*args)
        drain(out)
        best = min(best, (time.perf_counter() - t0) / group)
    extra = ""
    if flops:
        extra = f"  {flops / best / 1e12:6.1f} TF/s  mfu={flops / best / 197e12:.3f}"
    print(f"{name:44s} {best * 1e3:8.2f} ms{extra}", flush=True)
    return best


def cost_flops(jfn, *args):
    try:
        c = jfn.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0)) or None
    except Exception:
        return None


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

    @jax.jit
    def serve_epoch(params, batch_stats, text_all, emb_all, mask_all, pid_all):
        hints_all = fwd.encode_text(params, batch_stats, text_all)
        return fwd.cct(
            params, batch_stats, emb_all, mask_all,
            jnp.take(hints_all, pid_all, axis=0),
            jnp.take(sent_all, pid_all, axis=0),
        )

    f_serve = cost_flops(serve_epoch, params, batch_stats, text_all, emb_all,
                         mask_all, pid_all)
    t_serve = timeit("serve_epoch (bench program)", serve_epoch, params,
                     batch_stats, text_all, emb_all, mask_all, pid_all,
                     flops=f_serve)
    qps = NUM_POSES / t_serve
    print(f"  -> {qps:,.0f} q/s", flush=True)

    # --- stage split -----------------------------------------------------
    enc = jax.jit(lambda p, s, t: fwd.encode_text(p, s, t))
    f_enc = cost_flops(enc, params, batch_stats, text_all)
    t_enc = timeit("encode_text alone (Q rows, E=1024)", enc, params,
                   batch_stats, text_all, flops=f_enc)

    hints_all = enc(params, batch_stats, text_all)
    hints_rep = jax.device_put(jnp.take(hints_all, pid_all, axis=0))
    sent_rep = jax.device_put(jnp.take(sent_all, pid_all, axis=0))

    cct = jax.jit(lambda p, s, e, mk, h, sm: fwd.cct(p, s, e, mk, h, sm))
    f_cct = cost_flops(cct, params, batch_stats, emb_all, mask_all, hints_rep,
                       sent_rep)
    t_cct = timeit("cct alone (Q*K rows, D=128)", cct, params, batch_stats,
                   emb_all, mask_all, hints_rep, sent_rep, flops=f_cct)
    print(f"  stage sum {1e3 * (t_enc + t_cct):.2f} ms vs fused "
          f"{1e3 * t_serve:.2f} ms", flush=True)

    # --- matmul roofline twins ------------------------------------------
    # encode_text-side: intra stack works on [Q*S, T, E] = [1536, 16, 1024]
    # tokens; its big matmuls are [24576, 1024] x [1024, 1024] (qkv/out) and
    # x [1024, 4096] / [4096, 1024] (FFN).
    dt = jnp.bfloat16
    a1 = jax.device_put(jnp.ones((24576, 1024), dt))
    w1 = jax.device_put(jnp.ones((1024, 1024), dt))
    w1b = jax.device_put(jnp.ones((1024, 4096), dt))
    w1c = jax.device_put(jnp.ones((4096, 1024), dt))

    @jax.jit
    def twin_enc(a, w, wb, wc):
        for _ in range(4):            # q,k,v,o
            a = a @ w
        b = a @ wb
        a = b @ wc
        return a

    f = cost_flops(twin_enc, a1, w1, w1b, w1c)
    timeit("matmul twin: encode-side shapes", twin_enc, a1, w1, w1b, w1c,
           flops=f)

    # cct-side: [Q*K*(O+S)] rows x D=128: [40960+15360, 128] x [128, 128]
    # projections and [*, 128] x [128, 512] FFNs.
    a2 = jax.device_put(jnp.ones((56320, 128), dt))
    w2 = jax.device_put(jnp.ones((128, 128), dt))
    w2b = jax.device_put(jnp.ones((128, 512), dt))
    w2c = jax.device_put(jnp.ones((512, 128), dt))

    @jax.jit
    def twin_cct(a, w, wb, wc):
        # 2 layer-pairs x (self 4 + cross 4) projections + 2 FFNs each
        for _ in range(16):
            a = a @ w
        for _ in range(4):
            b = a @ wb
            a = b @ wc
        return a

    f = cost_flops(twin_cct, a2, w2, w2b, w2c)
    timeit("matmul twin: cct-side shapes", twin_cct, a2, w2, w2b, w2c,
           flops=f)

    # Wider-N twin: same FLOPs as 4x [128x128] projections but done as ONE
    # [128, 512] matmul — is N=128 starving the MXU?
    w2w = jax.device_put(jnp.ones((128, 512), dt))

    @jax.jit
    def twin_cct_wide(a, w, wb, wc):
        for _ in range(4):            # 16 small projections fused into 4 wide
            a = (a @ w)[:, :128]
        for _ in range(4):
            b = a @ wb
            a = b @ wc
        return a

    f = cost_flops(twin_cct_wide, a2, w2w, w2b, w2c)
    timeit("matmul twin: cct projections N=512-fused", twin_cct_wide, a2,
           w2w, w2b, w2c, flops=f)

    # --- variants --------------------------------------------------------
    # f32 CCT: dtype effect on the small-D stage.
    cfg32 = cfg.replace(model=__import__("dataclasses").replace(
        m, dtype="float32"))
    model32 = CrossMatch(cfg32.model)
    fwd32 = steps_lib.make_fine_split_forwards(model32, embedder, cfg32)
    cct32 = jax.jit(lambda p, s, e, mk, h, sm: fwd32.cct(p, s, e, mk, h, sm))
    emb32 = jax.device_put(jnp.asarray(emb_all, jnp.float32))
    h32 = jax.device_put(jnp.asarray(hints_rep, jnp.float32))
    f = cost_flops(cct32, params, batch_stats, emb32, mask_all, h32, sent_rep)
    timeit("cct f32 (dtype effect)", cct32, params, batch_stats, emb32,
           mask_all, h32, sent_rep, flops=f)

    # 2x epoch in one dispatch: does dispatch overhead bound serve_epoch?
    text2 = jax.device_put({k: np.concatenate([np.asarray(v)] * 2)
                            for k, v in text_all.items()})
    sent2 = jnp.concatenate([sent_all] * 2)
    emb2 = jnp.concatenate([emb_all] * 2)
    mask2 = jnp.concatenate([mask_all] * 2)
    pid2 = jnp.concatenate([pid_all, pid_all + NUM_POSES])

    @jax.jit
    def serve_epoch2(params, batch_stats, text_all, emb_all, mask_all, pid_all):
        hints_all = fwd.encode_text(params, batch_stats, text_all)
        return fwd.cct(
            params, batch_stats, emb_all, mask_all,
            jnp.take(hints_all, pid_all, axis=0),
            jnp.take(sent2, pid_all, axis=0),
        )

    f2 = cost_flops(serve_epoch2, params, batch_stats, text2, emb2, mask2,
                    pid2)
    t2 = timeit("serve_epoch at 2x batch (512 poses)", serve_epoch2, params,
                batch_stats, text2, emb2, mask2, pid2, flops=f2)
    print(f"  -> {2 * NUM_POSES / t2:,.0f} q/s at 2x", flush=True)


if __name__ == "__main__":
    sys.exit(main())
