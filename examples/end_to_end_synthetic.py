"""Runnable end-to-end demo on synthetic scenes (no dataset required).

Covers the full framework surface the way a user of the reference would use it:
prep-format data -> ingest -> coarse training -> fine training (with PMC
tables) -> the evaluation pipeline's two k x thresh tables -> the serving API.

    python examples/end_to_end_synthetic.py [--epochs 4] [--tpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import tempfile

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--tpu", action="store_true", help="keep the default (TPU) backend")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from text2loc_tpu.config import small_test_config
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.evaluation.pipeline import run_pipeline
    from text2loc_tpu.models.text_embedding import HintTextEmbedder
    from text2loc_tpu.serving import Localizer
    from text2loc_tpu.training.coarse import train_coarse
    from text2loc_tpu.training.fine import train_fine

    cfg = small_test_config()
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, epochs=args.epochs, batch_size=8),
        eval=dataclasses.replace(cfg.eval, top_k=(1, 2, 3)),
    )
    mk = lambda seed, n: MultiSceneArrays([
        make_scene(f"{seed:04d}", num_cells=10, num_poses=n,
                   object_slots=cfg.model.object_size,
                   num_points=cfg.model.pointnet.num_points,
                   num_mentioned=cfg.model.num_mentioned, seed=seed)
    ])
    train_data, val_data = mk(0, 48), mk(1, 24)
    embedder = HintTextEmbedder.compositional(
        embed_dim=cfg.model.text_embed_dim, max_tokens=cfg.model.max_hint_tokens
    )

    with tempfile.TemporaryDirectory() as workdir:
        print("== coarse training ==", flush=True)
        coarse_state, coarse_model, _ = train_coarse(
            cfg, train_data, val_data, embedder, workdir=workdir
        )
        print("== fine training ==", flush=True)
        fine_state, fine_model, _ = train_fine(
            cfg, train_data, val_data, embedder
        )

    print("== evaluation pipeline ==", flush=True)
    run_pipeline(val_data, coarse_state, coarse_model, fine_state, fine_model,
                 embedder, cfg)

    print("== serving ==", flush=True)
    loc = Localizer(val_data, coarse_state, coarse_model, fine_state,
                    fine_model, embedder, cfg, top_k=3)
    q = np.arange(4)
    res = loc.localize(val_data.hint_dir[q], val_data.hint_color[q],
                       val_data.hint_label[q])
    err = np.linalg.norm(res.position_w - val_data.pose_w[q, :2], axis=1)
    print(f"top-1 localization error for 4 queries: {np.round(err, 1)} m")

    # The free-text front door: raw description strings -> positions.
    from text2loc_tpu.text import render_description

    query = render_description(
        val_data.hint_dir[0], val_data.hint_color[0], val_data.hint_label[0]
    )
    print(f'query: "{query}"')
    res = loc.localize_text([query])
    print(f"-> position {np.round(res.position_w[0], 1)} "
          f"(gt {np.round(val_data.pose_w[0, :2], 1)})")

    # Out-of-vocabulary free text goes through the online frozen-LLM path
    # (a real deployment attaches T5OnlineEncoder.from_snapshot("t5-large");
    # the compositional stand-in needs no weights).
    from text2loc_tpu.models.t5_encoder import CompositionalOnlineEncoder

    loc_oov = Localizer(val_data, coarse_state, coarse_model, fine_state,
                        fine_model, embedder, cfg, top_k=3,
                        online_encoder=CompositionalOnlineEncoder(
                            embed_dim=cfg.model.text_embed_dim,
                            max_tokens=cfg.model.max_hint_tokens))
    # 2 in-vocab hints + 1 novel sentence (fills the num_mentioned=3 slots).
    oov = render_description(
        val_data.hint_dir[0][:2], val_data.hint_color[0][:2],
        val_data.hint_label[0][:2],
    ) + " Take me to the glowing obelisk."
    res = loc_oov.localize_text([oov])
    print(f'OOV query served online -> {np.round(res.position_w[0], 1)}')


if __name__ == "__main__":
    main()
