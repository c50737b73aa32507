"""Evaluation CLIs — `python -m text2loc_tpu.evaluation.pipeline` equivalents.

Rebuild of the reference entry points /root/reference/evaluation/pipeline.py:
207-286 (coarse retrieval -> fine refinement -> two k x thresh tables) and
evaluation/coarse.py:87-129 (retrieval only). Checkpoints are Orbax
directories written by the trainers (--coarse_ckpt/--fine_ckpt point at the
workdir subfolders).
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import numpy as np

from text2loc_tpu.config import Config
from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
from text2loc_tpu.models.cross_matcher import CrossMatch
from text2loc_tpu.models.text_embedding import make_embedder
from text2loc_tpu.training import steps as steps_lib


def _init_coarse_state(cfg, model, embedder, data):
    rng = jax.random.PRNGKey(0)
    batch = data.gather_coarse(
        np.arange(min(4, data.num_poses)), cfg.model.object_size
    )
    objects, text = steps_lib.prepare_coarse_batch(batch, embedder, cfg, rng, train=False)
    optimizer = steps_lib.make_optimizer(cfg, 1)
    return steps_lib.init_train_state(model, optimizer, rng, objects, text)


def _init_fine_state(cfg, model, embedder, data):
    rng = jax.random.PRNGKey(0)
    batch = data.gather_fine(np.arange(min(4, data.num_poses)), cfg.model.pad_size)
    fb = steps_lib.prepare_fine_batch(batch, embedder, cfg, rng, train=False)
    optimizer = steps_lib.make_optimizer(cfg, 1)
    return steps_lib.init_train_state(model, optimizer, rng, fb.objects, fb.text)


def _restore(ckpt_dir, state):
    from text2loc_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckpt_dir)
    restored = mgr.restore(state)
    mgr.close()
    return restored


def _restore_torch(path, state, cfg, kind):
    """Load a published torch .pth (reference pipeline.py:245-267 semantics:
    strict=False — anything absent keeps its initialized value)."""
    from text2loc_tpu.models.torch_convert import load_torch_tower

    params, stats = load_torch_tower(
        path, cfg.model, kind, params=state.params, batch_stats=state.batch_stats
    )
    return state._replace(params=params, batch_stats=stats)


def build_argparser():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base_path", default=None)
    ap.add_argument("--array_cache", default=None)
    ap.add_argument("--coarse_ckpt", default=None)
    ap.add_argument("--fine_ckpt", default=None)
    ap.add_argument("--coarse_torch_ckpt", default=None,
                    help="published reference coarse .pth (converted on load)")
    ap.add_argument("--fine_torch_ckpt", default=None,
                    help="published reference fine .pth (converted on load)")
    ap.add_argument("--use_test_set", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--plot_retrievals", default=None,
                    help="write a qualitative retrieval grid PNG here")
    ap.add_argument("--text_table", default=None,
                    help="frozen T5 table .npz (scripts/build_t5_table.py); "
                         "default: compositional stand-in")
    ap.add_argument("--reference_attention", action="store_true",
                    help="attend/pool over padded slots like the reference "
                         "(cell_retrieval.py:85-108 zero-pads and max-pools "
                         "over all slots). Use with converted torch "
                         "checkpoints for closest-to-original numerics; the "
                         "TPU-native default masks padding")
    ap.add_argument("--fused_sa", default=None,
                    help="SA kernel mode (off|first|full|gather|all|exact, "
                         "or a per-level comma list); default 'first' on "
                         "TPU. Equivalent to TEXT2LOC_FUSED_SA")
    ap.add_argument("--top_k", type=int, nargs="*", default=None,
                    help="retrieval depths (reference evaluation/args.py:20; "
                         "default 1 3 5 10)")
    ap.add_argument("--threshs", type=float, nargs="*", default=None,
                    help="localization error thresholds in meters "
                         "(reference evaluation/args.py:21-23; default 5 10 15)")
    ap.add_argument("--styled_hints", action="store_true",
                    help="paraphrase-robustness eval: re-render every query "
                         "through the reference's sentence_style_* banks "
                         "(text_styles.py) and serve the styled (out-of-"
                         "vocabulary) strings through localize_text's online-"
                         "encoder path; prints styled vs canonical recall")
    ap.add_argument("--styled_seed", type=int, default=0,
                    help="paraphrase sampling seed for --styled_hints")
    ap.add_argument("--t5_snapshot", default=None,
                    help="local HF T5 snapshot for the online encoder used "
                         "by --styled_hints (default: compositional stand-in "
                         "matched to the table embedder)")
    ap.add_argument("--sentence_table", action="store_true",
                    help="encode eval queries via the precomputed [V, D] "
                         "sentence table (float-tolerance equal to the full "
                         "text trunk; faster when Q*S >> vocab size)")
    return ap


def _apply_model_flags(cfg, args):
    if getattr(args, "reference_attention", False):
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, mask_padded=False))
    if getattr(args, "fused_sa", None):
        import os

        os.environ["TEXT2LOC_FUSED_SA"] = args.fused_sa
    ev = {}
    if getattr(args, "top_k", None):
        ev["top_k"] = tuple(args.top_k)
    if getattr(args, "threshs", None):
        ev["threshs"] = tuple(args.threshs)
    if getattr(args, "sentence_table", False):
        ev["sentence_table"] = True
    if ev:
        cfg = cfg.replace(eval=dataclasses.replace(cfg.eval, **ev))
    return cfg


def _load(args):
    cfg = Config().validate()
    if args.synthetic:
        from text2loc_tpu.config import small_test_config
        from text2loc_tpu.data.arrays import MultiSceneArrays
        from text2loc_tpu.data.synthetic import make_scene

        cfg = small_test_config()
        cfg = cfg.replace(eval=dataclasses.replace(cfg.eval, top_k=(1, 2, 3)))
        data = MultiSceneArrays([
            make_scene("0009", num_cells=8, num_poses=24,
                       object_slots=cfg.model.object_size,
                       num_points=cfg.model.pointnet.num_points,
                       num_mentioned=cfg.model.num_mentioned, seed=9)
        ])
        return cfg, data
    assert args.base_path
    from text2loc_tpu.data.ingest import load_dataset

    split = "test" if args.use_test_set else "val"
    return cfg, load_dataset(args.base_path, split, out_dir=args.array_cache)


def main_pipeline(argv=None):
    from text2loc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from text2loc_tpu.evaluation.pipeline import run_pipeline

    args = build_argparser().parse_args(argv)
    cfg, data = _load(args)
    cfg = _apply_model_flags(cfg, args)
    cfg, embedder = make_embedder(cfg, args.text_table)
    coarse_model = CellRetrievalNetwork(cfg.model)
    fine_model = CrossMatch(cfg.model)
    coarse_state = _init_coarse_state(cfg, coarse_model, embedder, data)
    fine_state = _init_fine_state(cfg, fine_model, embedder, data)
    if args.coarse_ckpt:
        coarse_state = _restore(args.coarse_ckpt, coarse_state)
    if args.fine_ckpt:
        fine_state = _restore(args.fine_ckpt, fine_state)
    if args.coarse_torch_ckpt:
        coarse_state = _restore_torch(args.coarse_torch_ckpt, coarse_state, cfg, "coarse")
    if args.fine_torch_ckpt:
        fine_state = _restore_torch(args.fine_torch_ckpt, fine_state, cfg, "fine")
    result = run_pipeline(
        data, coarse_state, coarse_model, fine_state, fine_model, embedder, cfg
    )
    if args.styled_hints:
        result["styled"] = run_styled(
            args, cfg, data, coarse_state, coarse_model, fine_state,
            fine_model, embedder,
        )
    if args.plot_retrievals:
        from text2loc_tpu.evaluation.visualize import plot_retrieval_grid

        plot_retrieval_grid(
            data, result["retrievals"], args.plot_retrievals, max_queries=8
        )
    return result


def run_styled(args, cfg, data, coarse_state, coarse_model, fine_state,
               fine_model, embedder):
    """--styled_hints: paraphrased queries through the serving front door."""
    from text2loc_tpu.evaluation.styled import eval_styled_retrieval
    from text2loc_tpu.serving import Localizer

    if args.t5_snapshot:
        from text2loc_tpu.models.t5_encoder import T5OnlineEncoder

        online = T5OnlineEncoder.from_snapshot(
            args.t5_snapshot, max_tokens=cfg.model.max_hint_tokens
        )
    else:
        from text2loc_tpu.models.t5_encoder import CompositionalOnlineEncoder

        online = CompositionalOnlineEncoder(
            embed_dim=cfg.model.text_embed_dim,
            max_tokens=cfg.model.max_hint_tokens,
        )
    localizer = Localizer(
        data, coarse_state, coarse_model, fine_state, fine_model, embedder,
        cfg, top_k=max(cfg.eval.top_k), online_encoder=online,
    )
    out = eval_styled_retrieval(
        localizer, data, seed=args.styled_seed, top_k=cfg.eval.top_k
    )
    for name in ("canonical", "styled"):
        r = out[name]
        ks = " ".join(f"R@{k}={v:.3f}" for k, v in r["recall"].items())
        print(f"[styled_hints] {name:9s} {ks} "
              f"mean_err={r['mean_error_m']:.2f}m")
    gaps = " ".join(f"@{k}={v:+.3f}" for k, v in out["recall_gap"].items())
    print(f"[styled_hints] canonical-minus-styled recall gap: {gaps}")
    return out


def main_coarse(argv=None):
    from text2loc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from text2loc_tpu.evaluation.pipeline import run_coarse
    from text2loc_tpu.evaluation.metrics import print_accuracies

    args = build_argparser().parse_args(argv)
    cfg, data = _load(args)
    cfg = _apply_model_flags(cfg, args)
    cfg, embedder = make_embedder(cfg, args.text_table)
    model = CellRetrievalNetwork(cfg.model)
    state = _init_coarse_state(cfg, model, embedder, data)
    if args.coarse_ckpt:
        state = _restore(args.coarse_ckpt, state)
    if args.coarse_torch_ckpt:
        state = _restore_torch(args.coarse_torch_ckpt, state, cfg, "coarse")
    accs, retrievals = run_coarse(data, state, model, embedder, cfg)
    print_accuracies(accs, "Coarse")
    return accs, retrievals
