"""One-command accuracy-parity report against the reference's published numbers.

The moment the KITTI360Pose assets land, this is the first thing to run:

    python scripts/parity.py --base_path /data/k360_30-10_scG_pd10_pc4_spY_all \
        --coarse_torch_ckpt coarse.pth --fine_torch_ckpt fine.pth \
        [--t5_snapshot /path/to/t5-large | --text_table table.npz] \
        [--splits val test] [--validate_kernels] [--out parity_report.json]

It chains the whole story the reference spreads over README steps
(/root/reference/README.md:60-79 + evaluation/pipeline.py:207-286):

1. ingest the pickle dataset into arrays (cached npz; data/ingest.py);
2. build/load the frozen T5 table (scripts/build_t5_table.py equivalent;
   --t5_snapshot runs the one-shot offline pass right here);
3. load the published torch checkpoints through the converters
   (models/torch_convert.py), reference-attention mode on by default for
   closest-to-original numerics;
4. run coarse retrieval recall + the end-to-end k x thresh localization
   tables per split (evaluation/pipeline.py);
5. print every measured number next to the paper target (BASELINE.md) with
   a delta and PASS/FAIL verdict;
6. optionally sweep the fused TPU kernel modes on the same converted weights
   and report exact-vs-fused agreement (scripts/validate_kernels.py
   methodology, but on real weights + real data).

Fixture-tested end to end on synthetic scenes + reference-shaped torch towers
(tests/test_parity_script.py), so the real-data run is exercised code.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

# Paper targets (BASELINE.md; recalled from arXiv:2311.15977 Tables 1-2 —
# re-verify against the paper before freezing as hard gates).
PAPER_TARGETS = {
    "val": {
        "retrieval": {1: 0.32, 3: 0.56, 5: 0.67},
        "localization_top1": {5.0: 0.37, 10.0: 0.57, 15.0: 0.63},
    },
    "test": {
        "retrieval": {1: 0.28, 3: 0.49, 5: 0.58},
        "localization_top1": {},
    },
}


def build_argparser():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base_path", default=None, help="KITTI360Pose pickle root")
    ap.add_argument("--array_cache", default=None)
    ap.add_argument("--splits", nargs="*", default=["val", "test"])
    ap.add_argument("--coarse_torch_ckpt", default=None)
    ap.add_argument("--fine_torch_ckpt", default=None)
    ap.add_argument("--coarse_ckpt", default=None, help="Orbax dir (ours)")
    ap.add_argument("--fine_ckpt", default=None)
    ap.add_argument("--text_table", default=None,
                    help="prebuilt frozen-T5 table .npz")
    ap.add_argument("--t5_snapshot", default=None,
                    help="local HF T5 snapshot: builds the table on the fly "
                         "(cached next to --array_cache)")
    ap.add_argument("--tolerance", type=float, default=0.02,
                    help="PASS if measured >= target - tolerance")
    ap.add_argument("--no_reference_attention", action="store_true",
                    help="use the TPU-native masked attention instead of the "
                         "reference's pool-over-padding (default ON for "
                         "converted torch checkpoints)")
    ap.add_argument("--validate_kernels", action="store_true",
                    help="also sweep fused-SA kernel modes on the converted "
                         "weights and report exact-vs-fused agreement")
    ap.add_argument("--synthetic", action="store_true",
                    help="fixture mode: synthetic scenes, no assets needed")
    ap.add_argument("--small_model", action="store_true",
                    help="small_test_config towers over a REAL --base_path "
                         "(the parity-drill test tier: real ingest + real "
                         "pipeline, minutes-not-hours compiles)")
    ap.add_argument("--out", default=None, help="write the report JSON here")
    return ap


def _enable_cache():
    # Shared helper (respects an explicit JAX_COMPILATION_CACHE_DIR).
    from text2loc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()


def _load_split(args, cfg, split):
    if args.synthetic:
        from text2loc_tpu.data.arrays import MultiSceneArrays
        from text2loc_tpu.data.synthetic import make_scene

        seed = {"val": 1, "test": 2}.get(split, 3)
        return MultiSceneArrays([
            make_scene(f"{seed:04d}", num_cells=8, num_poses=24,
                       object_slots=max(cfg.model.object_size,
                                        cfg.model.pad_size),
                       num_points=cfg.model.pointnet.num_points,
                       num_mentioned=cfg.model.num_mentioned, seed=seed)
        ])
    from text2loc_tpu.data.ingest import load_dataset

    return load_dataset(args.base_path, split, out_dir=args.array_cache)


def _states(args, cfg, embedder, data):
    import jax
    import numpy as np

    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.cross_matcher import CrossMatch
    from text2loc_tpu.training import steps as steps_lib

    coarse_model = CellRetrievalNetwork(cfg.model)
    fine_model = CrossMatch(cfg.model)
    rng = jax.random.PRNGKey(0)
    opt = steps_lib.make_optimizer(cfg, 1)
    cb = data.gather_coarse(np.arange(min(4, data.num_poses)),
                            cfg.model.object_size)
    cobj, ctext = steps_lib.prepare_coarse_batch(cb, embedder, cfg, rng,
                                                 train=False)
    coarse_state = steps_lib.init_train_state(coarse_model, opt, rng, cobj, ctext)
    fb = data.gather_fine(np.arange(min(4, data.num_poses)), cfg.model.pad_size)
    pfb = steps_lib.prepare_fine_batch(fb, embedder, cfg, rng, train=False)
    fine_state = steps_lib.init_train_state(fine_model, opt, rng, pfb.objects,
                                            pfb.text)

    from text2loc_tpu.evaluation.cli import _restore, _restore_torch

    if args.coarse_ckpt:
        coarse_state = _restore(args.coarse_ckpt, coarse_state)
    if args.fine_ckpt:
        fine_state = _restore(args.fine_ckpt, fine_state)
    if args.coarse_torch_ckpt:
        coarse_state = _restore_torch(args.coarse_torch_ckpt, coarse_state,
                                      cfg, "coarse")
    if args.fine_torch_ckpt:
        fine_state = _restore_torch(args.fine_torch_ckpt, fine_state, cfg,
                                    "fine")
    return coarse_model, coarse_state, fine_model, fine_state


def _compare(name, measured, targets, tol):
    """Rows of (label, measured, target|None, delta|None, verdict|None)."""
    rows = []
    for key in sorted(measured):
        tgt = targets.get(key)
        m = measured[key]
        if tgt is None:
            rows.append((f"{name}{key}", m, None, None, None))
        else:
            d = m - tgt
            rows.append((f"{name}{key}", m, tgt, d,
                         "PASS" if m >= tgt - tol else "FAIL"))
    return rows


def _print_rows(split, rows):
    print(f"\n== {split} vs paper targets (BASELINE.md) ==")
    print(f"{'metric':<18}{'measured':>10}{'target':>10}{'delta':>10}  verdict")
    for label, m, tgt, d, v in rows:
        t = f"{tgt:.3f}" if tgt is not None else "-"
        ds = f"{d:+.3f}" if d is not None else "-"
        print(f"{label:<18}{m:>10.3f}{t:>10}{ds:>10}  {v or ''}")


def _kernel_sweep(data, coarse_model, coarse_state, fine_model, fine_state,
                  embedder, cfg):
    """Exact-vs-fused agreement on the loaded weights (validate_kernels
    methodology: same states, kernel mode is the only variable)."""
    import numpy as np

    from text2loc_tpu.evaluation.pipeline import run_pipeline

    out = {}
    base = None
    saved = os.environ.get("TEXT2LOC_FUSED_SA")
    for mode in ("off", "first", "all"):
        os.environ["TEXT2LOC_FUSED_SA"] = mode
        r = run_pipeline(data, coarse_state, coarse_model, fine_state,
                         fine_model, embedder, cfg, verbose=False)
        entry = {
            "retrieval_recall": {k: r["coarse"][k][cfg.eval.threshs[0]]
                                 for k in cfg.eval.top_k},
            "fine_qps": round(r["fine_qps"], 1),
        }
        if base is None:
            base = r
        else:
            agree = base["retrievals"][:, 0] == r["retrievals"][:, 0]
            entry["top1_agreement_vs_exact"] = float(agree.mean())
            same = base["retrievals"] == r["retrievals"]
            if same.any():
                d = np.linalg.norm(
                    (base["pos_in_cells"] - r["pos_in_cells"])[same], axis=-1
                )
                sizes = np.broadcast_to(
                    data.cell_size[r["retrievals"]], same.shape
                )[same]
                entry["mean_abs_dpos_m_vs_exact"] = float((d * sizes).mean())
            else:
                # No agreeing slots: a position delta is undefined (a NaN
                # here would make the report non-JSON for strict parsers).
                entry["mean_abs_dpos_m_vs_exact"] = None
        out[mode] = entry
    # Restore the caller's pin (parity.main is importable library code).
    if saved is None:
        os.environ.pop("TEXT2LOC_FUSED_SA", None)
    else:
        os.environ["TEXT2LOC_FUSED_SA"] = saved
    return out


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if not args.synthetic and not args.base_path:
        print("need --base_path (or --synthetic for the fixture run)",
              file=sys.stderr)
        return 2
    _enable_cache()

    from text2loc_tpu.config import Config, small_test_config
    from text2loc_tpu.evaluation.retrieval import eval_retrieval
    from text2loc_tpu.evaluation.pipeline import run_pipeline
    from text2loc_tpu.models.text_embedding import HintTextEmbedder, make_embedder

    small = args.synthetic or args.small_model
    cfg = small_test_config() if small else Config().validate()
    if small:
        cfg = cfg.replace(eval=dataclasses.replace(cfg.eval, top_k=(1, 3, 5)))
    if (args.coarse_torch_ckpt or args.fine_torch_ckpt) \
            and not args.no_reference_attention:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, mask_padded=False)
        )

    # Frozen text table: explicit npz > built from a T5 snapshot > stand-in.
    if args.t5_snapshot and not args.text_table:
        cache = None
        if args.array_cache:
            os.makedirs(args.array_cache, exist_ok=True)
            cache = os.path.join(args.array_cache, "t5_table.npz")
        print(f"building frozen-T5 table from {args.t5_snapshot} ...",
              flush=True)
        emb = HintTextEmbedder.from_t5(args.t5_snapshot, cache_path=cache)
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, text_embed_dim=emb.embed_dim,
            max_hint_tokens=emb.max_tokens))
        embedder = emb
    else:
        cfg, embedder = make_embedder(cfg, args.text_table)

    report = {"config": {
        # Record what was ACTUALLY applied: pool-over-padding is only
        # switched on for torch checkpoints (converted-Orbax runs keep the
        # TPU-native masked attention their conversion was validated with).
        "reference_attention": not cfg.model.mask_padded,
        "coarse_ckpt": args.coarse_torch_ckpt or args.coarse_ckpt,
        "fine_ckpt": args.fine_torch_ckpt or args.fine_ckpt,
        "tolerance": args.tolerance,
        "synthetic": bool(args.synthetic),
    }}
    overall_pass = True
    states = None
    for split in args.splits:
        data = _load_split(args, cfg, split)
        if states is None:
            states = _states(args, cfg, embedder, data)
        coarse_model, coarse_state, fine_model, fine_state = states

        # Retrieval recall (paper Table 1 protocol: R@k on the full gallery).
        racc, _, _ = eval_retrieval(
            data, coarse_state, coarse_model, embedder, cfg,
            top_k=tuple(k for k in (1, 3, 5) if k <= data.num_cells),
        )
        r = run_pipeline(data, coarse_state, coarse_model, fine_state,
                         fine_model, embedder, cfg, verbose=False)
        loc_top1 = {t: r["fine"][1][t] for t in cfg.eval.threshs
                    if 1 in r["fine"]}

        targets = PAPER_TARGETS.get(split, {"retrieval": {},
                                            "localization_top1": {}})
        rows = _compare("R@", {k: float(v) for k, v in racc.items()},
                        targets["retrieval"], args.tolerance)
        rows += _compare("loc@top1 e<", {t: float(v)
                                         for t, v in loc_top1.items()},
                         targets["localization_top1"], args.tolerance)
        _print_rows(split, rows)
        split_pass = all(v != "FAIL" for *_, v in rows)
        overall_pass &= split_pass
        report[split] = {
            "retrieval_recall": {int(k): float(v) for k, v in racc.items()},
            "localization_top1": {float(t): float(v)
                                  for t, v in loc_top1.items()},
            # The full k x thresh tables (the reference's published output
            # protocol, evaluation/utils.py:57-69) — what print_accuracies
            # renders and what the parity drill goldens.
            "coarse_table": {str(k): {str(t): float(v) for t, v in row.items()}
                             for k, row in r["coarse"].items()},
            "fine_table": {str(k): {str(t): float(v) for t, v in row.items()}
                           for k, row in r["fine"].items()},
            "fine_qps": r["fine_qps"],
            "rows": [
                {"metric": lbl, "measured": m, "target": tgt, "delta": d,
                 "verdict": v}
                for lbl, m, tgt, d, v in rows
            ],
            "pass": split_pass,
        }
        if args.validate_kernels:
            print(f"kernel sweep on {split} ...", flush=True)
            report[split]["kernel_sweep"] = _kernel_sweep(
                data, coarse_model, coarse_state, fine_model, fine_state,
                embedder, cfg,
            )

    report["pass"] = overall_pass
    if small:
        # Untrained/fixture towers (synthetic scenes or small_test_config
        # dims): targets are meaningless, the run only proves the plumbing
        # end to end.
        report["pass"] = None
        print("\n(fixture mode: PASS/FAIL verdicts are plumbing-only)")
    else:
        print(f"\nOVERALL: {'PASS' if overall_pass else 'FAIL'} "
              f"(tolerance {args.tolerance})")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")
    return report


if __name__ == "__main__":
    r = main()
    if isinstance(r, int):
        sys.exit(r)
    # CI-gateable status: FAIL (pass=False) exits nonzero; fixture mode
    # (pass=None, plumbing-only verdicts) and PASS exit 0.
    sys.exit(1 if r.get("pass") is False else 0)
