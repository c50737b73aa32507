#!/usr/bin/env python
"""Convert published reference .pth checkpoints into native Orbax checkpoints.

One command turns the reference's released torch weights
(coarse.pth / fine.pth, loaded with strict=False in
/root/reference/evaluation/pipeline.py:245-267) into this framework's
checkpoint format, so every downstream CLI (--coarse_ckpt/--fine_ckpt,
serving bootstrap, resume) consumes them without torch in the loop again.

Usage:
    python scripts/convert_checkpoint.py --kind coarse \
        --torch_ckpt coarse.pth --out runs/published/coarse_ckpt
    python scripts/convert_checkpoint.py --kind fine \
        --torch_ckpt fine.pth --out runs/published/fine_ckpt

The eval CLIs can also convert on the fly (--coarse_torch_ckpt /
--fine_torch_ckpt); this script persists the conversion once.
"""
from __future__ import annotations

import argparse
import dataclasses


def _coerce(value: str, typ):
    """Parse a CLI override string into a ModelConfig field's type."""
    origin = getattr(typ, "__origin__", None)
    if typ is bool or typ == "bool":
        v = value.strip().lower()
        if v in ("1", "true", "yes", "on"):
            return True
        if v in ("0", "false", "no", "off"):
            return False
        # Erroring like the int/float branches do: a typo ('ture') must not
        # silently convert the checkpoint with the flag off.
        raise ValueError(f"not a boolean: {value!r}")
    if origin is tuple:
        elem = typ.__args__[0]
        return tuple(_coerce(v, elem) for v in value.split(",") if v)
    if typ is int or typ == "int":
        return int(value)
    if typ is float or typ == "float":
        return float(value)
    return value


def apply_model_overrides(model_cfg, overrides):
    """Apply `field=value` strings onto a ModelConfig.

    The reference's eval argparse re-exposes every model hyper-parameter so
    checkpoints trained at non-default dims still load
    (/root/reference/evaluation/args.py:28-55); this is the equivalent knob.
    """
    import typing

    fields = {f.name: f for f in dataclasses.fields(model_cfg)}
    # Resolve annotations once via the dataclass's declared types.
    hints = typing.get_type_hints(type(model_cfg))
    kwargs = {}
    for item in overrides:
        key, _, value = item.partition("=")
        if key not in fields:
            raise SystemExit(f"unknown ModelConfig field {key!r}")
        kwargs[key] = _coerce(value, hints[key])
    return dataclasses.replace(model_cfg, **kwargs)


def main(argv=None):
    from text2loc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kind", required=True, choices=("coarse", "fine"))
    ap.add_argument("--torch_ckpt", required=True, help="reference .pth")
    ap.add_argument("--out", required=True, help="output Orbax ckpt dir")
    ap.add_argument("--text_table", default=None,
                    help="frozen T5 table .npz (affects embed dims)")
    ap.add_argument("--override", action="append", default=[],
                    metavar="FIELD=VALUE",
                    help="ModelConfig override for checkpoints trained at "
                         "non-default hyper-parameters, e.g. "
                         "--override coarse_embed_dim=128 "
                         "--override class_embed=true (repeatable)")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")  # conversion is host-side

    from text2loc_tpu.config import Config
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.evaluation.cli import (
        _init_coarse_state,
        _init_fine_state,
        _restore_torch,
    )
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.cross_matcher import CrossMatch
    from text2loc_tpu.models.text_embedding import make_embedder
    from text2loc_tpu.utils.checkpoint import CheckpointManager

    cfg = Config().validate()
    if args.override:
        cfg = cfg.replace(model=apply_model_overrides(cfg.model, args.override))
    cfg, embedder = make_embedder(cfg, args.text_table)
    # A tiny synthetic scene supplies shapes for state initialization only.
    data = MultiSceneArrays([
        make_scene("0000", num_cells=4, num_poses=4,
                   object_slots=max(cfg.model.object_size, cfg.model.pad_size),
                   num_points=cfg.model.pointnet.num_points,
                   num_mentioned=cfg.model.num_mentioned, seed=0)
    ])
    if args.kind == "coarse":
        model = CellRetrievalNetwork(cfg.model)
        state = _init_coarse_state(cfg, model, embedder, data)
    else:
        model = CrossMatch(cfg.model)
        state = _init_fine_state(cfg, model, embedder, data)
    state = _restore_torch(args.torch_ckpt, state, cfg, args.kind)

    mgr = CheckpointManager(args.out, mode="max")
    mgr.save(0, state, metric=0.0)
    mgr.close()
    n = sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(state.params))
    print(f"wrote {args.kind} checkpoint ({n:,} params) to {args.out}")


if __name__ == "__main__":
    main()
